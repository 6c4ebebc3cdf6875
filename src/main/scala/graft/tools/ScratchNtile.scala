package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition for the counting-selection ntile path. */
object ScratchNtile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Session.registerLateRules(spark)

    def run(tag: String)(f: => Unit): Double = {
      spark.sqlContext.clearCache()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[nt] $tag%-24s $sec%.3f")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def li = graft.sources.Tables.load(spark, sfDir, "lineitem")

    def x113(): Unit = noop(graft.SparkEntry.queries("x113_ntile")(spark, sfDir))
    def x115(): Unit = noop(graft.SparkEntry.queries("x115_ntile_by_group")(spark, sfDir))
    def bounds(): Unit = {
      val r = li.select(col("l_extendedprice").cast("double").as("__p"))
        .stat.approxQuantile("__p", (1 until 64).map(_.toDouble / 64).toArray, 0.001)
      println("   bounds n=" + r.length)
    }
    def scanAgg(): Unit = noop(li.select(col("l_extendedprice"))
      .agg(sum(col("l_extendedprice"))))

    // inline replica of boundaryNtile's stages for the x115 shape
    import org.apache.spark.sql.expressions.Window
    val k = 4
    def dfx = li.select(col("l_returnflag"), col("l_extendedprice"),
      col("l_orderkey"), col("l_linenumber"))
    def plain = Seq(col("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    def pv = col("l_extendedprice").cast("double")
    lazy val bnds = dfx.where(pv.isNotNull && !isnan(pv))
      .select(pv.as("__p")).stat
      .approxQuantile("__p", (1 until 64).map(_.toDouble / 64).toArray, 0.001)
      .distinct.sorted
    def bCol = when(plain.head.isNull, lit(-1))
      .when(isnan(pv), lit(Int.MaxValue))
      .otherwise(graft.expressions.NativeSelect.searchSorted(pv, bnds))
    def bucketed = dfx.withColumn("__g", struct(col("l_returnflag")))
      .withColumn("__b", bCol)
    def hist = bucketed.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__before", coalesce(
        sum(col("__c")).over(Window.partitionBy(col("__g"))
          .orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    def wanted = {
      val nC = col("__n"); val qC = ((nC - pmod(nC, lit(k))) / k).cast("long")
      val rC = pmod(nC, lit(k))
      hist.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
        .select(col("__g"), explode(array_distinct(
          transform(sequence(lit(1), lit(k - 1)),
            i => when(i <= rC, i * (qC + 1))
              .otherwise(rC * (qC + 1) + (i - rC) * qC)))).as("__rn"))
    }
    def targets = hist.join(wanted, Seq("__g"))
      .where(col("__rn") > col("__before") &&
        col("__rn") <= col("__before") + col("__c"))
      .groupBy(col("__g"), col("__b"))
      .agg(collect_list(col("__rn") - col("__before")).as("__lranks"))
    def boundariesF = bucketed
      .join(broadcast(targets), Seq("__g", "__b"))
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col("__g"), col("__b"))
          .orderBy(plain: _*)).cast("long"))
      .where(array_contains(col("__lranks"), col("__lrn")))
      .select(col("__g"), struct(plain: _*).as("__bt"))
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(col("__bt"))).as("__bs"))

    def ntOnly(): Unit = noop(graft.operators.Ranks.ntileExactBy(
      dfx, 4, "l_returnflag", plain))

    // the pre-round-15 rank-based formulation, inlined for A/B
    def oldNtileBy(): Unit = {
      val g = struct(col("l_returnflag")).as("__ntile_g")
      val ranked = graft.operators.Ranks.globalRowNumber(
        dfx.withColumn("__ntile_g", g), col("__ntile_g") +: plain, "__grn")
      val stats = ranked.groupBy(col("__ntile_g"))
        .agg(min(col("__grn")).as("__off"), count(lit(1)).as("__n"))
      val n = col("__n")
      val rn = col("__grn") - col("__off") + 1
      val q = ((n - pmod(n, lit(4))) / 4).cast("long")
      val r = pmod(n, lit(4))
      val cut = r * (q + 1)
      noop(ranked.join(stats, Seq("__ntile_g"))
        .withColumn("bin", when(rn <= cut, ceil(rn / (q + 1)))
          .otherwise(r + ceil((rn - cut) / q)))
        .drop("__ntile_g", "__grn", "__off", "__n")
        .groupBy(col("l_returnflag"), col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 2).as("min_v"),
          round(max(col("l_extendedprice")), 2).as("max_v")))
    }

    // warm-up
    x113(); x115(); bounds(); scanAgg()
    noop(bucketed); noop(hist); noop(targets); noop(boundariesF)
    ntOnly()
    spark.sqlContext.clearCache()
    val nt = graft.operators.Ranks.ntileExactBy(dfx, 4, "l_returnflag", plain)
    nt.write.format("noop").mode("overwrite").save()
    println("=== x115 ntile executed plan ===")
    println(nt.queryExecution.executedPlan.toString.take(12000))
    val rounds = sys.env.getOrElse("SCRATCH_ROUNDS", "3").toInt
    val obs = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to rounds) {
      obs("x113") ::= run("x113 gate")(x113())
      obs("x115") ::= run("x115 gate")(x115())
      obs("bounds") ::= run("approxQuantile alone")(bounds())
      obs("scan") ::= run("scan+agg 1col")(scanAgg())
      obs("st_bucketed") ::= run("stage bucketed")(noop(bucketed))
      obs("st_hist") ::= run("stage hist")(noop(hist))
      obs("st_targets") ::= run("stage targets")(noop(targets))
      obs("st_bnd") ::= run("stage boundaries")(noop(boundariesF))
      obs("ntOnly") ::= run("ntile output only")(ntOnly())
      obs("oldX115") ::= run("OLD rank-based x115")(oldNtileBy())
    }
    println("== minima ==")
    obs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"$k%-8s ${v.min}%.3f") }
    spark.stop()
  }
}
