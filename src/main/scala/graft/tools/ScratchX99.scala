package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition harness (not part of the engine surface):
  * times the x99 expectation audit's constituent jobs separately so
  * the committed BASELINE decomposition names measured terms.
  */
object ScratchX99 {
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
      println(f"[x99] $tag%-28s $sec%.3f")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    def orders = graft.sources.Tables.load(spark, sfDir, "orders")
    import graft.operators.Expectations._
    val rowRules = Seq(
      NotNull("l_orderkey"),
      InRange("l_quantity", 1, 25),
      OneOf("l_returnflag", Seq("A", "N")),
      Matches("l_linestatus", "^[OF]$"),
      Predicate("predicate(disc_vs_tax)", "l_discount <= l_tax + 0.08"))

    def full(): Unit = noop(graft.operators.Expectations.audit(
      li, rowRules,
      uniqueKeys = Seq(Seq("l_orderkey", "l_linenumber"), Seq("l_orderkey")),
      refs = Seq(("l_orderkey", orders, "o_orderkey"))))
    def rowsOnly(): Unit =
      noop(graft.operators.Expectations.audit(li, rowRules))
    def fusedFrame(): DataFrame =
      li.select(col("l_orderkey"), col("l_linenumber"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("__c"),
          count_distinct(struct(col("l_linenumber"))).as("__d"))
    def uniquesOnly(): Unit = noop(graft.operators.Expectations.audit(
      li, Nil,
      uniqueKeys = Seq(Seq("l_orderkey", "l_linenumber"), Seq("l_orderkey"))))
    def refOnly(): Unit = noop(graft.operators.Expectations.audit(
      li, Nil, Nil, refs = Seq(("l_orderkey", orders, "o_orderkey"))))

    def fusedFrameN(): DataFrame =
      li.select(col("l_orderkey"), col("l_linenumber"))
        .repartition(32, col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("__c"),
          count_distinct(struct(col("l_linenumber"))).as("__d"))
    def twoLevelN(): DataFrame =
      li.select(col("l_orderkey"), col("l_linenumber"))
        .repartition(32, col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("__n")).as("__c"), count(lit(1)).as("__d"))
    def oldDirection(): DataFrame =
      li.select(col("l_orderkey"), col("l_linenumber"))
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("__n")).as("__c"), count(lit(1)).as("__d"))

    // warm-up
    full(); rowsOnly(); noop(fusedFrame()); noop(fusedFrameN())
    noop(twoLevelN()); noop(oldDirection()); uniquesOnly(); refOnly()
    println("fusedFrame parts: " + fusedFrame().rdd.getNumPartitions)
    println("fusedFrameN parts: " + fusedFrameN().rdd.getNumPartitions)
    val rounds = sys.env.getOrElse("SCRATCH_ROUNDS", "3").toInt
    val obs = collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to rounds) {
      obs("full") ::= run("full audit")(full())
      obs("rows") ::= run("row rules only")(rowsOnly())
      obs("fused") ::= run("fused grouped frame")(noop(fusedFrame()))
      obs("fusedN") ::= run("fused repart(32)")(noop(fusedFrameN()))
      obs("twoLevelN") ::= run("two-level repart(32)")(noop(twoLevelN()))
      obs("old") ::= run("old direction")(noop(oldDirection()))
      obs("uniques") ::= run("uniques (fused+2 sums)")(uniquesOnly())
      obs("ref") ::= run("ref branch only")(refOnly())
    }
    println("== minima ==")
    obs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"$k%-10s ${v.min}%.3f") }
    spark.stop()
  }
}
