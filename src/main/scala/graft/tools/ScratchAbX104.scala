package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved in-JVM A/B for the round-15 x104 rewrite: OLD
  * formulation (separate approxQuantile boundary pass + lazy sketch
  * aggregate referenced by three consumers) vs the shipped one
  * (sketch-derived boundaries + collected groups-sized sketch rows).
  * Interleaving makes a host-load window inflate both arms together;
  * minima per arm are the comparison.
  * Usage: runMain graft.tools.ScratchAbX104 [sfDir] [rounds]
  */
object ScratchAbX104 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Session.local("ab-x104")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val qs = Seq(0.5, 0.9, 0.99); val alpha = 0.01

    def oldForm(): DataFrame = {
      val df = graft.sources.Tables.load(spark, dir, "lineitem")
      val v = col("l_extendedprice").cast("double")
      val nn = df.where(v.isNotNull && !isnan(v) &&
          v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity)
        .select(struct(col("l_returnflag")).as("__g"), v.as("__v"))
      val sk = nn.groupBy(col("__g"))
        .agg(count(lit(1)).as("n_vals"),
          graft.functions.QuantileSketch.quantiles(col("__v"), alpha, qs)
            .as("__est"))
      val wanted = sk.select(col("__g"), col("n_vals"),
        array(qs.map(q =>
          least(col("n_vals"),
            greatest(lit(1L), ceil(lit(q) * col("n_vals")).cast("long")))): _*)
          .as("__ranks"))
      val exact = oldValuesAtGroupRanks(nn,
        wanted.select(col("__g"), col("__ranks")))
      sk.join(exact, Seq("__g"))
        .join(wanted.select(col("__g"), col("__ranks")), Seq("__g"))
        .select(col("__g").getField("l_returnflag").as("l_returnflag"),
          col("n_vals"),
          aggregate(
            zip_with(col("__est"), col("__ranks"),
              (e, r) => abs(e - element_at(col("__exact"), r)) <=
                lit(alpha) * abs(element_at(col("__exact"), r)) + lit(1e-12)),
            lit(true), (acc, x) => acc && x).as("within_alpha"))
        .orderBy(asc_nulls_first("l_returnflag"))
    }
    def oldValuesAtGroupRanks(vals: DataFrame, wanted: DataFrame): DataFrame = {
      val nBuckets = 64
      val bounds = vals.stat
        .approxQuantile("__v", (1 until nBuckets)
          .map(_.toDouble / nBuckets).toArray, 0.001)
        .distinct.sorted
      val bucketed = vals.withColumn("__b",
        if (bounds.isEmpty) lit(0)
        else graft.expressions.NativeSelect.searchSorted(col("__v"), bounds))
      val wG = Window.partitionBy(col("__g")).orderBy(col("__b"))
      val hist = bucketed.groupBy(col("__g"), col("__b"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__before", coalesce(
          sum(col("__c")).over(wG.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val ranks = wanted.select(col("__g"), explode(col("__ranks")).as("__rn"))
        .distinct()
      val perBucket = hist.join(ranks, Seq("__g"))
        .where(col("__rn") > col("__before") &&
          col("__rn") <= col("__before") + col("__c"))
        .select(col("__g"), col("__b"),
          struct((col("__rn") - col("__before")).as("__lrank"),
            col("__rn")).as("__t"))
        .groupBy(col("__g"), col("__b"))
        .agg(collect_list(col("__t")).as("__ts"))
      bucketed.join(broadcast(perBucket), Seq("__g", "__b"))
        .withColumn("__lrn", row_number().over(
          Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))))
        .select(col("__g"), col("__v"),
          filter(col("__ts"), t => t.getField("__lrank") === col("__lrn"))
            .as("__hit"))
        .where(size(col("__hit")) > 0)
        .select(col("__g"), explode(col("__hit")).as("__t"), col("__v"))
        .groupBy(col("__g"))
        .agg(map_from_arrays(collect_list(col("__t.__rn")),
          collect_list(col("__v"))).as("__exact"))
    }

    def newForm(): DataFrame =
      graft.SparkEntry.queries("x104_quantile_by_group")(spark, dir)

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(() => oldForm()); run(() => newForm()) // warm both arms
    var oldMin = Double.MaxValue; var newMin = Double.MaxValue
    (1 to rounds).foreach { r =>
      System.gc()
      val o = run(() => oldForm()); val n = run(() => newForm())
      oldMin = math.min(oldMin, o); newMin = math.min(newMin, n)
      println(f"[round $r] old=$o%.2f new=$n%.2f")
    }
    println(f"[min] old=$oldMin%.2f new=$newMin%.2f")
    spark.stop()
  }
}
