package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-job decomposition of x111 madOutliers at a given SF: times the
  * boundary sample, median selection, deviation persist + boundary
  * sample, MAD selection, and final aggregate separately (same code
  * shapes as operators/Outliers.scala), so the operator's bench cost
  * can be attributed to jobs instead of guessed at.
  * Usage: runMain graft.tools.ScratchX111 [sfDir] [rounds]
  */
object ScratchX111 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Session.local("scratch-x111")
    spark.sparkContext.setLogLevel("ERROR")
    val nBuckets = 64

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  [$label] ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to rounds).foreach { round =>
      println(s"== round $round ==")
      val v = col("l_extendedprice").cast("double")
      val nn = graft.sources.Tables.load(spark, dir, "lineitem")
        .where(v.isNotNull && !isnan(v) &&
          v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity)
        .select(struct(col("l_returnflag")).as("__g"), v.as("__v"))

      val bounds = timed("approxQuantile(nn)") {
        nn.stat.approxQuantile("__v", (1 until nBuckets)
          .map(_.toDouble / nBuckets).toArray, 0.001).distinct.sorted
      }
      val bucketed = nn.withColumn("__b",
        graft.expressions.NativeSelect.searchSorted(col("__v"), bounds))
      import org.apache.spark.sql.expressions.Window
      val wG = Window.partitionBy(col("__g")).orderBy(col("__b"))
      val targets = bucketed.groupBy(col("__g"), col("__b"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__before", coalesce(
          sum(col("__c")).over(wG.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__g"))))
        .withColumn("__target", ceil(col("__n") / lit(2.0)).cast("long"))
        .where(col("__target") > col("__before") &&
          col("__target") <= col("__before") + col("__c"))
        .select(col("__g"), col("__b"),
          (col("__target") - col("__before")).as("__lrank"))
      val med = bucketed.join(broadcast(targets), Seq("__g", "__b"))
        .withColumn("__lrn", row_number().over(
          Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))))
        .where(col("__lrn") === col("__lrank"))
        .select(col("__g"), col("__v").as("med"))
      timed("med collect (hist+select)") { med.collect() }

      val devs = nn.join(broadcast(med), Seq("__g"))
        .withColumn("__dev", abs(col("__v") - col("med")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val devBounds = timed("approxQuantile(devs)+persist") {
        devs.select(col("__g"), col("__dev").as("__v"))
          .stat.approxQuantile("__v", (1 until nBuckets)
            .map(_.toDouble / nBuckets).toArray, 0.001).distinct.sorted
      }
      val dv = devs.select(col("__g"), col("__dev").as("__v"))
      val dbucketed = dv.withColumn("__b",
        graft.expressions.NativeSelect.searchSorted(col("__v"), devBounds))
      val dtargets = dbucketed.groupBy(col("__g"), col("__b"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__before", coalesce(
          sum(col("__c")).over(wG.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__g"))))
        .withColumn("__target", ceil(col("__n") / lit(2.0)).cast("long"))
        .where(col("__target") > col("__before") &&
          col("__target") <= col("__before") + col("__c"))
        .select(col("__g"), col("__b"),
          (col("__target") - col("__before")).as("__lrank"))
      val mad = dbucketed.join(broadcast(dtargets), Seq("__g", "__b"))
        .withColumn("__lrn", row_number().over(
          Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))))
        .where(col("__lrn") === col("__lrank"))
        .select(col("__g"), col("__v").as("mad"))
      timed("mad collect (hist+select)") { mad.collect() }

      timed("final agg") {
        devs.join(broadcast(mad), Seq("__g"))
          .groupBy(col("__g"))
          .agg(count(lit(1)).as("n_vals"), max(col("med")).as("med"),
            max(col("mad")).as("mad"),
            sum(when(col("__dev") > lit(3.0 * 1.4826) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .collect()
      }
      devs.unpersist()
    }
    spark.stop()
  }
}
