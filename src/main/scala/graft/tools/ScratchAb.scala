package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B harness (not committed): broadcast-threshold bisect on
  * the rank-family gates. */
object ScratchAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SCRATCH_PARTS", "128"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    if (sys.env.contains("SCRATCH_LATE_RULES"))
      graft.Session.registerLateRules(spark)
    def li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    def g(n: String) = graft.SparkEntry.queries(n)(spark, sfDir)
    val gates = Seq("x111" -> (() => g("x111_mad_outliers")),
      "x113" -> (() => g("x113_ntile")),
      "x115" -> (() => g("x115_ntile_by_group")))
    val thrs = Seq("10485760", "67108864")
    val obs = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    // warm both
    for (t <- thrs; (n, f) <- gates) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", t)
      run(f())
    }
    for (r <- 1 to 3; t <- thrs; (n, f) <- gates) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", t)
      spark.sqlContext.clearCache()
      val sec = run(f())
      obs(s"$n@$t") = sec :: obs(s"$n@$t")
      println(f"[obs] $n@$t $sec%.3f")
    }
    obs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"$k%-16s min ${v.min}%.3f  all ${v.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
