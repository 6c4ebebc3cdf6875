package graft.tools

import org.apache.spark.sql.functions._

/** Stage breakdown for the x109 interval-merge path at a given SF:
  * construction (scan + local sort + pre-merge + range shuffle +
  * stats + islands checkpoint) vs consumption (fix-up join + coverage
  * agg + sink), plus the pre-merge reduction factor. */
object ProfileX109 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Session.local("profile-x109")
    spark.sparkContext.setLogLevel("ERROR")
    def lap(tag: String, from: Long): Long = {
      val now = System.nanoTime()
      println(f"[x109 $tag] ${(now - from) / 1e9}%.2f s")
      now
    }
    val li0 = graft.sources.Tables.load(spark, dir, "lineitem")
    println(s"[x109 input rows] ${li0.count()}")
    (1 to n).foreach { i =>
      println(s"--- iteration $i ---")
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
        .withColumn("cov_start", to_date(col("l_shipdate")))
        .withColumn("cov_end",
          date_add(to_date(col("l_shipdate")), col("l_linenumber")))
      var t = System.nanoTime()
      val islands = graft.operators.Intervals.mergeIslands(
        li, "l_suppkey", "cov_start", "cov_end",
        Seq("l_orderkey", "l_linenumber"))
      t = lap("construction (stats + islands ckpt jobs)", t)
      println(s"[x109 islands] ${islands.count()}")
      t = lap("islands count", t)
      val cov = islands.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_islands"))
      cov.write.format("noop").mode("overwrite").save()
      t = lap("coverage agg + sink", t)
    }
    spark.stop()
  }
}
