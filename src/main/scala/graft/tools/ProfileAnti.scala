package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler: left-anti shapes for q07b at scale. */
object ProfileAnti {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Session.local("profile-anti")
    spark.sparkContext.setLogLevel("ERROR")
    val t = (n: String) => graft.sources.Tables.load(spark, dir, n)

    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"[$tag] pass $i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val p = t("part"); val li = t("lineitem")
    time("anti_plain") {
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select(col("p_partkey")).orderBy(asc_nulls_first("p_partkey"))
    }
    time("anti_distinct") {
      val keys = li.select(col("l_partkey")).distinct()
      p.join(keys, p("p_partkey") === keys("l_partkey"), "left_anti")
        .select(col("p_partkey")).orderBy(asc_nulls_first("p_partkey"))
    }
    val q = p.join(li.select(col("l_partkey")).distinct(),
      p("p_partkey") === col("l_partkey"), "left_anti")
    q.explain("formatted")
    spark.stop()
  }
}
