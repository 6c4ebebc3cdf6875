package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the per-query scheduling floor at small SF
  * (not part of the driver surface). The host shows ±60% drift
  * between whole-JVM runs, so config A/B is only meaningful
  * INTERLEAVED inside one session: each round runs every (query,
  * variant) pair back-to-back and we keep per-pair minima — drift
  * then biases every variant equally. Only runtime-settable confs can
  * be varied this way (AQE flags, shuffle partitions — not
  * spark.locality.*).
  */
object ProfileFloor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = if (args.length > 1) args(1).split(',').toSeq
      else Seq("q01_scan_sort", "q02_sentinel_null", "q04_dim_decode",
        "q05_join_star", "q08_group_agg", "q10_rollup", "q13_topk",
        "q14a_intersect", "q15_string_funcs", "q20_array_access",
        "q23_range_join", "q24_cross_join", "q25_sql_subquery")
    val rounds = if (args.length > 2) args(2).toInt else 5

    val spark = graft.Session.local("profile-floor")
    import graft.SparkEntry

    val variants: Seq[(String, () => Unit)] = Seq(
      "aqe_on_32" -> (() => {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }),
      "aqe_off_32" -> (() => {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }),
      "aqe_on_8" -> (() => {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
      }),
    )

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up pass
    queries.foreach(runOnce)

    val best = scala.collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(Double.MaxValue)
    (1 to rounds).foreach { r =>
      queries.foreach { q =>
        variants.foreach { case (vn, set) =>
          set()
          val t = runOnce(q)
          best((q, vn)) = math.min(best((q, vn)), t)
        }
      }
      println(s"[floor] round $r done")
    }

    println(f"[floor] ${"query"}%-22s ${variants.map(_._1).mkString("  ")}")
    queries.foreach { q =>
      val cells = variants.map { case (vn, _) => f"${best((q, vn))}%9.3f" }
      println(f"[floor] $q%-22s ${cells.mkString("  ")}")
    }
    variants.foreach { case (vn, _) =>
      val tot = queries.map(q => best((q, vn))).sum
      println(f"[floor] TOTAL $vn%-16s $tot%8.3f s")
    }
    spark.stop()
  }
}
