package graft.tools

import org.apache.spark.sql.functions._

/** Scale-exactness checks for the gates whose DuckDB oracles are
  * unrunnable past gate scale (declared-quadratic or sketch-replay
  * class): `ScaleChecks <sfDir> [check ...]` with checks from
  * {x98, x88b, x102, x104}. Each check re-runs the REAL gate query at the
  * given scale and asserts the gate's invariant structurally:
  *
  *  - x98: quantile audit — `within_alpha` must hold (the audit's
  *    exact side now rank-selects distributed; this run is also the
  *    wall-clock evidence that the SinglePartition sort is gone);
  *  - x88b: skew-escalated entity resolution — the fixture is built
  *    so entity_id = 4·(doc_id div 4) exactly (replica-invariant
  *    under gen_scale's disjoint doc_id ranges: stems are
  *    md5(doc_id div 4), so replicas never share a block);
  *  - x102: governed-dimension composition — within_tol and
  *    rollup_exact must hold on every segment row.
  */
object ScaleChecks {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val checks = if (args.length > 1) args.drop(1).toSeq
      else Seq("x98", "x88b", "x102", "x104")
    val spark = graft.Session.local("scale-checks")
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    checks.foreach {
      case "x98" => timed("x98") {
        val row = graft.SparkEntry.queries("x98_quantile_sketch")(spark, dir)
          .head()
        require(row.getBoolean(1),
          s"x98 quantile audit failed at $dir: $row")
        println(s"[x98] n_vals=${row.getLong(0)} within_alpha=true")
      }
      case "x88b" => timed("x88b") {
        // pin the resolution once — three separate actions would each
        // re-run the whole blocked-JW + CC pipeline
        val out = graft.SparkEntry.queries("x88b_entities_skewblock")(spark, dir)
          .localCheckpoint()
        val bad = out.where(col("entity_id") =!=
          lit(4L) * floor(col("doc_id") / 4)).count()
        val entities = out.select(col("entity_id")).distinct().count()
        require(bad == 0L, s"x88b structural mismatches at $dir: $bad")
        println(s"[x88b] rows=${out.count()} entities=$entities mismatches=0")
      }
      case "x102" => timed("x102") {
        val out = graft.SparkEntry.queries("x102_governed_dim")(spark, dir)
          .collect()
        require(out.nonEmpty && out.forall(r =>
            r.getBoolean(2) && r.getBoolean(3)),
          s"x102 sketch verdicts failed at $dir")
        println(s"[x102] segments=${out.length} " +
          s"n_current_total=${out.map(_.getLong(1)).sum} all verdicts true")
      }
      case "x104" => timed("x104") {
        val out = graft.SparkEntry.queries("x104_quantile_by_group")(spark, dir)
          .collect()
        require(out.nonEmpty && out.forall(_.getBoolean(2)),
          s"x104 grouped quantile audit failed at $dir")
        println(s"[x104] groups=${out.length} " +
          s"n_vals_total=${out.map(_.getLong(1)).sum} all within_alpha")
      }
      case other => sys.error(s"unknown check: $other")
    }
    spark.stop()
  }
}
