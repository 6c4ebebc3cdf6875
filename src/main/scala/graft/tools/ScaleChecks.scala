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
  *    rollup_exact must hold on every segment row;
  *  - x111: MAD outliers replica-invariance — gen_scale replicates
  *    every sf0.1 value verbatim R times, which multiplies every
  *    rank by R: the DISCRETE median/MAD of the replicated multiset
  *    equal the sf0.1 ones EXACTLY, and n_outliers scales by
  *    exactly R (R derived from the row counts, never assumed);
  *  - x114: incremental-agg merge law at scale — the three-batch
  *    folded state must equal the direct build over the whole table
  *    (keys/counts/min/max exact, sums to 1e-6 relative — addition
  *    order differs by design);
  *  - x115: grouped-NTILE law at scale — per (group, bin) sizes must
  *    be exactly the SQL NTILE sizes derived from each group's n_g
  *    (first n_g mod k buckets one row larger), under whatever
  *    partitioning the range-rank machinery produced.
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
      case "x111" => timed("x111") {
        val ref = graft.SparkEntry.queries("x111_mad_outliers")(
          spark, "/root/testdata/sf0.1").collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getLong(4)))).toMap
        val out = graft.SparkEntry.queries("x111_mad_outliers")(spark, dir)
          .collect()
        require(out.nonEmpty, s"x111 empty at $dir")
        out.foreach { r =>
          val (n0, med0, mad0, out0) = ref(r.getString(0))
          val rFactor = r.getLong(1) / n0
          require(r.getLong(1) == rFactor * n0 &&
            r.getDouble(2) == med0 && r.getDouble(3) == mad0 &&
            r.getLong(4) == rFactor * out0,
            s"x111 replica-invariance broken at $dir for " +
              s"${r.getString(0)}: $r vs sf0.1 ($n0, $med0, $mad0, $out0)")
        }
        println(s"[x111] groups=${out.length} " +
          s"n_total=${out.map(_.getLong(1)).sum} replica-invariant")
      }
      case "x114" => timed("x114") {
        val o = graft.sources.Tables.load(spark, dir, "orders")
        val ia = graft.operators.IncrementalAgg
        val folded = ia.update(ia.update(
          ia.build(o.where(col("o_orderkey") % 2 === 0),
            Seq("o_custkey"), Seq("o_totalprice")),
          o.where(col("o_orderkey") % 4 === 1),
          Seq("o_custkey"), Seq("o_totalprice")),
          o.where(col("o_orderkey") % 4 === 3),
          Seq("o_custkey"), Seq("o_totalprice")).localCheckpoint()
        val direct = ia.build(o, Seq("o_custkey"), Seq("o_totalprice"))
          .localCheckpoint()
        // sums are floating: compare keys/counts/min/max exactly and
        // sums to 1e-6 relative (addition order differs by design)
        val joinedBad = folded.alias("f")
          .join(direct.alias("g"), Seq("o_custkey"), "full_outer")
          .where(col("f.n_rows").isNull || col("g.n_rows").isNull ||
            col("f.n_rows") =!= col("g.n_rows") ||
            col("f.o_totalprice_cnt") =!= col("g.o_totalprice_cnt") ||
            !(col("f.o_totalprice_min") <=> col("g.o_totalprice_min")) ||
            !(col("f.o_totalprice_max") <=> col("g.o_totalprice_max")) ||
            abs(col("f.o_totalprice_sum") - col("g.o_totalprice_sum")) >
              abs(col("g.o_totalprice_sum")) * 1e-6)
          .count()
        require(joinedBad == 0L,
          s"x114 merge law broken at $dir: $joinedBad mismatched keys")
        println(s"[x114] keys=${direct.count()} fold == direct build")
      }
      case "x115" => timed("x115") {
        val out = graft.SparkEntry.queries("x115_ntile_by_group")(spark, dir)
          .collect()
        require(out.nonEmpty, s"x115 empty at $dir")
        val k = 4
        out.groupBy(_.getString(0)).foreach { case (g, rows) =>
          val n = rows.map(_.getLong(2)).sum
          val q = n / k; val r = (n % k).toInt
          val expect = (1 to k).map(b =>
            b.toLong -> (if (b <= r) q + 1 else q)).toMap
          val got = rows.map(x => x.getLong(1) -> x.getLong(2)).toMap
          require(got == expect.filter(_._2 > 0),
            s"x115 NTILE sizes wrong at $dir for group $g: " +
              s"got $got expect $expect")
        }
        println(s"[x115] groups=${out.map(_.getString(0)).distinct.length} " +
          s"rows_total=${out.map(_.getLong(2)).sum} NTILE sizes exact")
      }
      case other => sys.error(s"unknown check: $other")
    }
    spark.stop()
  }
}
