package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Experiment, JoinDiag}
import org.apache.spark.sql.functions._

/** Join-explosion diagnostics + experiment readout edge semantics. */
class DiagExperimentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("explosion totals equal the real join's row count; NULL keys counted, never matched") {
    val l = Seq[(Option[Long], String)](
      (Some(1L), "a"), (Some(1L), "b"), (Some(2L), "c"),
      (None, "x"), (None, "y")).toDF("k", "p")
    val r = Seq[(Option[Long], String)](
      (Some(1L), "q"), (Some(1L), "r"), (Some(1L), "s"),
      (Some(3L), "t"), (None, "z")).toDF("k", "p2")
    val tot = JoinDiag.explosionTotals(l, "k", r, "k").collect().head
    val realJoin = l.join(r, Seq("k")).count()
    assert(tot.getAs[Long]("est_join_rows") == realJoin)
    assert(realJoin == 6L) // 2×3 for key 1; key 2/3 unmatched
    assert(tot.getAs[Long]("n_matched_keys") == 1L)
    assert(tot.getAs[Long]("max_key_product") == 6L)
    assert(tot.getAs[Long]("null_key_rows_left") == 2L)
    assert(tot.getAs[Long]("null_key_rows_right") == 1L)
    val top = JoinDiag.explosionTopKeys(l, "k", r, "k", 5).collect()
    assert(top.map(x => (x.getLong(0), x.getLong(3))).toSeq == Seq((1L, 6L)))
  }

  test("explosion totals on zero-overlap sides: zeros, not NULLs") {
    val l = Seq((1L, "a")).toDF("k", "p")
    val r = Seq((2L, "b")).toDF("k", "p")
    val tot = JoinDiag.explosionTotals(l, "k", r, "k").collect().head
    assert(tot.getAs[Long]("est_join_rows") == 0L)
    assert(tot.getAs[Long]("max_key_product") == 0L)
  }

  test("explosion totals saturate (never report 0) when the decimal(38,0) sum overflows") {
    // two keys whose products each fit 38 digits but whose SUM does
    // not: sum(decimal(38,0)) returns NULL under non-ANSI overflow,
    // which must read as Long.MaxValue, not as the old coalesce-to-0
    val big = 9000000000000000000L // 9e18; product 8.1e37 < 1e38
    val counts = Seq((1L, big, big), (2L, big, big))
      .toDF("key", "n_left", "n_right")
    val tot = JoinDiag.summarizeMatched(counts).collect().head
    assert(tot.getAs[Long]("est_join_rows") == Long.MaxValue)
    assert(tot.getAs[Long]("n_matched_keys") == 2L)
    assert(tot.getAs[Long]("max_key_product") == Long.MaxValue)
    // single giant key: sum fits 38 digits, least() clamps to Long.Max
    val one = Seq((1L, big, big)).toDF("key", "n_left", "n_right")
    val t1 = JoinDiag.summarizeMatched(one).collect().head
    assert(t1.getAs[Long]("est_join_rows") == Long.MaxValue)
    // and the genuinely-empty frame still reads 0
    val none = counts.where($"key" < 0)
    val t0 = JoinDiag.summarizeMatched(none).collect().head
    assert(t0.getAs[Long]("est_join_rows") == 0L)
    assert(t0.getAs[Long]("max_key_product") == 0L)
  }

  test("experiment: assignment is stable under enrollment growth; z degenerates to 0 on zero variance") {
    val variants = Seq("control" -> 0.5, "treatment" -> 0.5)
    def arms(n: Long) = (1L to n).toDF("u")
      .withColumn("variant",
        Experiment.variantCol(col("u"), variants, "s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val small = arms(200); val big = arms(400)
    assert(small.forall { case (u, v) => big(u) == v },
      "a unit's arm changed when others enrolled")

    // zero-variance pool: nobody converts on either arm → z = 0
    val units = (1L to 100L).map((_, false)).toDF("u", "conv")
    val z = Experiment.zTest(
      Experiment.readout(units, "u", variants, "s", "conv"),
      "control", "treatment").collect().head
    assert(z.getAs[Double]("z") == 0.0)
    assert(!z.getAs[Boolean]("significant_95"))
  }

  test("experiment readout: known counts and half-up rates") {
    // force variants via a 2-entry frame per arm by picking units
    // whose hash assignment we read back, then assert the arithmetic
    val variants = Seq("control" -> 0.5, "treatment" -> 0.5)
    val units = (1L to 1000L).toDF("u")
      .withColumn("conv", col("u") % 4 === 0)
    val ro = Experiment.readout(units, "u", variants, "s2", "conv")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_units"), r.getAs[Long]("n_converted"),
          r.getAs[Double]("conv_rate")))).toMap
    assert(ro.keySet == Set("control", "treatment"))
    val (n, c, rate) = ro("control")
    assert(math.abs(rate - math.floor(c.toDouble / n * 10000 + 0.5) / 10000)
      == 0.0)
    assert(ro.values.map(_._1).sum == 1000L)
  }
}
