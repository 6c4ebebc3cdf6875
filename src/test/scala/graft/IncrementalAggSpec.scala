package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Mergeable aggregate state: the merge law, NULL handling, derived
  * averages, retraction semantics, schema validation. */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows = Seq[(Option[Long], Option[Double])](
    (Some(1L), Some(10.0)), (Some(1L), Some(20.0)), (Some(1L), None),
    (Some(2L), Some(-5.0)),
    (Some(3L), None), // all-NULL metric group
    (None, Some(7.0))) // NULL key is a key
    .toDF("k", "v")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.withAverages(df, Seq("v")).collect()
      .map(r => Option(r.get(0)) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("v_cnt"),
          Option(r.getAs[Any]("v_sum")), Option(r.getAs[Any]("v_min")),
          Option(r.getAs[Any]("v_max")), Option(r.getAs[Any]("v_avg")))))
      .toMap

  test("merge law: any split of the data folds to the direct build; NULLs exact") {
    val direct = canon(IncrementalAgg.build(rows, Seq("k"), Seq("v")))
    for (split <- Seq(col("v").isNull, col("k") <=> 1L, lit(false))) {
      val a = rows.where(split)
      val b = rows.where(!split || split.isNull)
      val folded = canon(IncrementalAgg.update(
        IncrementalAgg.build(a, Seq("k"), Seq("v")), b, Seq("k"), Seq("v")))
      assert(folded == direct, s"split $split")
    }
    // spot-check the semantics themselves
    assert(direct(Some(1L)) == ((3L, 2L, Some(30.0), Some(10.0),
      Some(20.0), Some(15.0))))
    assert(direct(Some(3L)) == ((1L, 0L, None, None, None, None)))
    assert(direct(None) == ((1L, 1L, Some(7.0), Some(7.0),
      Some(7.0), Some(7.0))))
  }

  test("three-batch fold associates: ((s0+d1)+d2) == direct") {
    val b0 = rows.where(col("k") <=> 1L)
    val d1 = rows.where(col("k") <=> 2L || col("k").isNull)
    val d2 = rows.where(col("k") <=> 3L)
    val s = IncrementalAgg.update(IncrementalAgg.update(
      IncrementalAgg.build(b0, Seq("k"), Seq("v")),
      d1, Seq("k"), Seq("v")), d2, Seq("k"), Seq("v"))
    assert(canon(s) == canon(IncrementalAgg.build(rows, Seq("k"), Seq("v"))))
  }

  test("retraction: negated count/sum deltas invert; min/max declared non-invertible") {
    val state = IncrementalAgg.build(rows.where(col("k") <=> 1L),
      Seq("k"), Seq("v"))
    // retract the 20.0 row by merging a negated state row for it
    val retract = Seq((1L, -1L, -1L, -20.0, 20.0, 20.0))
      .toDF("k", "n_rows", "v_cnt", "v_sum", "v_min", "v_max")
    val after = IncrementalAgg.merge(state, retract, Seq("k"), Seq("v"))
      .collect().head
    assert(after.getAs[Long]("n_rows") == 2L)
    assert(after.getAs[Long]("v_cnt") == 1L)
    assert(after.getAs[Double]("v_sum") == 10.0)
    // min/max are NOT restored by retraction — inherent, documented
    assert(after.getAs[Double]("v_max") == 20.0)
  }

  test("merge rejects mismatched state schemas") {
    val st = IncrementalAgg.build(rows, Seq("k"), Seq("v"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(st.drop("v_min"), st, Seq("k"), Seq("v"))
    }
  }
}
