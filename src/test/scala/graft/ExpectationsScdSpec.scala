package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Expectations, Scd}
import graft.operators.Expectations._

/** Data-quality expectation suite + SCD2 dimension maintenance. */
class ExpectationsScdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("expectations: every rule class counts its violations; NULL semantics") {
    val df = Seq[(Option[Long], Option[Double], String)](
      (Some(1L), Some(5.0), "A"),
      (Some(2L), Some(50.0), "B"), // range + set violations
      (Some(3L), None, "A"),       // NULL passes value rules
      (None, Some(1.0), "a"),      // not_null + regex violations
      (Some(1L), Some(2.0), "A"))  // duplicate key 1
      .toDF("k", "v", "flag")
    val ref = Seq(1L, 3L).toDF("rk") // keys 2 and the dup 1 -> 2 absent? (1 present)
    val got = Expectations.audit(df,
      rowRules = Seq(
        NotNull("k"),
        InRange("v", 0, 10),
        OneOf("flag", Seq("A", "B")),
        Matches("flag", "^[A-Z]$"),
        Predicate("predicate(v_lt_6)", "v < 6")),
      uniqueKeys = Seq(Seq("k")),
      refs = Seq(("k", ref, "rk")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("not_null(k)") == (1L, false))
    assert(got("in_range(v,0.0,10.0)") == (1L, false)) // only 50.0; NULL passes
    assert(got("one_of(flag)") == (1L, false))          // 'a' fails
    assert(got("matches(flag)") == (1L, false))         // 'a' fails regex
    // predicate: NULL v fails (3L), 50.0 fails -> 2
    assert(got("predicate(v_lt_6)") == (2L, false))
    // duplicate key 1 appears twice -> 1 extra row; NULL key groups too
    assert(got("unique(k)") == (1L, false))
    // non-null keys absent from ref: k=2 twice? k=2 once, dup k=1 present
    assert(got("ref(k->rk)") == (1L, false))
  }

  test("expectations: fused base+superset chain counts both key sets and feeds refs") {
    // the unique(pk) + unique(pk, seq) + ref(pk) shape that fuses to
    // ONE full-data exchange — values must match the unfused math
    val df = Seq[(Option[Long], Int)](
      (Some(1L), 1), (Some(1L), 2), (Some(1L), 2),
      (Some(2L), 1), (None, 1), (None, 1))
      .toDF("k", "seq")
    val ref = Seq(1L).toDF("rk")
    val got = Expectations.audit(df,
      rowRules = Seq(NotNull("k")),
      uniqueKeys = Seq(Seq("k", "seq"), Seq("k")),
      refs = Seq(("k", ref, "rk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // groups by k: 1->{(1),(2),(2)} c=3 d=2; 2-> c=1 d=1; null-> c=2 d=1
    assert(got("unique(k)") == 3L)       // (3-1) + (2-1) over dup groups
    assert(got("unique(k,seq)") == 2L)   // (1,2) twice + (null,1) twice
    assert(got("ref(k->rk)") == 1L)      // k=2 absent, weighted by count
    assert(got("not_null(k)") == 2L)
  }

  test("expectations: a 3-chain of key sets stays on the generic path with right values") {
    // {a} has TWO needed supersets -> fusion declines, the derive-
    // from-superset machinery must still produce exact counts
    val df = Seq((1, 1, 1), (1, 1, 1), (1, 2, 1), (2, 1, 1))
      .toDF("a", "b", "c")
    val got = Expectations.audit(df,
      rowRules = Seq(NotNull("a")),
      uniqueKeys = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("unique(a)") == 2L)
    assert(got("unique(a,b)") == 1L)
    assert(got("unique(a,b,c)") == 1L)
  }

  test("expectations: clean table passes; annotate splits quarantine map-only") {
    val df = Seq((1L, 2.0, "A"), (2L, 3.0, "B")).toDF("k", "v", "flag")
    val audit = Expectations.audit(df,
      Seq(NotNull("k"), InRange("v", 0, 10)), Seq(Seq("k")))
    assert(audit.where(!col("pass")).count() == 0)
    val ann = Expectations.annotate(
      Seq((1L, 2.0), (2L, 99.0)).toDF("k", "v"),
      Seq(NotNull("k"), InRange("v", 0, 10)))
    val bad = ann.where(size(col("violations")) > 0)
      .select(col("k"), col("violations")).as[(Long, Seq[String])]
      .collect().toSeq
    assert(bad == Seq((2L, Seq("in_range(v,0.0,10.0)"))))
    assert(ann.where(size(col("violations")) === 0).count() == 1)
  }

  test("scd2: change closes + reopens, identical update is no churn, new key inserts") {
    val dim = Seq(
      (1L, "X", 10.0, "2024-01-01 00:00:00", "2024-03-01 00:00:00"), // history
      (1L, "Y", 11.0, "2024-03-01 00:00:00", null),
      (2L, "X", 20.0, "2024-01-01 00:00:00", null),
      (3L, "Z", 30.0, "2024-01-01 00:00:00", null))
      .toDF("k", "seg", "bal", "vf", "vt")
      .select(col("k"), col("seg"), col("bal"),
        to_timestamp(col("vf")).as("valid_from"),
        to_timestamp(col("vt")).as("valid_to"))
    val updates = Seq(
      (1L, "Y2", 12.0), // changed -> close + open
      (2L, "X", 20.0),  // identical -> no churn
      (9L, "N", 90.0))  // new key
    .toDF("k", "seg", "bal")
    val out = Scd.apply2(dim, updates, Seq("k"), "2024-06-01 00:00:00")
      .orderBy("k", "valid_from")
      .select(col("k"), col("seg"), col("bal"),
        col("valid_from").cast("string"), col("valid_to").cast("string"))
      .as[(Long, String, Double, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, "X", 10.0, "2024-01-01 00:00:00", "2024-03-01 00:00:00"),
      (1L, "Y", 11.0, "2024-03-01 00:00:00", "2024-06-01 00:00:00"),
      (1L, "Y2", 12.0, "2024-06-01 00:00:00", null),
      (2L, "X", 20.0, "2024-01-01 00:00:00", null),
      (3L, "Z", 30.0, "2024-01-01 00:00:00", null),
      (9L, "N", 90.0, "2024-06-01 00:00:00", null)), out.toString)
    // as-of reads: before the change sees Y, after sees Y2
    val before = Scd.snapshotAt(
      Scd.apply2(dim, updates, Seq("k"), "2024-06-01 00:00:00"),
      "2024-05-01 00:00:00")
      .where(col("k") === 1L).select(col("seg")).as[String].collect().toSeq
    assert(before == Seq("Y"))
    val after = Scd.snapshotAt(
      Scd.apply2(dim, updates, Seq("k"), "2024-06-01 00:00:00"),
      "2024-07-01 00:00:00")
      .where(col("k") === 1L).select(col("seg")).as[String].collect().toSeq
    assert(after == Seq("Y2"))
    // ambiguous multi-row update is rejected, the MERGE precedent
    intercept[IllegalArgumentException] {
      Scd.apply2(dim, updates.unionAll(Seq((1L, "Q", 0.0)).toDF("k", "seg", "bal")),
        Seq("k"), "2024-06-01 00:00:00")
    }
    // a corrupt snapshot with TWO open rows for one key is rejected
    // too — the join would silently multiply it on every later run
    val corrupt = dim.unionAll(
      Seq((2L, "X2", 21.0)).toDF("k", "seg", "bal")
        .withColumn("valid_from", to_timestamp(lit("2024-02-01 00:00:00")))
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .select(dim.columns.map(col): _*))
    intercept[IllegalArgumentException] {
      Scd.apply2(corrupt, updates, Seq("k"), "2024-06-01 00:00:00")
    }
    // a current row with NULL valid_from is data, not a presence
    // marker — it must survive an unrelated delta untouched
    val oddFrom = Seq((7L, "V", 70.0)).toDF("k", "seg", "bal")
      .withColumn("valid_from", lit(null).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .select(dim.columns.map(col): _*)
    val kept = Scd.apply2(dim.unionAll(oddFrom), updates, Seq("k"),
        "2024-06-01 00:00:00")
      .where(col("k") === 7L).select(col("seg")).as[String].collect().toSeq
    assert(kept == Seq("V"))
  }

  test("scd2: NULL attribute transitions are real changes (null-safe compare)") {
    val dim = Seq((1L, Option("X"))).toDF("k", "seg")
      .withColumn("valid_from", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val toNull = Seq((1L, Option.empty[String])).toDF("k", "seg")
    val out = Scd.apply2(dim, toNull, Seq("k"), "2024-02-01 00:00:00")
    assert(out.count() == 2) // closed + reopened with NULL seg
    // NULL -> NULL is NOT a change
    val out2 = Scd.apply2(out, toNull, Seq("k"), "2024-03-01 00:00:00")
    assert(out2.count() == 2)
  }
}
