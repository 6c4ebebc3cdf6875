package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** One-pass table profiling: hand-computed stats, typed extrema
  * routing, approx-distinct sanity, single-aggregation plan. */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("b"), Some(2.5)),
    (2L, Some("a"), None),
    (3L, None, Some(-1.0)),
    (4L, Some("a"), Some(7.0))
  ).toDF("id", "s", "v")

  test("exact profile: counts, nulls, distincts, typed extrema") {
    val p = Profile.profile(df, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    p.values.foreach(r => assert(r.getLong(1) == 4)) // n_rows
    val id = p("id"); val s = p("s"); val v = p("v")
    assert(id.getLong(2) == 0 && s.getLong(2) == 1 && v.getLong(2) == 1) // n_null
    assert(id.getLong(3) == 4 && s.getLong(3) == 2 && v.getLong(3) == 3) // n_distinct
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0) // numeric extrema
    assert(id.isNullAt(6) && id.isNullAt(7))
    assert(v.getDouble(4) == -1.0 && v.getDouble(5) == 7.0)
    assert(s.isNullAt(4) && s.isNullAt(5)) // strings: no numeric extrema
    assert(s.getString(6) == "a" && s.getString(7) == "b")
  }

  test("column names containing dots and backticks profile fine") {
    val weird = df.withColumnRenamed("s", "user.name")
      .withColumnRenamed("v", "a`b")
    val p = Profile.profile(weird, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "user.name", "a`b"))
    assert(p("user.name").getLong(3) == 2 && p("user.name").getString(6) == "a")
    assert(p("a`b").getLong(2) == 1 && p("a`b").getDouble(5) == 7.0)
  }

  test("non-numeric non-string columns profile counts only") {
    val withTs = df.withColumn("t",
      org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2024-01-01 00:00:00")))
    val t = Profile.profile(withTs, exact = true).collect()
      .find(_.getString(0) == "t").get
    assert(t.getLong(1) == 4 && t.getLong(2) == 0 && t.getLong(3) == 1)
    assert(t.isNullAt(4) && t.isNullAt(5) && t.isNullAt(6) && t.isNullAt(7))
  }

  test("zero-row input: zero counts, NULL extrema, every column present") {
    val p = Profile.profile(df.limit(0), exact = true).collect()
    assert(p.length == 3)
    p.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
    }
  }

  test("approx (default) agrees on small cardinalities; plan has no Expand") {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(p == Map("id" -> 4L, "s" -> 2L, "v" -> 3L)) // HLL exact when tiny
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx profile must stay one pass")
    assert(Profile.profile(df, exact = true)
      .queryExecution.executedPlan.toString.contains("Expand"),
      "exact multi-column distinct goes through Expand by design")
  }
}
