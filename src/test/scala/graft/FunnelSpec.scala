package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel
import org.apache.spark.sql.functions._

/** Funnel + retention: greedy chain semantics, strict ordering,
  * window cutoff, level monotonicity, cohort arithmetic. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")

  test("greedy chain: steps must occur strictly in order") {
    val df = ev(
      // u1 completes view→click→purchase
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      // u2 purchases BEFORE clicking — chain stops at click
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:01:00", "purchase"),
      (2L, "2024-01-01 10:02:00", "click"),
      // u3 clicks with no view — never enters the funnel
      (3L, "2024-01-01 10:00:00", "click"),
      (3L, "2024-01-01 10:01:00", "purchase"),
      // u4 same-timestamp view+click: strict > means click not counted
      (4L, "2024-01-01 10:00:00", "view"),
      (4L, "2024-01-01 10:00:00", "click"))
    val got = Funnel.funnel(df, Seq("view", "click", "purchase"))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("window: every step must land within windowSeconds of step 1") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"), // inside 1h window
      (1L, "2024-01-01 11:30:00", "purchase"), // OUTSIDE (90 min)
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:10:00", "click"),
      (2L, "2024-01-01 10:20:00", "purchase"))
    val got = Funnel.funnel(df, Seq("view", "click", "purchase"),
        windowSeconds = Some(3600L))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 2L), (2, "click", 2L), (3, "purchase", 1L)))
    // window boundary is inclusive (<= t1 + W)
    val edge = ev(
      (5L, "2024-01-01 10:00:00", "view"),
      (5L, "2024-01-01 11:00:00", "click"))
    val g2 = Funnel.funnel(edge, Seq("view", "click"),
        windowSeconds = Some(3600L))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(g2 == Seq((1, "view", 1L), (2, "click", 1L)))
  }

  test("earliest-first greedy: the FIRST qualifying event fixes each step time") {
    // the early click at 10:01 is taken; the purchase before it does
    // not qualify, the one after does
    val df = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:01:00", "click"),
      (1L, "2024-01-01 10:00:30", "purchase"), // before t2 — skipped
      (1L, "2024-01-01 10:02:00", "purchase"))
    val got = Funnel.funnel(df, Seq("view", "click", "purchase"))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 1L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("a NULL-ts event never poisons a user's chain") {
    // without the ts filter the NULL lands in acc[0] (struct sort is
    // nulls-first, every s==0 guard passes on NULL) and the user
    // reports level 0 despite a full conversion
    val df = Seq(
      (1L, null.asInstanceOf[Timestamp], "view"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(df, Seq("view", "click", "purchase"))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 1L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel counts are monotonically non-increasing; repartition-invariant") {
    val df = Tables.loadEvents
    val got = Funnel.funnel(df, Seq("view", "click", "purchase"),
        windowSeconds = Some(7L * 86400))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got.size == 3)
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    val again = Funnel.funnel(df.repartition(13),
        Seq("view", "click", "purchase"), windowSeconds = Some(7L * 86400))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(again == got)
  }

  test("retention: week 0 equals cohort size; all users covered") {
    val df = Tables.loadEvents
    val r = Funnel.retention(df)
    val week0 = r.where($"week_no" === 0)
      .agg(sum("users")).as[Long].head()
    val cohortSizes = df.groupBy("user_id")
      .agg(to_date(date_trunc("week", min($"ts"))).as("w"))
      .groupBy("w").count().agg(sum("count")).as[Long].head()
    assert(week0 == cohortSizes) // every user is active in their own first week
    // no negative offsets; users never exceed the cohort's week-0 count
    import org.apache.spark.sql.Row
    val rows = r.collect()
    assert(rows.forall(_.getAs[Int]("week_no") >= 0))
    val w0 = rows.filter(_.getAs[Int]("week_no") == 0)
      .map(r => r.getAs[java.sql.Date]("cohort_week") -> r.getAs[Long]("users")).toMap
    assert(rows.forall(r =>
      r.getAs[Long]("users") <= w0(r.getAs[java.sql.Date]("cohort_week"))))
  }

  private object Tables {
    def loadEvents =
      graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
  }
}
