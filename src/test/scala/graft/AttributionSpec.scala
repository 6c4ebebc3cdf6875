package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Attribution
import org.apache.spark.sql.functions._

/** Last-touch attribution: credit rules, lookback cutoff, tie
  * determinism, unattributed visibility. */
class AttributionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest preceding touch wins; out-of-window purchases go to NULL") {
    val conv = Seq(
      (1L, ts("2024-01-10 12:00:00"), 10.0), // after email(1-9) and ad(1-10 09:00)
      (2L, ts("2024-01-10 12:00:00"), 20.0), // only touch is 30 days old
      (3L, ts("2024-01-10 12:00:00"), 40.0)) // never touched
      .toDF("user_id", "ts", "value")
    val touch = Seq(
      (1L, ts("2024-01-09 08:00:00"), "email"),
      (1L, ts("2024-01-10 09:00:00"), "ad"),
      (2L, ts("2023-12-01 00:00:00"), "ad"))
      .toDF("user_id", "ts", "channel")
    val got = Attribution.lastTouch(conv, touch, "7 days")
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(Some("ad")) == ((1L, 10.0)))
    assert(got(None) == ((2L, 60.0))) // stale + untouched both unattributed
    assert(!got.contains(Some("email")))
  }

  test("same-timestamp touches collapse deterministically to MAX channel") {
    val conv = Seq((1L, ts("2024-01-10 12:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val touch = Seq(
      (1L, ts("2024-01-10 11:00:00"), "ad"),
      (1L, ts("2024-01-10 11:00:00"), "email")) // tie -> 'email' (MAX)
      .toDF("user_id", "ts", "channel")
    val got = Attribution.lastTouch(conv, touch, "7 days")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(Some("email") -> 1L))
    val again = Attribution.lastTouch(conv, touch.repartition(5), "7 days")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("a NULL-ts conversion stays visible under the NULL channel — revenue never vanishes") {
    val conv = Seq(
      (1L, null.asInstanceOf[Timestamp], 30.0), // junk timestamp
      (1L, ts("2024-01-10 12:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val touch = Seq((1L, ts("2024-01-10 11:00:00"), "ad"))
      .toDF("user_id", "ts", "channel")
    val got = Attribution.lastTouch(conv, touch, "7 days")
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(Some("ad")) == ((1L, 5.0)))
    assert(got(None) == ((1L, 30.0)),
      "the NULL-ts conversion's revenue must surface as unattributed")
  }

  test("a touch AT the conversion instant is credited (inclusive as-of)") {
    val conv = Seq((1L, ts("2024-01-10 12:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val touch = Seq((1L, ts("2024-01-10 12:00:00"), "ad"))
      .toDF("user_id", "ts", "channel")
    val got = Attribution.lastTouch(conv, touch, "7 days")
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("ad")))
  }
}
