package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Sessionize}

class AsOfSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks latest right row at-or-before, inclusive; no match → NULL") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // after both orders of key 10
      (2L, 10L, ts("2024-01-01 08:30:00")),  // between
      (3L, 10L, ts("2024-01-01 08:00:00")),  // exactly at first order → inclusive
      (4L, 10L, ts("2024-01-01 07:00:00")),  // before all → NULL
      (5L, 99L, ts("2024-01-01 12:00:00")))  // key with no orders → NULL
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 100L),
      (10L, ts("2024-01-01 09:00:00"), 101L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val r = AsOfJoin.asOf(left, right, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(r(1L).contains(101L))
    assert(r(2L).contains(100L))
    assert(r(3L).contains(100L))
    assert(r(4L).isEmpty)
    assert(r(5L).isEmpty)
  }

  test("asOf tolerance drops matches older than the window") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // 2h after the order → stale
      (2L, 10L, ts("2024-01-01 08:10:00")))  // 10 min after → fresh
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 08:00:00"), 100L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val r = AsOfJoin.asOf(left, right, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey"), tolerance = Some("30 minutes"))
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(r(1L).isEmpty)          // match exists but too stale
    assert(r(2L).contains(100L))
  }

  test("asOf forward picks earliest right row at-or-after; tolerance bounds lookahead") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 07:00:00")),  // before both → earliest (08:00)
      (2L, 10L, ts("2024-01-01 08:30:00")),  // between → 09:00
      (3L, 10L, ts("2024-01-01 09:00:00")),  // exactly at second → inclusive
      (4L, 10L, ts("2024-01-01 10:00:00")),  // after all → NULL
      (5L, 99L, ts("2024-01-01 06:00:00")))  // key with no orders → NULL
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 100L),
      (10L, ts("2024-01-01 09:00:00"), 101L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val r = AsOfJoin.asOf(left, right, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey"), direction = "forward")
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(r(1L).contains(100L))
    assert(r(2L).contains(101L))
    assert(r(3L).contains(101L))
    assert(r(4L).isEmpty)
    assert(r(5L).isEmpty)

    // lookahead tolerance: 08:00 order is 60 min ahead of event 1
    val bounded = AsOfJoin.asOf(left, right, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey"),
      tolerance = Some("30 minutes"), direction = "forward")
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(bounded(1L).isEmpty)       // 60 min ahead > 30 min window
    assert(bounded(2L).contains(101L)) // 30 min ahead, inclusive bound
  }

  test("sessionize: gap >= 10 minutes starts a new session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:09:59"), 2.0),  // same session (< 10 min gap)
      (1L, ts("2024-01-01 10:19:59"), 3.0),  // still same (chained)
      (1L, ts("2024-01-01 10:30:00"), 4.0),  // exactly 10:00 after prev → NEW
      (2L, ts("2024-01-01 10:00:00"), 5.0))  // other key
      .toDF("user_id", "ts", "value")
    val r = Sessionize.sessions(events, "user_id", "ts")
      .orderBy("user_id", "session_start")
      .select($"user_id", $"n_events", $"v")
      .as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 3L, 6.0), (1L, 1L, 4.0), (2L, 1L, 5.0)))
  }
}
