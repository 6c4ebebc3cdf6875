package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Intervals
import org.apache.spark.sql.functions._

/** Gaps-and-islands semantics: containment, touching, NULL
  * endpoints, per-key independence, coverage arithmetic. */
class IntervalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def iv = Seq(
    // key A: [1,10] contains [2,3]; [4,5] starts after lag-end 3 but
    // inside the running max 10 — the case a lag(e) formulation gets
    // wrong; [10,12] touches (start == running max) and merges;
    // [14,15] is a second island
    ("A", d("2024-01-01"), d("2024-01-10"), 1),
    ("A", d("2024-01-02"), d("2024-01-03"), 2),
    ("A", d("2024-01-04"), d("2024-01-05"), 3),
    ("A", d("2024-01-10"), d("2024-01-12"), 4),
    ("A", d("2024-01-14"), d("2024-01-15"), 5),
    // key B: same dates must not interact with A's islands
    ("B", d("2024-01-11"), d("2024-01-13"), 6),
    // NULL endpoint rows are dropped, not merged
    ("B", null.asInstanceOf[Date], d("2024-01-20"), 7),
    ("B", d("2024-01-21"), null.asInstanceOf[Date], 8))
    .toDF("k", "s", "e", "uid")

  test("mergeIslands: containment + touching merge, gaps split, keys independent") {
    val out = Intervals.mergeIslands(iv, "k", "s", "e", Seq("uid"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3))).toSet
    assert(out == Set(
      ("A", "2024-01-01", "2024-01-12", 4L),
      ("A", "2024-01-14", "2024-01-15", 1L),
      ("B", "2024-01-11", "2024-01-13", 1L)))
  }

  test("coverageByKey: inclusive day arithmetic") {
    val cov = Intervals.coverageByKey(iv, "k", "s", "e", Seq("uid"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getDate(4).toString)).toMap
    // A: [01..12] = 12 days + [14..15] = 2 days
    assert(cov("A") == (2L, 14L, "2024-01-01", "2024-01-15"))
    assert(cov("B") == (1L, 3L, "2024-01-11", "2024-01-13"))
  }

  test("island structure is partitioning-invariant") {
    val a = Intervals.mergeIslands(iv.repartition(1), "k", "s", "e", Seq("uid"))
    val b = Intervals.mergeIslands(iv.repartition(5, col("uid")),
      "k", "s", "e", Seq("uid"))
    assert(a.collect().toSet == b.collect().toSet)
  }
}
