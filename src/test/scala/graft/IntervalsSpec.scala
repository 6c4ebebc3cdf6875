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

  test("binary keys merge by VALUE (Array[Byte] equality is referential by default)") {
    // two distinct Array[Byte] instances with equal bytes: islands of
    // the same binary key must merge across rows/partitions
    val rows = Seq(
      (Array[Byte](1, 2), 1L, 5L),
      (Array[Byte](1, 2), 4L, 9L), // overlaps → one island
      (Array[Byte](3), 1L, 2L))
      .toDF("k", "s", "e")
    val out = Intervals.mergeIslands(rows.repartition(3), "k", "s", "e", Nil)
      .collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      (Seq[Byte](1, 2), 1L, 9L, 2L),
      (Seq[Byte](3), 1L, 2L, 1L)))
  }

  test("unsupported key/endpoint types fail loudly up front, not mid-job") {
    val arrKey = Seq((Seq(1, 2), 1L, 2L)).toDF("k", "s", "e")
    val e1 = intercept[IllegalArgumentException] {
      Intervals.mergeIslands(arrKey, "k", "s", "e", Nil)
    }
    assert(e1.getMessage.contains("key"))
    val binEndpoint = Seq(("a", Array[Byte](1), Array[Byte](2)))
      .toDF("k", "s", "e")
    val e2 = intercept[IllegalArgumentException] {
      Intervals.mergeIslands(binEndpoint, "k", "s", "e", Nil)
    }
    assert(e2.getMessage.contains("endpoint"))
  }

  test("inverted intervals (e < s) are dropped, not merged") {
    val bad = Seq(
      ("A", 1L, 5L, 1), ("A", 4L, 8L, 2),
      // inverted: would sort at start 9 and break the [1,8] island
      // into phantom pieces if admitted
      ("A", 9L, 2L, 3)).toDF("k", "s", "e", "uid")
    val out = Intervals.mergeIslands(bad, "k", "s", "e", Seq("uid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(("A", 1L, 8L, 2L)))
  }

  test("hot key spanning many range partitions: chains fold exactly") {
    // ONE key, 200k intervals — the shape that single-tasks a
    // PARTITION BY key window. Ranges engineered so ground truth is
    // closed-form: interval i = [2i, 2i+2] (each touches the next →
    // one island per parity-free run) except every 1000th starts a gap.
    val n = 200000
    val rows = spark.range(n.toLong).selectExpr(
      "'hot' AS k",
      "CAST(id * 2 + (id DIV 1000) * 10 AS LONG) AS s",
      "CAST(id * 2 + (id DIV 1000) * 10 + 2 AS LONG) AS e",
      "id AS uid")
    val out = Intervals.mergeIslands(rows, "k", "s", "e", Seq("uid"))
      .collect()
    // gaps open exactly at every id multiple of 1000 (shift jumps by
    // 10 > island reach 2): 200 islands of 1000 intervals each
    assert(out.length == n / 1000, s"got ${out.length} islands")
    assert(out.forall(_.getLong(3) == 1000L))
    val spans = out.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.zipWithIndex.foreach { case ((s0, e0), i) =>
      val base = i.toLong * 2000 + i.toLong * 10
      assert(s0 == base && e0 == base + 2 * 999 + 2, s"island $i: ($s0,$e0)")
    }
  }

  test("one interval's end spanning several later partitions still absorbs them") {
    // first interval covers everything; 100k later short intervals
    // land in other range partitions but must all fold into ONE island
    // (the cross-partition prefix-max carry, not just adjacent-pair
    // stitching)
    val rows = spark.range(100000).selectExpr(
      "'k' AS k",
      "CAST(id + 1 AS LONG) AS s",
      "CAST(id + 2 AS LONG) AS e",
      "id AS uid")
      .union(Seq(("k", 0L, 1000000L, -1L)).toDF("k", "s", "e", "uid"))
    val out = Intervals.mergeIslands(rows, "k", "s", "e", Seq("uid")).collect()
    assert(out.length == 1)
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3)) ==
      (0L, 1000000L, 100001L))
  }
}
