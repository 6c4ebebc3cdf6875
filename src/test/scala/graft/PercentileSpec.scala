package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Percentiles

class PercentileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, ps: Seq[(String, Double)]) =
    df.groupBy($"g").agg(
      ps.map { case (n, p) => expr(s"percentile(v, $p)").as(n) }.head,
      ps.map { case (n, p) => expr(s"percentile(v, $p)").as(n) }.tail: _*)

  private def assertMatches(df: org.apache.spark.sql.DataFrame,
                            ps: Seq[(String, Double)]): Unit = {
    val got = Percentiles.exact(df, "g", "v", ps)
      .select("g", ps.map(_._1): _*)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val want = builtin(df, ps)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet; (a, b) <- got(k).zip(want(k)))
      assert(math.abs(a.asInstanceOf[Double] - b.asInstanceOf[Double]) < 1e-9,
        s"group $k: got ${got(k)} want ${want(k)}")
  }

  test("sort-based exact percentiles match the builtin on random groups") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(2000) { i =>
      (s"g${i % 7}", math.floor(rnd.nextDouble() * 1000) / 4) // many ties
    }
    assertMatches(rows.toDF("g", "v"),
      Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))
  }

  test("edge percentiles 0.0/1.0 and tiny groups (n=1, n=2)") {
    val df = Seq(
      ("a", 5.0),
      ("b", 1.0), ("b", 2.0),
      ("c", 3.0), ("c", 1.0), ("c", 2.0)).toDF("g", "v")
    assertMatches(df, Seq("pmin" -> 0.0, "p50" -> 0.5, "pmax" -> 1.0))
  }

  test("NULL values are ignored; all-NULL groups drop; n_vals counts non-nulls") {
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("z", None)).toDF("g", "v")
    val out = Percentiles.exact(df, "g", "v", Seq("p50" -> 0.5)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getDouble(1) == 2.0 && r.getLong(2) == 2L)
  }

  test("exactSharded equals exact: hot group, heavy ties, tiny groups") {
    val rnd = new scala.util.Random(31)
    // one group holds ~95% of rows (the hot-group hazard the sharding
    // removes); heavy ties so tied runs straddle no shard boundary
    val rows = Seq.tabulate(4000) { i =>
      val g = if (i % 20 < 19) "hot" else s"g${i % 3}"
      (g, math.floor(rnd.nextDouble() * 50) / 2) // ~100 distinct values
    } ++ Seq(("one", 42.0), ("two", 1.0), ("two", 9.0))
    val df = rows.toDF("g", "v")
    val ps = Seq("p0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5,
      "p90" -> 0.9, "p100" -> 1.0)
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("g").collect().map(_.toSeq).toSeq
    val a = rowsOf(Percentiles.exact(df, "g", "v", ps))
    val b = rowsOf(Percentiles.exactSharded(df, "g", "v", ps, nShards = 16))
    assert(a == b)
    // degenerate distribution (1 distinct value) falls back cleanly
    val const = Seq.tabulate(50)(i => (s"g${i % 2}", 7.0)).toDF("g", "v")
    val c = rowsOf(Percentiles.exactSharded(const, "g", "v", Seq("p50" -> 0.5)))
    assert(c == rowsOf(Percentiles.exact(const, "g", "v", Seq("p50" -> 0.5))))
  }
}
