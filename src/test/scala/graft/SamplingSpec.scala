package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling: exact-N stratified counts, partitioning
  * invariance, weighted selection law, NULL/edge semantics. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = (1L to 400L)
    .map(i => (i, if (i % 4 == 0) null else s"s${i % 3}"))
    .toDF("id", "stratum")

  test("stratifiedExact takes exactly min(n, |stratum|) per stratum, NULL stratum included") {
    val out = Sampling.stratifiedExact(docs, "stratum", "id", n = 30, salt = "t")
    val counts = out.groupBy("stratum").count()
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    // 400 rows: 100 NULL (every 4th); s0/s1/s2 split the rest
    assert(counts.values.toSet == Set(30L))
    assert(counts.keySet ==
      Set(Some("s0"), Some("s1"), Some("s2"), None))
    // a stratum smaller than n is taken whole
    val small = Sampling.stratifiedExact(docs, "stratum", "id", n = 1000)
    assert(small.count() == 400)
    assert(small.agg(max("in_stratum_rank")).as[Long].head() <= 134)
  }

  test("stratified selection is a pure function of (salt, key): partitioning-invariant, salt-sensitive") {
    def ids(df: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.stratifiedExact(df, "stratum", "id", n = 20, salt = salt)
        .select("id").as[Long].collect().toSet
    val a = ids(docs.repartition(1), "t")
    val b = ids(docs.repartition(13, col("id")), "t")
    assert(a == b)
    assert(ids(docs, "other") != a) // different salt, different sample
  }

  test("stratified ranks follow md5-hash order within the stratum") {
    val out = Sampling.stratifiedExact(docs, "stratum", "id", n = 5, salt = "t")
      .withColumn("u", Sampling.uniform(col("id"), "t"))
    out.collect().groupBy(r => Option(r.getString(1))).foreach {
      case (_, rows) =>
        val byRank = rows.sortBy(_.getAs[Long]("in_stratum_rank"))
        val us = byRank.map(_.getAs[Double]("u"))
        assert(us.sameElements(us.sorted))
    }
  }

  test("uniform lands in (0,1] and matches conv of the md5 prefix") {
    val u = docs.select(Sampling.uniform(col("id"), "z").as("u"))
      .as[Double].collect()
    assert(u.forall(x => x > 0.0 && x <= 1.0))
    // spot-check the arithmetic against an independent JVM computation
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("z42".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val expect = (java.lang.Long.parseLong(h, 16) + 1.0) / 4294967296.0
    val got = docs.where(col("id") === 42)
      .select(Sampling.uniform(col("id"), "z")).as[Double].head()
    assert(got == expect)
  }

  test("stratifiedSplit: per-stratum proportions exact to the ceil boundary, exhaustive, deterministic") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.stratifiedSplit(docs, "stratum", "id", splits, "sp")
    // every stratum has exactly 100 rows → boundaries at 80 / 90
    val cells = out.groupBy("stratum", "split").count().collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2))
      .toMap
    for (s <- Seq(Some("s0"), Some("s1"), Some("s2"), None)) {
      assert(cells((s, "train")) == 80L, s"stratum $s")
      assert(cells((s, "val")) == 10L && cells((s, "test")) == 10L)
    }
    assert(out.count() == 400) // exhaustive: every row got a split
    // deterministic under repartitioning
    val again = Sampling.stratifiedSplit(docs.repartition(11, col("id")),
      "stratum", "id", splits, "sp")
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == again)
    // a 1-row stratum lands wholly in the FIRST split (ceil(0.8·1)=1)
    val tiny = Seq((1L, "only")).toDF("id", "stratum")
    assert(Sampling.stratifiedSplit(tiny, "stratum", "id", splits, "sp")
      .select("split").as[String].head() == "train")
  }

  test("weightedSample: no replacement, n rows, positive-weight filter, determinism") {
    val parts = (1L to 300L).map(i =>
      (i, if (i % 50 == 0) -1.0 else if (i % 51 == 0) 0.0 else i.toDouble))
      .toDF("id", "w")
    val out = Sampling.weightedSample(parts, "id", "w", n = 40, salt = "t")
      .select("id").as[Long].collect()
    assert(out.length == 40 && out.distinct.length == 40)
    assert(out.forall(i => i % 50 != 0 && i % 51 != 0))
    val again = Sampling.weightedSample(parts.repartition(7), "id", "w",
      n = 40, salt = "t").select("id").as[Long].collect()
    assert(out.toSet == again.toSet)
  }

  test("weightedSample favors heavy weights (law, not bit-pattern)") {
    // weights 1000:1 — the heavy item should be selected in (nearly)
    // every one of 30 independent salts; the light-only control is not
    val df = ((1L to 99L).map((_, 1.0)) :+ (100L, 1000.0)).toDF("id", "w")
    val hits = (1 to 30).count { s =>
      Sampling.weightedSample(df, "id", "w", n = 10, salt = s"s$s")
        .select("id").as[Long].collect().contains(100L)
    }
    assert(hits >= 28, s"heavy item selected only $hits/30 times")
  }
}
