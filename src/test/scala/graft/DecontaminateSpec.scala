package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontaminate

/** Unit semantics for both decontamination screens (the x35/x63 gates
  * verify them against DuckDB at fixture scale; these pin hand-sized
  * cases and the edge semantics the oracles can't isolate). */
class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ngramOverlap: counts distinct shared n-grams, ignores train-only docs") {
    val docs = Seq(
      (1L, "train", "alpha beta gamma delta epsilon"),
      (2L, "train", "zeta eta theta iota kappa"),
      // test doc: shares the 3-grams "alpha beta gamma" + "beta gamma
      // delta" with doc 1; its own tail grams are unseen
      (3L, "test", "alpha beta gamma delta unseen tail words"),
      // test doc with no overlap
      (4L, "test", "completely fresh material nothing shared"),
      // val split must not participate on either side
      (5L, "val", "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "split", "text")
    val r = Decontaminate.ngramOverlap(docs, "split", "train", "test", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(3L -> 2L)) // doc 4 clean → absent, doc 5 ignored
  }

  test("semantic: flags only vectors within threshold, best match deterministic") {
    // unit vectors in 4-d: corpus 10 is a perturbed copy of bench 100,
    // corpus 11 is orthogonal to everything in the bench
    val corpus = Seq(
      (10L, Seq(0.9999, 0.0141, 0.0, 0.0)),
      (11L, Seq(0.0, 0.0, 1.0, 0.0)),
      (12L, Seq(0.7071, 0.7071, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),
      (101L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val r = Decontaminate.semantic(corpus, bench, threshold = 0.9)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // 10 ≈ bench 100 (sim ≈ 0.9999); 11 orthogonal (0.0); 12 at 0.7071
    assert(r.map(x => (x._1, x._2)) == Seq((10L, 100L)))
    assert(r.head._3 > 0.99)
  }

  test("semantic: equal-similarity tie breaks to the lower bench_id") {
    val corpus = Seq((1L, Seq(1.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    // two benchmark vectors equidistant from the corpus vector
    val bench = Seq(
      (200L, Seq(1.0, 0.0, 0.0)),
      (100L, Seq(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val r = Decontaminate.semantic(corpus, bench, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 100L, 0.7071)))
  }

  test("semantic: disjoint spaces and empty benchmark flag nothing") {
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val far = Seq((9L, Seq(-1.0, 0.0))).toDF("vec_id", "embedding")
    assert(Decontaminate.semantic(corpus, far, threshold = 0.5).count() == 0)
    val empty = far.where(lit(false))
    assert(Decontaminate.semantic(corpus, empty, threshold = 0.0).count() == 0)
  }

  test("overlapFraction: exact fraction arithmetic, zero-hit docs judged, short docs skipped") {
    val docs = Seq(
      (1L, "train", "alpha beta gamma delta epsilon"),
      // 4 distinct 3-grams; the first two appear in doc 1 -> 2/4
      (3L, "test", "alpha beta gamma delta zzz qqq"),
      // clean test doc: 1 gram, 0 hits -> present with frac 0
      (4L, "test", "one two three"),
      // too short for a 3-gram: not judged
      (5L, "test", "tiny doc"))
      .toDF("doc_id", "split", "text")
    val got = Decontaminate.overlapFraction(docs, "split", "train", "test", n = 3)
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(got(3L) == ((4L, 2L, 5000L)))
    assert(got(4L) == ((1L, 0L, 0L)))
    assert(!got.contains(5L))
  }

  private implicit class Tup4Map(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
