package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** BPE training against the hand-traceable subword-nmt example. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // counts: low:3 lower:2 lowest:1 → pairs l-o:6 o-w:6 w-e:3 e-r:2
  // e-s:1 s-t:1; ties break lexicographically
  private lazy val corpus = Seq(
    1L -> "low lower lowest low", 2L -> "low lower").toDF("doc_id", "text")

  test("train learns the classic merge sequence with deterministic tie-breaks") {
    val model = Bpe.train(corpus, numMerges = 4)
    assert(model.merges == Seq(("l", "o"), ("lo", "w"), ("low", "e"),
      ("lowe", "r")))
    // merge exhaustion stops early instead of looping
    assert(Bpe.train(corpus, numMerges = 100).merges.length < 100)
  }

  test("apply: greedy lowest-rank fusing, OOV degrades to characters, reconstruction holds") {
    val model = Bpe.train(corpus, numMerges = 4)
    def sub(s: String): Seq[String] = Seq(s).toDF("t")
      .select(Bpe.subwords($"t", model)).as[Seq[String]].head()
    assert(sub("low") == Seq("low"))
    assert(sub("lower") == Seq("lower"))
    assert(sub("lowest") == Seq("lowe", "s", "t"))
    assert(sub("newest") == Seq("n", "e", "w", "e", "s", "t")) // no merge applies
    assert(sub("LOW lower") == Seq("low", "lower"))            // lowercased tokens
    assert(sub("  ") == Seq.empty)
    // non-BMP code points stay whole symbols
    assert(sub("a😀b") == Seq("a", "😀", "b"))
    // reconstruction: concatenated subwords == concatenated tokens
    val docs = Seq(10L -> "the lowest lower low rivers flow lowest")
      .toDF("doc_id", "text")
    val r = docs.select(
      concat_ws("", Bpe.subwords($"text", model)).as("a"),
      concat_ws("", graft.functions.Text.tokens($"text")).as("b"))
      .as[(String, String)].head()
    assert(r._1 == r._2)
  }

  test("modelFor caches per (key, params)") {
    val m1 = Bpe.modelFor("bpespec", corpus, numMerges = 4)
    assert(Bpe.modelFor("bpespec", sys.error("no retrain"), numMerges = 4) eq m1)
    // different params -> different cache slot, not the stale model
    val m2 = Bpe.modelFor("bpespec", corpus, numMerges = 2)
    assert(m2.merges.length == 2 && !(m2 eq m1))
  }
}
