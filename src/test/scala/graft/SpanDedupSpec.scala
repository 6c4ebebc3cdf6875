package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.NativeText
import graft.functions.Text
import graft.operators.SpanDedup

/** ExactSubstr span dedup over a hand-built corpus with every edge the
  * operator claims to handle: cross-document spans, within-document
  * repeats, overlapping-window merging, touching-window merging, the
  * one-token-gap split, whole-document coverage, case-insensitive
  * matching, passthrough docs, and empty docs. k = 4 throughout. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // filler tokens are unique per document so no window is duplicated
  // by accident; only the planted sequences repeat
  private lazy val corpus = Seq(
    1L -> "one two three alpha beta gamma delta four five six",
    2L -> "alpha beta gamma delta seven eight nine ten",
    3L -> "just some perfectly unique prose nothing here repeats",
    4L -> "copy cat dog emu fox gnu",
    5L -> "copy cat dog emu fox gnu",
    6L -> "w x y z junk1 junk2 w x y z",
    7L -> "pre1 m n o p q r post1",
    8L -> "m n o p q r tail1 tail2",
    9L -> "ALPHA BETA GAMMA DELTA end1 end2",
    10L -> "   ",
    11L -> "a1 a2 a3 a4 b1 b2 b3 b4",
    12L -> "a1 a2 a3 a4 zz b1 b2 b3 b4"
  ).toDF("doc_id", "text")

  private lazy val spans =
    SpanDedup.duplicatedSpans(corpus, k = 4)
      .select($"doc_id", $"span_start", $"span_end", $"span_ntok")
      .as[(Long, Int, Int, Int)].collect().toSet

  test("duplicatedSpans: cross-doc, within-doc, merged, split, and whole-doc spans") {
    val expected = Set(
      (1L, 3, 7, 4),   // planted 4-token sequence mid-document
      (2L, 0, 4, 4),   // same sequence at the front
      (9L, 0, 4, 4),   // same sequence, case-insensitive match
      (4L, 0, 6, 6),   // exact-duplicate documents: full coverage...
      (5L, 0, 6, 6),   // ...in both copies
      (6L, 0, 4, 4),   // within-document repeat, first occurrence
      (6L, 6, 10, 4),  // second occurrence; gap 6 > 0+4 keeps them split
      (7L, 1, 7, 6),   // 6-token run: 3 overlapping windows merge
      (8L, 0, 6, 6),
      (11L, 0, 8, 8),  // windows at 0 and 4 touch (4 == 0+k): one island
      (12L, 0, 4, 4),  // same windows split by the zz token (5 > 0+4)
      (12L, 5, 9, 4))
    assert(spans == expected)
  }

  test("removeSpans: survivors re-joined, full-coverage docs empty, passthrough intact") {
    val got = SpanDedup.dedupSpans(corpus, k = 4)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("one two three four five six", 4L)))
    assert(got(2L) == (("seven eight nine ten", 4L)))
    assert(got(3L) == (("just some perfectly unique prose nothing here repeats", 0L)))
    assert(got(4L) == (("", 6L)) && got(5L) == (("", 6L)))
    assert(got(6L) == (("junk1 junk2", 8L)))
    assert(got(7L) == (("pre1 post1", 6L)))
    assert(got(8L) == (("tail1 tail2", 6L)))
    assert(got(9L) == (("end1 end2", 4L)))   // kept text is normalized (lowercase)
    assert(got(10L) == (("", 0L)))           // no tokens at all
    assert(got(11L) == (("", 8L)))
    assert(got(12L) == (("zz", 8L)))
    assert(got.size == 12)
  }

  test("wordNgramHashes: window count and fixture-scale injectivity vs gram strings") {
    val docs = Tables.loadDocs(spark)
    val k = 8
    val counted = docs.select(
      size(NativeText.wordNgramHashes(Text.tokens($"text"), k)).as("nh"),
      greatest(size(Text.tokens($"text")) - (k - 1), lit(0)).as("want"))
    assert(counted.where($"nh" =!= $"want").count() == 0)
    // the 64-bit chained hash must separate every distinct gram the
    // string formulation separates — the collision-freeness the x53
    // oracle's gram-string join relies on
    val h = docs.select(explode(
      NativeText.wordNgramHashes(Text.tokens($"text"), k)).as("v"))
      .agg(countDistinct($"v")).as[Long].head()
    val g = docs.select(explode(
      NativeText.wordNgrams(Text.tokens($"text"), k)).as("v"))
      .agg(countDistinct($"v")).as[Long].head()
    // wordNgrams is distinct-per-doc; countDistinct collapses both to
    // the corpus-wide distinct gram population
    assert(h == g, s"hash collisions: $h hashes for $g distinct grams")
  }

  test("removeTokenRanges: clamping, empty ranges, and boundary cuts") {
    val df = Seq(("a b c d e", Seq(0, 4), Seq(2, 9)))
      .toDF("t", "ss", "ee")
      .select(NativeText.removeTokenRanges(Text.tokens($"t"),
        $"ss", $"ee").as("r"))
      .select($"r.kept_text", $"r.n_removed").as[(String, Long)].head()
    // [0,2) cuts a b; [4,9) clamps to the 5-token stream and cuts e
    assert(df == (("c d", 3L)))
  }

  private object Tables {
    def loadDocs(s: org.apache.spark.sql.SparkSession) =
      graft.sources.Tables.load(s, "/root/testdata/sf0.001", "documents")
  }
}
