package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a"),
    (2L, "b c"),
    (3L, "c c c")).toDF("doc_id", "text")

  test("BM25 matches the Okapi formula computed by hand") {
    val got = Bm25.score(corpus, Seq("a", "c"))
      .as[(Long, Double)].collect().toMap
    // N = 3, dl = (3, 2, 3), avgdl = 8/3
    val avgdl = 8.0 / 3.0
    def idf(df: Long) = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def part(tf: Long, dl: Long, df: Long) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    val expected = Map(
      1L -> part(2, 3, 1),           // "a": tf=2 in doc1 only (df=1)
      2L -> part(1, 2, 2),           // "c": df=2 (docs 2 and 3)
      3L -> part(3, 3, 2))
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 1e-12, s"doc $id: got ${got(id)} want $e")
    }
  }

  test("BM25 invariants: repeated query terms dedupe; non-matching docs drop") {
    val a = Bm25.score(corpus, Seq("a", "a", "A"))
      .as[(Long, Double)].collect().toMap
    val b = Bm25.score(corpus, Seq("a")).as[(Long, Double)].collect().toMap
    assert(a == b)          // duplicates and case collapse
    assert(a.keySet == Set(1L)) // only doc 1 contains "a"
  }

  test("tfidf: rarer terms score higher at equal tf; dl plays no role") {
    val t = Bm25.tfidf(corpus).as[(Long, String, Long, Double)].collect()
      .map { case (id, term, tf, v) => (id, term) -> (tf, v) }.toMap
    // "b" (df=2) vs "c" in doc2 (df=2): same tf, same df → same tfidf
    assert(t((2L, "b"))._2 == t((2L, "c"))._2)
    // "a" df=1 beats "b" df=2 at tf=1... compare idf parts directly
    val idfA = t((1L, "a"))._2 / t((1L, "a"))._1   // tfidf/tf = idf
    val idfB = t((1L, "b"))._2 / t((1L, "b"))._1
    assert(idfA > idfB)
  }

  test("empty and stop-word-free docs never match but still dilute avgdl") {
    val withEmpty = corpus.union(Seq((4L, ""), (5L, "   ")).toDF("doc_id", "text"))
    val got = Bm25.score(withEmpty, Seq("c")).as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(2L, 3L))
    // avgdl drops from 8/3 to 8/5 → shorter effective dl penalty shifts
    val avgdl = 8.0 / 5.0
    def idf(df: Long) = math.log(1.0 + (5.0 - df + 0.5) / (df + 0.5))
    val e2 = idf(2) * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / avgdl))
    assert(math.abs(got(2L) - e2) < 1e-12)
  }
}
