package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextClassifier

/** Naive Bayes quality classifier: hand-computed probabilities,
  * smoothing floor for unseen tokens, argmin tie-break, zero-token
  * pass-through in the filter composition. */
class TextClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def e4(p: Double): Long =
    math.floor(-math.log(p) / math.log(2.0) * 10000 + 0.5).toLong

  test("hand-computed NB: counts, smoothing, prior, prediction") {
    val train = Seq((1L, "a", "x x y"), (2L, "b", "y z"))
      .toDF("doc_id", "label", "text")
    val m = TextClassifier.train(train)
    assert(m.vocabSize == 3 && m.nDocs == 2)

    val scored = TextClassifier.scoreNll(
      Seq((10L, "x y")).toDF("doc_id", "text"), m)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // label a: n_tokens=3, c(x)=2, c(y)=1, prior 1/2
    val expA = e4(3.0 / 6) + e4(2.0 / 6) + e4(0.5)
    // label b: n_tokens=2, c(x)=0, c(y)=1, prior 1/2
    val expB = e4(1.0 / 5) + e4(2.0 / 5) + e4(0.5)
    assert(scored == Map("a" -> expA, "b" -> expB))
    assert(expA < expB)

    val pred = TextClassifier.classify(
      Seq((10L, "x y"), (11L, "z z")).toDF("doc_id", "text"), m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(10L -> "a", 11L -> "b"))
  }

  test("exact nll tie breaks to the lexicographically smaller label") {
    val m = TextClassifier.train(
      Seq((1L, "b", "x"), (2L, "a", "y")).toDF("doc_id", "label", "text"))
    // 'x y' is perfectly symmetric between the labels
    val out = TextClassifier.classify(
      Seq((10L, "x y")).toDF("doc_id", "text"), m).collect()
    assert(out.length == 1 && out(0).getString(1) == "a")
  }

  test("filterByLabel drops the other labels, passes zero-token docs") {
    val m = TextClassifier.train(
      Seq((1L, "keep", "good solid prose"), (2L, "drop", "spam spam spam"))
        .toDF("doc_id", "label", "text"))
    val docs = Seq((10L, "good prose"), (11L, "spam spam"), (12L, "   "))
      .toDF("doc_id", "text")
    val kept = TextClassifier.filterByLabel(docs, m, "keep")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 12L)) // 12 has no tokens: no evidence, passes

    TextClassifier.clearModelCache()
  }
}
