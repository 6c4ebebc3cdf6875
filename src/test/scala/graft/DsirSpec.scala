package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: target-like documents must outweigh
  * off-distribution ones; weights cover every raw id; the Gumbel
  * sample is deterministic and partitioning-invariant. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = {
    val targetish = (0L until 40L).map(i =>
      (i, "alpha beta gamma delta alpha beta epsilon zeta"))
    val junk = (100L until 140L).map(i =>
      (i, "zzz qqq xxx www vvv uuu ttt sss"))
    val empty = Seq((200L, ""))
    (targetish ++ junk ++ empty).toDF("doc_id", "text")
  }

  private def target =
    (1000L until 1020L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta alpha")).toDF("doc_id", "text")

  test("target-like raw docs outweigh off-distribution docs; empty text weighs 0") {
    val w = Dsir.importanceWeights(corpus, target)
      .as[(Long, Long)].collect().toMap
    assert(w.size == 81, "every raw id gets a weight")
    assert(w(200L) == 0L, "no grams -> weight 0")
    val targetish = (0L until 40L).map(w)
    val junk = (100L until 140L).map(w)
    assert(targetish.min > junk.max,
      s"target-like docs must outweigh junk: ${targetish.min} vs ${junk.max}")
  }

  test("resample is deterministic, partitioning-invariant, and k-bounded") {
    val a = Dsir.resample(corpus, target, k = 30)
      .as[(Long, Long)].collect().toSet
    val b = Dsir.resample(corpus.repartition(7), target, k = 30)
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.size == 30)
    // with weights this far apart, the sample should be dominated by
    // target-like docs (30 slots, 40 target-like candidates)
    val pickedTargetish = a.count(_._1 < 100L)
    assert(pickedTargetish >= 25, s"importance sampling must favor the target: $pickedTargetish/30")
  }

  test("bucket log-ratio table is bounded by the bucket count") {
    val r = Dsir.bucketLogRatios(corpus, target)
    assert(r.count() <= Dsir.Buckets)
    // ratios for buckets only the junk vocabulary touches are negative
    assert(r.agg(min("logratio_e4")).as[Long].head() < 0L)
  }
}
