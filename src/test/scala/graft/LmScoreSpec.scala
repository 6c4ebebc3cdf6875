package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmScore

/** Bigram-LM scoring against hand-computed probabilities. */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // train: bigrams (the,cat)x2 (cat,sat) (cat,ran); ctx the=2 cat=2;
  // V = |{the, cat, sat, ran}| = 4
  private lazy val train = Seq(
    1L -> "the cat sat", 2L -> "the cat ran").toDF("doc_id", "text")
  private lazy val lm = LmScore.train(train)

  test("training counts: pair table, context totals, vocabulary size") {
    assert(lm.vocabSize == 4L)
    val bigs = lm.big.as[(String, String, Long)].collect().toSet
    assert(bigs == Set(("the", "cat", 2L), ("cat", "sat", 1L), ("cat", "ran", 1L)))
    val ctx = lm.ctx.as[(String, Long)].collect().toSet
    assert(ctx == Set(("the", 2L), ("cat", 2L)))
  }

  test("scoreBits matches hand-computed smoothed -log2 costs") {
    val docs = Seq(
      10L -> "the cat sat",   // (the,cat): (2+1)/(2+4)=0.5 -> 10000; (cat,sat): 2/6 -> 15850
      11L -> "dog ate",       // OOV pair: 1/(0+4)=0.25 -> 20000
      12L -> "the",           // no bigram -> no row
      13L -> "CAT ran mud"    // lowercased: (cat,ran) 2/6 -> 15850; (ran,mud) 1/4 -> 20000
    ).toDF("doc_id", "text")
    val got = LmScore.scoreBits(docs, lm)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      10L -> ((25850L, 2L)),
      11L -> ((20000L, 1L)),
      13L -> ((35850L, 2L))))
  }

  test("filterFluent keeps documents at or under the bits-per-token cap") {
    val docs = Seq(10L -> "the cat sat", 11L -> "dog ate qux zap",
      12L -> "hello", 13L -> "")
      .toDF("doc_id", "text")
    val kept = LmScore.filterFluent(docs, lm, maxBitsPerToken = 1.5)
      .select($"doc_id").as[Long].collect().toSet
    // 10: 25850 <= 2*15000; 11: three OOV transitions at 20000 > 15000;
    // 12/13: zero bigrams = zero evidence of disfluency -> pass
    // through (a semi-join on scored docs would wrongly delete them)
    assert(kept == Set(10L, 12L, 13L))
  }
}
