package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Fim, Mixing}
import org.apache.spark.sql.functions._

/** FIM transformation: hand-traced PSM cuts, edge offsets, the
  * reconstruction property, and the hash-recipe helper; temperature
  * mixing: hand-computed rates and the n^alpha expectation. */
class FimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fimOf(text: String, a: Int, b: Int): String =
    Seq(text).toDF("t")
      .select(Fim.fim(col("t"), lit(a), lit(b))).head().getString(0)

  test("hand-traced PSM cuts and edge offsets") {
    assert(fimOf("abcdef", 2, 4) == "<PRE>ab<SUF>ef<MID>cd")
    assert(fimOf("abcdef", 0, 6) == "<PRE><SUF><MID>abcdef") // whole doc is middle
    assert(fimOf("abcdef", 0, 0) == "<PRE><SUF>abcdef<MID>") // empty middle at front
    assert(fimOf("abcdef", 6, 6) == "<PRE>abcdef<SUF><MID>") // empty middle at end
    assert(fimOf("", 0, 0) == "<PRE><SUF><MID>")
  }

  test("reconstruction: prefix + middle + suffix is the original text") {
    val docs = (1L to 200L)
      .map(i => (i, s"doc $i " + ("xyz " * (i % 17).toInt).trim))
      .toDF("doc_id", "text")
    val n = length(col("text"))
    val a = (col("doc_id") * 7919) % (n + 1)
    val b = a + ((col("doc_id") * 104729) % (n - a + 1))
    val parts = docs.select(col("text"),
      col("text").substr(lit(1), a).as("p"),
      col("text").substr(a + 1, b - a).as("m"),
      col("text").substr(b + 1, n - b).as("s"))
    assert(parts.where(concat(col("p"), col("m"), col("s")) =!= col("text"))
      .count() == 0)
  }

  test("applyFim: rate 0 passes all through, rate 1 transforms all, 0.5 mixes") {
    val docs = (1L to 400L).map(i => (i, s"body of document $i"))
      .toDF("doc_id", "text")
    val all = Fim.applyFim(docs, "text", "doc_id", rate = 1.0)
    assert(all.where(!col("fim_text").startsWith("<PRE>")).count() == 0)
    val none = Fim.applyFim(docs, "text", "doc_id", rate = 0.0)
    assert(none.where(col("fim_text") =!= col("text")).count() == 0)
    val half = Fim.applyFim(docs, "text", "doc_id", rate = 0.5)
      .where(col("fim_text").startsWith("<PRE>")).count()
    assert(half > 120 && half < 280) // deterministic, ~rate-proportional
    // deterministic: same salt, same selection
    assert(Fim.applyFim(docs, "text", "doc_id", rate = 0.5)
      .where(col("fim_text").startsWith("<PRE>")).count() == half)
  }

  test("applyFim fails fast on NULL keys (never a silent passthrough)") {
    val docs = Seq((Some(1L), "a doc"), (None, "null-key doc"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Fim.applyFim(docs, "text", "doc_id", rate = 1.0).collect()
    }
    assert(e.getMessage != null)
  }

  test("temperatureRates drops NULL domains (sampler sends them to the default)") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, Some("b")))
      .toDF("id", "dom")
    val r = Mixing.temperatureRates(df, "dom", alpha = 0.5).toMap
    assert(r.keySet == Set("a", "b")) // no NPE, no null key
    // and the null-domain row is dropped by the sampler
    val kept = Mixing.temperatureSample(df, "dom", "id", alpha = 0.5)
    assert(kept.where(col("dom").isNull).count() == 0)
  }

  test("temperatureRates: hand-computed, alpha=1 natural, kept ~ n^alpha") {
    val df = (Seq.fill(1600)("big") ++ Seq.fill(100)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "dom")
    val r = Mixing.temperatureRates(df, "dom", alpha = 0.5).toMap
    assert(r("big") == 1.0) // head capped (maxRate default 1)
    // (100/1600)^(-0.5) = 4 -> capped at 1 too; with maxRate 0.2:
    val r2 = Mixing.temperatureRates(df, "dom", alpha = 0.5, maxRate = 0.2).toMap
    assert(r2("big") == 0.2)
    assert(math.abs(r2("small") - 0.8) < 1e-12) // 0.2 * 4
    // alpha = 1: everyone keeps exactly maxRate
    val r3 = Mixing.temperatureRates(df, "dom", alpha = 1.0, maxRate = 0.7)
    assert(r3.forall(_._2 == 0.7))
    // expected kept counts ~ n^alpha: 1600*0.2 = 320 vs 100*0.8 = 80
    // — the 16x head is only 4x after balancing (sqrt), by design
    val kept = Mixing.temperatureSample(df, "dom", "id", alpha = 0.5,
      maxRate = 0.2).groupBy("dom").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(math.abs(kept("big") - 320L) < 60)
    assert(math.abs(kept("small") - 80L) < 30)
  }
}
