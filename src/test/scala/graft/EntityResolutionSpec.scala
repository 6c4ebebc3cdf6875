package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.NativeEditSim
import graft.operators.EntityResolution
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler expression vs independently-computed reference values
  * (probed from DuckDB's C++ jaro_winkler_similarity), plus the
  * blocking + transitive-closure resolution semantics. */
class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    NativeEditSim.jaroWinklerEval(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler matches the published reference values") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("CRATE", "TRACE", 0.7333333333333334), // no common prefix, no boost
      ("abcdxxxxxx", "abcdyyyyyy", 0.6), // jaro <= 0.7: boost NOT applied
      ("acme corp", "acme corporation", 0.9125),
      ("globex inc", "globex incorporated", 0.9052631578947368),
      ("x", "xy", 0.8500000000000001),
      ("aa", "aaaa", 0.8666666666666667),
      ("abcde", "abdce", 0.9466666666666665), // one transposition
      ("ab", "ba", 0.0), // window 0 -> no matches
      ("a", "a", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0), // DuckDB convention: empty never matches
      // ODD disagreement counts: greedy matching yields 3 positional
      // disagreements here; the half-count must FLOOR (t = 1), the
      // DuckDB/rapidfuzz convention — keeping the .5 scores these
      // lower and flips >= 0.9 linkage verdicts
      ("fabd", "bfeabfd", 0.6150793650793651),
      ("eab geaafc ec", "ebb geaafc ec", 0.9038461538461539),
      (" baddeab ab", " badeab dab", 0.9636363636363636))
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
    }
  }

  test("resolve: transitive closure merges chains; singletons self-resolve; NULLs never merge") {
    val recs = Seq(
      (1L, "acme corporation"), // 1~2 and 2~3 but 1~3 weaker: closure must merge all 3
      (2L, "acme corporatio"),
      (3L, "acme corporati"),
      (10L, "zeta dynamics"), // singleton
      (20L, null.asInstanceOf[String]), // NULL name -> own entity
      (21L, null.asInstanceOf[String]))
      .toDF("id", "name")
    val got = EntityResolution.resolve(recs, "id", "name", threshold = 0.95)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L)
    assert(got(20L) == 20L && got(21L) == 21L, "NULL names must not merge")
  }

  test("blocking: names differing in the key prefix are never compared") {
    val recs = Seq((1L, "acme corp"), (2L, "bcme corp")).toDF("id", "name")
    // jw('acme corp','bcme corp') ≈ 0.926 — above threshold, but the
    // 2-char blocks (ac vs bc) differ, so no pair forms
    assert(jw("acme corp", "bcme corp") > 0.9)
    val p = EntityResolution.pairs(recs, "id", "name", threshold = 0.9)
    assert(p.count() == 0)
    val got = EntityResolution.resolve(recs, "id", "name", threshold = 0.9)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("skewed block escalates to sorted-neighborhood; near dups still pair") {
    // 60 records, ALL in block 'du': 20 entities × 3 variants. With
    // maxBlockSize forcing escalation, variants sort adjacent (same
    // stem) so every within-entity pair is inside the neighbor
    // window; cross-entity stems are distinct hex, far below the
    // threshold. The escalated result must equal the all-pairs result.
    val recs = (0 until 20).flatMap { g =>
      val stem = "du " + java.security.MessageDigest.getInstance("MD5")
        .digest(g.toString.getBytes).map("%02x".format(_)).mkString.take(16)
      Seq((g * 3L, stem), (g * 3L + 1, stem + " inc"), (g * 3L + 2, stem + "s"))
    }.toDF("id", "name")
    val full = EntityResolution.pairs(recs, "id", "name", threshold = 0.94,
        maxBlockSize = 10000) // no escalation: all-pairs within block
      .as[(Long, Long, Long)].collect().toSet
    val escalated = EntityResolution.pairs(recs, "id", "name", threshold = 0.94,
        maxBlockSize = 8, neighborWindow = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(full.nonEmpty && escalated == full,
      s"escalated=${escalated.size} full=${full.size}")
    // id_a < id_b holds on the escalated path too (rank order is name
    // order, not id order — the output must still be normalized)
    assert(escalated.forall { case (a, b, _) => a < b })
    // resolve through the escalated path: 20 entities, min-id labeled
    val got = EntityResolution.resolve(recs, "id", "name", threshold = 0.94,
        maxBlockSize = 8, neighborWindow = 6)
      .as[(Long, Long)].collect().toMap
    (0 until 20).foreach { g =>
      (0 until 3).foreach(v => assert(got(g * 3L + v) == g * 3L, s"g=$g v=$v"))
    }
    // a window too SMALL to span an entity's variants is the
    // documented recall tradeoff — pairs drop, never error
    val tiny = EntityResolution.pairs(recs, "id", "name", threshold = 0.94,
      maxBlockSize = 8, neighborWindow = 1).count()
    assert(tiny < full.size)
  }

  test("pairs carry quantized similarities and id_a < id_b") {
    val recs = Seq((7L, "stark enterprises"), (3L, "stark enterprise"))
      .toDF("id", "name")
    val p = EntityResolution.pairs(recs, "id", "name", threshold = 0.9)
      .as[(Long, Long, Long)].collect().toSeq
    assert(p.size == 1)
    val (a, b, e4) = p.head
    assert(a == 3L && b == 7L)
    assert(e4 == math.floor(jw("stark enterprises", "stark enterprise")
      * 10000 + 0.5).toLong)
  }
}
