package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.NativeBpe

/** Byte-pair-encoding TRAINING + application (Sennrich et al. 2016 —
  * the real merge-learning algorithm, not the length/4 "BPE-ish"
  * estimate [[Text.subwordCount]] keeps for cheap scoring).
  *
  * The distributed/driver split is the one every production BPE
  * trainer uses (subword-nmt, SentencePiece, HF tokenizers): the
  * CORPUS pass is one word-count aggregation — map-side-combined,
  * the only stage that scales with data — and merge learning runs
  * over the resulting word-frequency table, which is
  * vocabulary-bounded (capped at `maxVocab` most frequent words;
  * past that cap the tail's influence on merge ranks is noise). Each
  * merge fuses the globally most frequent adjacent symbol pair;
  * ties break lexicographically so training is deterministic.
  *
  * Application is a map-only native expression
  * ([[NativeBpe.BpeSubwordsExpr]]) with the merge-rank table shipped
  * as a codegen reference object. Marker-free: merges never cross
  * token boundaries, so concatenating a token's subwords reproduces
  * the token exactly (the x61 reconstruction audit).
  */
object Bpe {

  final case class BpeModel(merges: Seq[(String, String)])

  def train(corpus: DataFrame, numMerges: Int, maxVocab: Int = 50000,
            textCol: String = "text"): BpeModel = {
    require(numMerges >= 0 && maxVocab > 0, "bad BPE training parameters")
    val wordCounts = graft.operators.Dedup.fanOut(corpus)
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // driver merge learning over the vocabulary-bounded table
    var words: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      val syms = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        syms += w.substring(i, i + n)
        i += n
      }
      (syms.toArray, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // most frequent pair; deterministic lexicographic tie-break
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val fusedSym = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 &&
                  syms(j + 1) == best._2) { out += fusedSym; j += 2 }
              else { out += syms(j); j += 1 }
            }
            (out.toArray, c)
          }
        }
        m += 1
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Session-lifetime model cache (an artifact, like Ivf/Pq/LmScore);
    * the training parameters fold into the key. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, BpeModel]()

  def modelFor(key: String, corpus: => DataFrame, numMerges: Int,
               maxVocab: Int = 50000, textCol: String = "text"): BpeModel =
    cache.computeIfAbsent(s"$key|$numMerges|$maxVocab|$textCol",
      _ => train(corpus, numMerges, maxVocab, textCol))

  /** All subwords of the document's (lowercased whitespace) tokens,
    * in order — map-only native expression. */
  def subwords(str: Column, model: BpeModel): Column =
    NativeBpe.subwords(str, model.merges)

  /** Subword count without materializing the array — fused native
    * counter (the x61 scoring hot path). */
  def subwordCount(str: Column, model: BpeModel): Column =
    NativeBpe.subwordCount(str, model.merges)
}
