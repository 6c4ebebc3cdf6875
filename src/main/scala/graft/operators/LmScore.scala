package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.NativeText
import graft.functions.Text

/** Statistical language-model quality scoring (SURVEY.md north-star
  * extension; the CCNet-style perplexity filter of Wenzek et al.
  * 2020 — documents whose token stream is improbable under a model
  * trained on trusted text get filtered before training). KenLM's
  * 5-gram model is a single-machine artifact; the distributed
  * re-expression is a bigram LM with add-one (Laplace) smoothing,
  * whose training AND scoring are both plain relational plans:
  *
  *  - train: one pass exploding each document's bigram transitions
  *    ([[NativeText.wordBigramsEval]], WITH multiplicity — the
  *    distinct-per-doc n-gram stream is unusable for counts) into a
  *    partial-aggregated count keyed on the pair; context totals are
  *    a reaggregation of the bigram table (Σ_b c(a,b), the exact MLE
  *    denominator), and V is one distinct-count. The model is three
  *    artifacts whose size is vocabulary-, not corpus-, bounded.
  *  - score: explode the scored documents' bigrams, LEFT join the
  *    bigram and context counts (two hash joins on token-pair/token
  *    keys; unseen pairs fall to the smoothed floor (c+1)/(ctx+V)),
  *    then one groupBy per document.
  *
  * Determinism contract: the per-transition cost is quantized BEFORE
  * the per-document sum — `floor(-ln(p)/ln2 · 10⁴ + 0.5)` as a LONG
  * (half-up, the same explicit formula the oracle replays) — so the
  * document aggregate is an INTEGER sum, immune to the
  * floating-accumulation-order differences that make a cross-engine
  * `ROUND(AVG(...))` flaky at the 4th decimal. `nll_e4 / (10⁴ ·
  * n_bigrams)` is bits-per-token; 2^that is perplexity.
  *
  * 100 TB shape: counting is one map-side-combined shuffle of token
  * pairs; scoring joins the corpus-sized gram stream against
  * vocabulary-sized tables (broadcast when the LM fits, hash join
  * otherwise) and nothing is quadratic. Hashing the string keys to
  * 64-bit (xxhash64) before the joins shrinks that shuffle further
  * when tokens are long — kept as strings here for oracle parity.
  */
object LmScore {

  /** Trained bigram LM: pair counts, context totals, |vocab|. */
  final case class BigramLm(big: DataFrame, ctx: DataFrame, vocabSize: Long)

  private def bigramStream(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    Dedup.fanOut(docs)
      .select(col(idCol),
        explode(NativeText.wordBigrams(Text.tokens(col(textCol)))).as("g"))
      .select(col(idCol), col("g.a").as("a"), col("g.b").as("b"))

  def train(corpus: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): BigramLm = {
    val big = bigramStream(corpus, idCol, textCol)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_big"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    big.count() // materialize the artifact once
    val ctx = big.groupBy(col("a")).agg(sum(col("c_big")).as("c_ctx"))
    val v = Dedup.fanOut(corpus)
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    BigramLm(big, ctx, v)
  }

  /** Session-lifetime model cache (an artifact, like Ivf/Pq). The
    * column names fold into the cache key (the signatureTable
    * precedent) so the same caller key with different columns cannot
    * silently return the wrong model; corpus identity remains the
    * caller's contract, as with every artifact cache here. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, BigramLm]()

  def lmFor(key: String, corpus: => DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): BigramLm =
    cache.computeIfAbsent(s"$key|$idCol|$textCol",
      _ => train(corpus, idCol, textCol))

  /** Release every cached model's persisted bigram table (tests /
    * long-lived sessions swapping corpora). */
  def clearLmCache(): Unit = {
    cache.values.forEach(lm => { lm.big.unpersist(); () })
    cache.clear()
  }

  /** (idCol, nll_e4, n_bigrams) per document with ≥ 1 bigram:
    * nll_e4 = Σ over transitions of floor(−log2 P(b|a) · 10⁴ + 0.5)
    * under add-one smoothing. Lower is more fluent under the model. */
  def scoreBits(docs: DataFrame, lm: BigramLm, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val p = (coalesce(col("c_big"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c_ctx"), lit(0L)) + lit(lm.vocabSize.toDouble))
    val e4 = floor(-log(p) / log(lit(2.0)) * 10000 + 0.5).cast(LongType)
    bigramStream(docs, idCol, textCol)
      .join(lm.big, Seq("a", "b"), "left")
      .join(lm.ctx, Seq("a"), "left")
      .select(col(idCol), e4.as("e4"))
      .groupBy(col(idCol))
      .agg(sum(col("e4")).as("nll_e4"),
        count(lit(1)).as("n_bigrams"))
  }

  /** The filter itself: documents whose bits-per-token EXCEEDS
    * `maxBitsPerToken` are dropped (CCNet keeps the low-perplexity
    * side). Anti-join on the offenders, not semi-join on the
    * passers: a document with fewer than two tokens has no bigram,
    * hence no score row and no evidence of disfluency — it passes
    * through (a semi-join would silently delete every short
    * title/caption regardless of the threshold). */
  def filterFluent(docs: DataFrame, lm: BigramLm, maxBitsPerToken: Double,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val offenders = scoreBits(docs, lm, idCol, textCol)
      .where(col("nll_e4") > col("n_bigrams") * lit(maxBitsPerToken * 10000))
      .select(col(idCol))
    docs.join(offenders, Seq(idCol), "left_anti")
  }
}
