package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023, public): score every raw document by how much more
  * likely its hashed-n-gram bag is under a TARGET corpus's
  * distribution than under the raw corpus's own, then sample the
  * training subset with Gumbel-top-k on those importance weights.
  * This is the standard "make 100 TB of crawl look like Wikipedia"
  * selection step of LLM data pipelines.
  *
  * Determinism/oracle contract (the x57/x73/x83 convention): every
  * per-bucket log-likelihood-ratio is quantized to a LONG
  * (`floor(log2 · 1e4 + 0.5)`) BEFORE any per-document sum, so the
  * DuckDB oracle can replay feature hashing, both histograms, the
  * smoothed ratios, the integer sums, and the Gumbel keys exactly.
  *
  * Scale shape: gram explosion is map-side; both feature histograms
  * aggregate to at most `buckets` rows (hex-prefix buckets — 3 hex
  * chars = 4096) and BROADCAST back onto the exploded grams; the only
  * corpus-sized exchange is the per-document weight sum (one groupBy
  * on the id), and selection is a TakeOrdered top-k, never a global
  * sort materialization.
  */
object Dsir {

  private val HexWidth = 3 // 16^3 = 4096 feature buckets
  val Buckets: Int = 1 << (4 * HexWidth)

  /** Exploded (id, bucket) — one row per unigram/bigram instance of
    * the lowercased whitespace tokens (the DSIR paper's feature bag,
    * WITH multiplicity). The tokenize + bigram + md5-bucket chain is
    * ONE fused native pass ([[graft.expressions.NativeText.WordGramBucketsExpr]],
    * bit-identical to `substr(md5(salt || gram), 1, 3)` which the
    * oracle replays) — the naive composition paid an O(tokens²)
    * re-tokenize per bigram (13× the query) and, once fixed, still
    * spent most of the query in per-gram concat+hex materialization.
    * NULL-id rows are dropped up front (they could never be weighted
    * or selected). */
  private def docBuckets(df: DataFrame, idCol: String, textCol: String,
                         salt: String): DataFrame =
    df.where(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        explode(graft.expressions.NativeText.wordGramBuckets(
          graft.functions.Text.tokens(lower(col(textCol))),
          salt + ":", HexWidth)).as("__b"))

  /** Per-bucket quantized log2 likelihood ratio between the target
    * and raw gram distributions, add-1 smoothed over [[Buckets]]:
    * `lr_e4(b) = floor(log2(p_target(b) / p_raw(b)) * 1e4 + 0.5)`.
    * At most [[Buckets]] rows — broadcastable by construction. */
  def bucketLogRatios(raw: DataFrame, target: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      salt: String = "dsir"): DataFrame = {
    val hr = docBuckets(raw, idCol, textCol, salt)
      .groupBy(col("__b")).agg(count(lit(1)).as("cr"))
    val ht = docBuckets(target, idCol, textCol, salt)
      .groupBy(col("__b")).agg(count(lit(1)).as("ct"))
    // pin the ≤buckets-row joined histogram: `tot` and the ratio
    // projection both read it, and without the pin each reference
    // re-tokenizes BOTH corpora (the bucket table is tiny; the
    // lineage behind it is not)
    val joined = hr.join(ht, Seq("__b"), "full_outer")
      .select(col("__b"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
      .localCheckpoint()
    val tot = joined.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    joined.crossJoin(broadcast(tot))
      .select(col("__b").as("bucket"),
        floor(
          (log((col("ct") + 1.0) / (col("tt") + Buckets.toDouble)) -
            log((col("cr") + 1.0) / (col("tr") + Buckets.toDouble))) /
            log(lit(2.0)) * 10000 + 0.5)
          .cast("long").as("logratio_e4"))
  }

  /** Per-document importance weight: the integer sum of its gram
    * instances' quantized bucket log-ratios. Documents with no grams
    * (empty text) weigh 0. Returns `(idCol, weight_e4)`.
    *
    * Pass discipline, MEASURED not assumed: the corpus is touched by
    * exactly two cheap map passes — one feeding the bucket histogram
    * (output ≤4096 rows), one feeding the per-doc weight sum (the
    * single corpus-sized exchange, map-side partial-aggregated). The
    * "obvious" sharing alternative — materialize per-(doc, bucket)
    * counts once and derive both — was measured 1.5× SLOWER at the
    * 50× fixture: grams are mostly unique within a document, so the
    * "compacted" intermediate is corpus-sized and pinning it costs
    * more than the second fused-native map pass it saves. The only
    * pinned frame is the ≤4096-row joined histogram (its lineage
    * would otherwise re-tokenize both corpora for `tot` AND the
    * ratio projection). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        salt: String = "dsir"): DataFrame = {
    val ratios = bucketLogRatios(raw, target, idCol, textCol, salt)
    val w = docBuckets(raw, idCol, textCol, salt)
      .join(broadcast(ratios), col("__b") === ratios("bucket"))
      .groupBy(col("__id"))
      .agg(sum(col("logratio_e4")).as("weight_e4"))
    raw.select(col(idCol)).distinct()
      .join(w, col(idCol) === w("__id"), "left")
      .select(col(idCol),
        coalesce(col("weight_e4"), lit(0L)).as("weight_e4"))
  }

  /** Gumbel-top-k importance resampling: select `k` documents with
    * probability ∝ exp₂(weight) via the Gumbel-max trick, with the
    * noise derived deterministically from an md5 hash of the id (same
    * seed → same sample; the oracle replays it). Returns the selected
    * `(idCol, weight_e4)`. */
  def resample(raw: DataFrame, target: DataFrame, k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               salt: String = "dsir"): DataFrame = {
    require(k > 0, "resample needs k > 0")
    val u = (conv(substring(md5(concat(lit(salt + "g:"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) /
      4294967296.0
    val gumbelE4 = floor(-log(-log(u)) / log(lit(2.0)) * 10000 + 0.5)
      .cast("long")
    importanceWeights(raw, target, idCol, textCol, salt)
      .withColumn("__key", col("weight_e4") + gumbelE4)
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("weight_e4"))
  }
}
