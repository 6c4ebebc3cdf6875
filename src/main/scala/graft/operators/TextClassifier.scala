package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Text

/** Supervised text-quality classification (SURVEY.md north-star
  * extension; the model-based quality filter every frontier data
  * pipeline runs — GPT-3's LR-against-WebText classifier, LLaMA's
  * fastText filter — as opposed to the UNsupervised perplexity screen
  * in [[LmScore]]). The single-machine artifacts those pipelines use
  * (sklearn LR, fastText) are re-expressed as the classifier whose
  * training and scoring are both plain relational plans: multinomial
  * Naive Bayes with add-one smoothing over the [[Text.tokens]] stream.
  *
  *  - train: one map-side-combined shuffle of (label, token) pairs
  *    into per-label token counts; per-label token totals and doc
  *    priors are reaggregations; V is one distinct-count. The model is
  *    vocabulary-bounded, never corpus-bounded.
  *  - score: each scored document's token stream fans out to the L
  *    candidate labels (L is tiny — the label table is broadcast) and
  *    LEFT-joins the count table on (label, token); unseen tokens fall
  *    to the smoothed floor (c+1)/(n_label+V). One groupBy per
  *    (doc, label), then the per-doc argmin.
  *
  * Determinism contract (the [[LmScore]] convention): every
  * per-token and prior cost is quantized to a LONG —
  * `floor(−log2(p) · 10⁴ + 0.5)` — BEFORE any per-document sum, so
  * aggregates are integer sums immune to float accumulation order,
  * and the argmin tie-breaks on (nll, label) explicitly.
  *
  * 100 TB shape: training shuffles only (label, token) pairs with
  * partial aggregation; scoring joins the corpus token stream against
  * vocabulary-sized tables (broadcast when the model fits, hash join
  * otherwise) and the only fan-out is ×L. Nothing is quadratic and no
  * driver state exists beyond two scalars (V, N).
  */
object TextClassifier {

  /** Trained model: per-(label, token) counts, per-label totals +
    * doc priors, |vocab|, total training docs. */
  final case class NbModel(tokC: DataFrame, labels: DataFrame,
                           vocabSize: Long, nDocs: Long)

  def train(labeled: DataFrame, labelCol: String = "label",
            textCol: String = "text"): NbModel = {
    val toks = Dedup.fanOut(labeled)
      .select(col(labelCol).as("label"),
        explode(Text.tokens(col(textCol))).as("tok"))
    val tokC = toks.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("c_tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tokC.count() // materialize the artifact once
    val labTok = tokC.groupBy(col("label")).agg(sum(col("c_tok")).as("n_tokens"))
    val labDoc = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    // a label whose docs are all empty still has a prior (left + fill)
    val labels = labDoc.join(labTok, Seq("label"), "left")
      .na.fill(0L, Seq("n_tokens"))
    // V and N come from the already-materialized artifacts — counting
    // them off `toks`/`labeled` would re-run the full corpus
    // tokenization a second time (the most expensive training pass)
    val v = tokC.select(col("tok")).distinct().count()
    val n = labels.agg(coalesce(sum(col("n_docs")), lit(0L)))
      .head().getLong(0)
    NbModel(tokC, labels, v, n)
  }

  /** Session-lifetime model cache (the [[LmScore.lmFor]] precedent:
    * column names fold into the key; corpus identity is the caller's
    * contract). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, NbModel]()

  def modelFor(key: String, labeled: => DataFrame,
               labelCol: String = "label",
               textCol: String = "text"): NbModel =
    cache.computeIfAbsent(s"$key|$labelCol|$textCol",
      _ => train(labeled, labelCol, textCol))

  def clearModelCache(): Unit = {
    cache.values.forEach(m => { m.tokC.unpersist(); () })
    cache.clear()
  }

  /** (idCol, label, nll_e4, n_tok) for every document with ≥ 1 token
    * × every label: nll_e4 = prior cost + Σ per-token smoothed cost,
    * each term individually quantized. Lower = more probable. */
  def scoreNll(docs: DataFrame, m: NbModel, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val toks = Dedup.fanOut(docs)
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
    val pTok = (coalesce(col("c_tok"), lit(0L)) + lit(1.0)) /
      (col("n_tokens") + lit(m.vocabSize.toDouble))
    val e4 = floor(-log(pTok) / log(lit(2.0)) * 10000 + 0.5).cast(LongType)
    val priorE4 = floor(-log(col("n_docs") / lit(m.nDocs.toDouble)) /
      log(lit(2.0)) * 10000 + 0.5).cast(LongType)
    toks
      .join(broadcast(m.labels), lit(true)) // ×L fan-out, L tiny
      .join(m.tokC, Seq("label", "tok"), "left")
      .select(col(idCol), col("label"), e4.as("e4"), priorE4.as("prior_e4"))
      .groupBy(col(idCol), col("label"))
      .agg((sum(col("e4")) + first(col("prior_e4"))).as("nll_e4"),
        count(lit(1)).as("n_tok"))
  }

  /** Per-document prediction: the argmin-nll label, tie-broken by
    * label ascending. Documents with zero tokens have no evidence and
    * no row (the [[LmScore.filterFluent]] convention — callers decide
    * a default for them, they are never misclassified silently). */
  def classify(docs: DataFrame, m: NbModel, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    scoreNll(docs, m, idCol, textCol)
      .groupBy(col(idCol))
      .agg(min(struct(col("nll_e4"), col("label"))).as("best"),
        count(lit(1)).as("n_labels"))
      .select(col(idCol), col("best.label").as("pred_label"),
        col("best.nll_e4").as("nll_e4"))

  /** The filter composition: keep documents the model assigns
    * `keepLabel` (plus zero-token documents, which carry no evidence
    * — the anti-join convention of [[LmScore.filterFluent]]). */
  def filterByLabel(docs: DataFrame, m: NbModel, keepLabel: String,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val offenders = classify(docs, m, idCol, textCol)
      .where(col("pred_label") =!= keepLabel)
      .select(col(idCol))
    docs.join(offenders, Seq(idCol), "left_anti")
  }
}
