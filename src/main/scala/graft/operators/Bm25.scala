package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Lexical relevance scoring (SURVEY.md north-star extension): BM25
  * and TF-IDF over the corpus, the standard tools for query-driven
  * corpus curation — "pull the documents most relevant to these
  * probe queries" (targeted decontamination, topical subsetting,
  * quality-weighted sampling).
  *
  * Scale design: tokenize → explode is map-only; per-(doc, term)
  * term frequencies are one shuffle bounded by corpus token count;
  * document frequencies aggregate per term (bounded by vocabulary).
  * For [[score]], the query-term filter is applied BEFORE any join,
  * so the idf table the docs join against is |query| rows —
  * broadcast, never a vocabulary-sized shuffle. Corpus statistics
  * (N, avgdl) are computed distributedly and ride in as a literal
  * 1-row cross join, not a driver collect of data rows.
  *
  * Tokenization is [[Text.tokens]] (lowercase, split on whitespace,
  * drop empties) — the same stream as x15/x43, so a SQL oracle
  * replays scores term-for-term.
  */
object Bm25 {

  /** (id, term, tf, dl): term frequency and document length per
    * document term. dl counts ALL tokens (including duplicates). */
  def docTermFreqs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("_toks"))
    toks.select(col("id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
      .groupBy(col("id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Smoothed TF-IDF per (doc, term): tf · (ln((N+1)/(df+1)) + 1).
    * N and df are corpus-wide; the idf join is keyed on the term. */
  def tfidf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val freqs = docTermFreqs(docs, idCol, textCol)
    val n = docs.select(count(lit(1)).as("n"))
    val df_ = freqs.groupBy(col("term"))
      .agg(countDistinct(col("id")).as("df"))
    freqs.join(df_, Seq("term")).crossJoin(broadcast(n))
      .select(col("id").as(idCol), col("term"), col("tf"),
        (col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0))
          .as("tfidf"))
  }

  /** BM25 relevance of every document containing at least one query
    * term (Robertson/Sparck-Jones idf, the Okapi formulation):
    *
    *   score(d) = Σ_t∈q idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * N and avgdl cover the WHOLE corpus (zero-token docs included —
    * they can never match, but they dilute avgdl as BM25 specifies).
    * Duplicate query terms are counted once. */
  def score(docs: DataFrame, query: Seq[String],
            k1: Double = 1.2, b: Double = 0.75,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val qTerms = query.map(_.toLowerCase).distinct
    // Per-doc term frequencies MAP-ONLY: for a |q|-term query, tf(t)
    // is an occurrence count inside the doc's own token array — no
    // reason to explode the whole corpus into (doc, term) rows and
    // shuffle every token by key (the docTermFreqs shape is for
    // vocabulary-wide outputs like tfidf, not |q|-bounded scoring).
    // This halved-then-some the sf1 gate cost and is the 100 TB
    // shape: two map-only scans (stats + scoring) and a 1-row
    // broadcast, zero token-level exchanges.
    // localCheckpoint: both the stats pass and the scoring pass read
    // this frame — materializing it tokenizes the corpus ONCE. The
    // artifact is compact (id + |q|+1 doubles per doc), the same
    // per-doc score table you'd persist in a real curation run.
    val perDoc = docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("_toks"))
      .select(
        col("id") +: size(col("_toks")).cast("double").as("dl") +:
          qTerms.zipWithIndex.map { case (t, i) =>
            size(filter(col("_toks"), x => x === lit(t)))
              .cast("double").as(s"_tf$i")
          }: _*)
      .localCheckpoint()
    // one aggregation over the corpus: N, avgdl (zero-token docs
    // included — they never match but dilute avgdl as BM25
    // specifies), and df per query term
    val statAggs =
      count(lit(1)).cast("double").as("n") +: avg(col("dl")).as("avgdl") +:
        qTerms.indices.map(i =>
          sum((col(s"_tf$i") > 0).cast("double")).as(s"_df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    // a term with tf = 0 contributes exactly 0 (zero numerator), so
    // summing over ALL query terms per doc equals the sum over the
    // doc's matching terms; the final filter keeps only docs that
    // match at least one term, as before
    def contrib(i: Int): Column = {
      val idf = log(lit(1.0) +
        (col("n") - col(s"_df$i") + 0.5) / (col(s"_df$i") + 0.5))
      idf * (col(s"_tf$i") * (k1 + 1.0)) /
        (col(s"_tf$i") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    perDoc.crossJoin(broadcast(stats))
      .where(qTerms.indices.map(i => col(s"_tf$i") > 0).reduce(_ || _))
      .select(col("id").as(idCol),
        qTerms.indices.map(contrib).reduce(_ + _).as("score"))
  }
}
