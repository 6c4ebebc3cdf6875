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
    // corpus stats as a 1-row frame (computed distributedly)
    val stats = docs.select(
      count(lit(1)).cast("double").as("n"),
      avg(size(Text.tokens(col(textCol))).cast("double")).as("avgdl"))
    // only query terms survive past this filter — everything
    // downstream is |query|-bounded on the term side
    val freqs = docTermFreqs(docs, idCol, textCol)
      .where(col("term").isin(qTerms: _*))
    val df_ = freqs.groupBy(col("term"))
      .agg(countDistinct(col("id")).as("df"))
    val idf: Column =
      log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    freqs
      .join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("id"),
        (idf * (col("tf") * (k1 + 1.0)) /
          (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("_contrib"))
      .groupBy(col("id"))
      .agg(sum(col("_contrib")).as("score"))
      .withColumnRenamed("id", idCol)
  }
}
