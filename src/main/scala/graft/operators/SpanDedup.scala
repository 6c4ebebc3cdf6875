package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.expressions.NativeText
import graft.functions.Text

/** Span-level exact-substring dedup (SURVEY.md north-star extension;
  * the ExactSubstr technique of Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499):
  * any run of ≥ k consecutive tokens whose exact sequence occurs more
  * than once in the corpus — across documents or repeated within one
  * — is located and removed from every occurrence. Unlike the
  * document-level dedup family ([[Dedup]]), this catches boilerplate,
  * licenses, and quoted passages embedded in otherwise-unique
  * documents, which document-level MinHash can never see.
  *
  * The published implementation builds a suffix array over the
  * concatenated corpus — inherently single-machine. The Spark-native
  * shape replaces it with duplicated k-token windows: a token
  * position is part of a duplicated span iff some k-window covering
  * it occurs ≥ 2 times, and maximal duplicated spans are exactly the
  * merged intervals of duplicated windows. Window identity travels
  * as a PAIR of independently-seeded 64-bit chained xxhashes
  * ([[NativeText.wordNgramHashPairsEval]]) — 16-byte shuffle keys no
  * matter how long the gram text is, and the 128-bit width keeps
  * false-duplicate collisions below ~10^-12 corpus-wide even at the
  * 10^13 windows of the 100 TB design point (one 64-bit hash would
  * collide thousands of times there, each cutting legitimate text).
  *
  * Scale shape (100 TB): the window stream is |tokens| rows per
  * document but exists only inside two map→shuffle legs — (1) a
  * partial-aggregated count keyed on the window hash (map-side
  * combine collapses within-partition repeats; duplicated-window
  * counts at web scale are the minority, Lee et al. measure ~3% of
  * tokens), and (2) a semi join of the window stream against the
  * duplicated keys (broadcast when the duplicated set is small, hash
  * shuffle on the 16-byte key otherwise — deliberately NOT a window
  * count over the raw stream, whose per-key partitions would have no
  * partial reduction and a hot boilerplate gram would pin one
  * executor). Island-merging then needs one shuffle keyed on the
  * document id, and the rewrite joins spans back on the same key.
  * Nothing is quadratic; no driver collect anywhere.
  */
object SpanDedup {

  /** Every k-token window of every document as (idCol, pos, gh1,
    * gh2): pos = 0-based index of the window's first token, (gh1,
    * gh2) = two independently-seeded 64-bit window hashes computed in
    * one native pass — a 128-bit identity, because one 64-bit hash is
    * collision-free at fixture scale but NOT at 10^12-10^13 windows
    * (birthday math yields thousands of colliding pairs there, each
    * falsely marking a unique span duplicated and cutting real text).
    * Map-only over the scan. */
  private def windows(docs: DataFrame, k: Int,
                      idCol: String, textCol: String): DataFrame =
    Dedup.fanOut(docs)
      .select(col(idCol), posexplode(
        NativeText.wordNgramHashPairs(Text.tokens(col(textCol)), k)))
      .toDF(idCol, "pos", "g")
      .select(col(idCol), col("pos"),
        col("g.h1").as("gh1"), col("g.h2").as("gh2"))

  /** Maximal duplicated spans per document, in token coordinates:
    * (idCol, span_start, span_end, span_ntok) with `[span_start,
    * span_end)` half-open and span_ntok = span_end − span_start ≥ k.
    * A window is duplicated when its exact k-token sequence occurs ≥
    * `minOccurrences` times corpus-wide (within-document repeats
    * count); overlapping and back-to-back duplicated windows merge
    * into one span (gap rule: a window at pos starts a new island iff
    * pos > prev_pos + k, i.e. its tokens no longer touch the covered
    * prefix). */
  def duplicatedSpans(docs: DataFrame, k: Int, minOccurrences: Int = 2,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(k > 0 && minOccurrences >= 2,
      "need k > 0 and minOccurrences >= 2")
    val wins = windows(docs, k, idCol, textCol)
    val dup = wins.groupBy(col("gh1"), col("gh2"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minOccurrences)
      .select(col("gh1"), col("gh2"))
    val cov = wins.join(dup, Seq("gh1", "gh2"), "left_semi")
      .select(col(idCol), col("pos"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    cov
      .withColumn("brk", when(prev.isNull || col("pos") > prev + k, 1)
        .otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + k).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_ntok"))
  }

  /** Rewrite `docs` with the given spans cut out: (idCol, kept_text,
    * n_removed) where kept_text is the surviving tokens of the
    * normalized (lowercased, whitespace-collapsed) token stream
    * re-joined with single spaces — the same normalization contract
    * as [[Dedup.byFingerprint]] — and n_removed counts the dropped
    * tokens. Documents without spans pass through (n_removed = 0).
    *
    * Spans are collected per document (bounded: ≤ ntokens/k spans can
    * exist per doc) and sorted; because islands are disjoint with a
    * positive gap, sorting starts and ends independently preserves
    * their pairing. The cut itself is one native pass per document
    * ([[NativeText.removeTokenRangesEval]]). */
  def removeSpans(docs: DataFrame, spans: DataFrame,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val byDoc = spans.groupBy(col(idCol)).agg(
      sort_array(collect_list(col("span_start").cast(IntegerType)))
        .as("starts"),
      sort_array(collect_list(col("span_end").cast(IntegerType)))
        .as("ends"))
    val none = array().cast("array<int>")
    docs.join(byDoc, Seq(idCol), "left")
      .withColumn("r", NativeText.removeTokenRanges(
        Text.tokens(col(textCol)),
        coalesce(col("starts"), none), coalesce(col("ends"), none)))
      .select(col(idCol), col("r.kept_text").as("kept_text"),
        col("r.n_removed").as("n_removed"))
  }

  /** [[duplicatedSpans]] + [[removeSpans]]: the full ExactSubstr pass
    * — every duplicated ≥ k-token span removed from every document
    * that carries it. */
  def dedupSpans(docs: DataFrame, k: Int, minOccurrences: Int = 2,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    removeSpans(docs,
      duplicatedSpans(docs, k, minOccurrences, idCol, textCol),
      idCol, textCol)
}
