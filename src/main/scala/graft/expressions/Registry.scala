package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.Text

/** SQL registration for the graft native expressions, so the ad-hoc
  * SQL surface (EP3) can call them directly:
  *
  * {{{
  * SELECT doc_id, graft_simhash64(graft_tokens(text)) FROM documents
  * }}}
  *
  * Two entry points:
  *  - [[Registry.register]] — add to an existing session.
  *  - [[GraftExtensions]] — `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    for cluster-wide injection at session build time.
  */
object Registry {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  /** name → (builder, usage) */
  val functions: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_tokens",
      (es: Seq[Expression]) => NativeText.TokensExpr(es.head),
      "graft_tokens(str) - lowercased whitespace tokens"),
    ("graft_fingerprint",
      (es: Seq[Expression]) => NativeText.FingerprintExpr(es.head),
      "graft_fingerprint(tokens) - 64-bit rolling token fingerprint"),
    ("graft_simhash64",
      (es: Seq[Expression]) => NativeSignatures.SimHash64Expr(es.head),
      "graft_simhash64(tokens) - 64-bit SimHash signature"),
    ("graft_minhash",
      (es: Seq[Expression]) =>
        NativeSignatures.MinHashSigExpr(es.head, intArg(es(1), "graft_minhash")),
      "graft_minhash(shingles, k) - k-component MinHash signature"),
    ("graft_minhash_text",
      (es: Seq[Expression]) =>
        NativeSignatures.MinHashTextExpr(es.head,
          intArg(es(1), "graft_minhash_text"), intArg(es(2), "graft_minhash_text")),
      "graft_minhash_text(str, n, k) - fused char-n-gram MinHash signature"),
    ("graft_char_shingles",
      (es: Seq[Expression]) =>
        NativeSignatures.CharShinglesExpr(es.head, intArg(es(1), "graft_char_shingles")),
      "graft_char_shingles(str, n) - distinct lowercased char n-grams"),
    ("graft_srp_sig",
      (es: Seq[Expression]) =>
        NativeSignatures.SrpSigExpr(es.head, intArg(es(1), "graft_srp_sig")),
      "graft_srp_sig(vec, planes) - signed-random-projection signature"),
    ("graft_char_entropy",
      (es: Seq[Expression]) => NativeText.CharEntropyExpr(es.head),
      "graft_char_entropy(str) - Shannon entropy (bits/char)"),
    ("graft_token_count",
      (es: Seq[Expression]) => NativeText.TokenCountExpr(es.head),
      "graft_token_count(str) - fused whitespace token count"),
    ("graft_fingerprint_text",
      (es: Seq[Expression]) => NativeText.FingerprintTextExpr(es.head),
      "graft_fingerprint_text(str) - fused 64-bit rolling token fingerprint"),
    ("graft_simhash64_text",
      (es: Seq[Expression]) => NativeText.SimHashTextExpr(es.head),
      "graft_simhash64_text(str) - fused 64-bit SimHash signature"),
    ("graft_punct_ratio",
      (es: Seq[Expression]) => NativeText.PunctRatioExpr(es.head),
      "graft_punct_ratio(str) - punctuation chars / total chars"),
    ("graft_lang_id",
      (es: Seq[Expression]) =>
        NativeText.LangScoreTextExpr(es.head, Text.stopwordSets),
      "graft_lang_id(str) - fused best stopword-scored language code"),
    ("graft_parse_mdy",
      (es: Seq[Expression]) => NativeDates.ParseMdyExpr(es.head),
      "graft_parse_mdy(str) - strict m/d/yyyy text to DATE (NULL on junk)"),
    ("graft_format_mdy",
      (es: Seq[Expression]) => NativeDates.FormatMdyExpr(es.head),
      "graft_format_mdy(date) - DATE to MM/dd/yyyy text"),
    ("graft_lang_score",
      (es: Seq[Expression]) =>
        NativeText.LangScoreExpr(es.head, Text.stopwordSets),
      "graft_lang_score(tokens) - best stopword-scored language code"),
    ("graft_cosine",
      (es: Seq[Expression]) => NativeVector.CosineSimExpr(es.head, es(1)),
      "graft_cosine(a, b) - cosine similarity of two float/double vectors"),
    ("graft_intersect_count",
      (es: Seq[Expression]) => NativeText.IntersectCountExpr(es.head, es(1)),
      "graft_intersect_count(a, b) - |a ∩ b| for distinct-element string arrays"),
    ("graft_chunks",
      (es: Seq[Expression]) => NativeText.ChunksExpr(es.head,
        intArg(es(1), "graft_chunks"), intArg(es(2), "graft_chunks")),
      "graft_chunks(str, size, step) - overlapping token-window chunks"),
    ("graft_dup_line_frac",
      (es: Seq[Expression]) => NativeText.DupLineFracExpr(es.head),
      "graft_dup_line_frac(str) - duplicate-line fraction over non-blank lines"),
    ("graft_sig_agree",
      (es: Seq[Expression]) => NativeSignatures.SigAgreeExpr(es.head, es(1)),
      "graft_sig_agree(a, b) - count of agreeing signature components"),
    ("graft_chunks_with_counts",
      (es: Seq[Expression]) => NativeText.ChunksWithCountsExpr(es.head,
        intArg(es(1), "graft_chunks_with_counts"),
        intArg(es(2), "graft_chunks_with_counts")),
      "graft_chunks_with_counts(str, size, step) - chunks with per-window token counts"),
    ("graft_subword_count",
      (es: Seq[Expression]) => NativeText.SubwordCountExpr(es.head),
      "graft_subword_count(tokens) - BPE-ish subword count"),
    ("graft_top_ngram_frac",
      (es: Seq[Expression]) => NativeText.TopNgramFracExpr(es.head,
        intArg(es(1), "graft_top_ngram_frac")),
      "graft_top_ngram_frac(tokens, n) - share of the most frequent n-gram"),
    ("graft_dup_ngram_frac",
      (es: Seq[Expression]) => NativeText.DupNgramFracExpr(es.head,
        intArg(es(1), "graft_dup_ngram_frac")),
      "graft_dup_ngram_frac(tokens, n) - char fraction covered by duplicated n-grams"),
    ("graft_dedup_lines",
      (es: Seq[Expression]) => NativeText.DedupLinesExpr(es.head),
      "graft_dedup_lines(str) - drop repeated non-blank lines; struct<kept_text, n_removed>"),
    ("graft_html_extract",
      (es: Seq[Expression]) => NativeText.HtmlExtractExpr(es.head),
      "graft_html_extract(str) - HTML to text: strip comments/script/style/tags, decode XML entities, normalize whitespace"),
    ("graft_nfc",
      (es: Seq[Expression]) => NativeText.NfcExpr(es.head),
      "graft_nfc(str) - NFC Unicode normalization (canonical composition)"),
    ("graft_clean_text",
      (es: Seq[Expression]) => NativeText.CleanTextExpr(es.head),
      "graft_clean_text(str) - NFC + strip C0/DEL controls (keep \\n \\t) + collapse space/tab runs + trim edge spaces"),
    ("graft_word_ngram_hashes",
      (es: Seq[Expression]) => NativeText.WordNgramHashesExpr(es.head,
        intArg(es(1), "graft_word_ngram_hashes")),
      "graft_word_ngram_hashes(tokens, k) - 64-bit hash of every k-token window, in position order"),
    ("graft_remove_token_ranges",
      (es: Seq[Expression]) =>
        NativeText.RemoveTokenRangesExpr(es.head, es(1), es(2)),
      "graft_remove_token_ranges(tokens, starts, ends) - cut sorted disjoint token ranges; struct<kept_text, n_removed>"),
    ("graft_normalize_url",
      (es: Seq[Expression]) => NativeUrl.NormalizeUrlExpr(es.head),
      "graft_normalize_url(str) - canonical URL: lowercase scheme/host, strip default port/fragment/tracking params, sort query, trim path slashes; NULL on malformed"),
    ("graft_url_host",
      (es: Seq[Expression]) => NativeUrl.UrlHostExpr(es.head),
      "graft_url_host(str) - lowercased URL host (port stripped); NULL on malformed"),
    ("graft_registrable_domain",
      (es: Seq[Expression]) => NativeUrl.RegistrableDomainExpr(es.head),
      "graft_registrable_domain(host) - last 2 labels (3 over multi-part public suffixes)"),
    ("graft_url_path_query",
      (es: Seq[Expression]) => NativeUrl.UrlPathQueryExpr(es.head),
      "graft_url_path_query(str) - path + query ('/a?q=1', fragment dropped, empty path -> '/'); NULL on malformed"),
    ("graft_robots_match",
      (es: Seq[Expression]) => NativeRobots.RobotsMatchExpr(es.head, es(1)),
      "graft_robots_match(pathq, pattern) - RFC 9309 rule match: prefix semantics, '*' wildcard, trailing '$' anchor"),
    ("graft_json_long",
      (es: Seq[Expression]) => es(1) match {
        case Literal(f: org.apache.spark.unsafe.types.UTF8String, _) =>
          NativeJson.JsonGetLongExpr(es.head, f.toString)
        case other => throw new IllegalArgumentException(
          s"graft_json_long expects a string-literal field name, got $other")
      },
      "graft_json_long(doc, field) - top-level integer JSON field or NULL"))

  /** Register all functions on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions`-compatible injector: the SQL function
  * surface plus the graft optimizer rules
  * ([[graft.plans.SemiAntiRightDedup]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.functions.foreach { case (name, builder, usage) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.SemiAntiRightDedup)
  }
}
