package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle transformation (public recipe: Bavarian et al.
  * 2022, "Efficient Training of Language Models to Fill in the
  * Middle") — a document is cut at two offsets and re-emitted in PSM
  * order, `<PRE>prefix<SUF>suffix<MID>middle`, so an autoregressive
  * model learns infilling with no architecture change. The paper's
  * recipe transforms a fixed fraction of the corpus and passes the
  * rest through untouched.
  *
  * Everything here is pure column substring arithmetic — map-only,
  * inside whole-stage codegen, zero shuffles at any scale. The split
  * POLICY is the caller's: [[fim]] takes explicit character offsets
  * (a gate derives them replayably; a tokenizer-aligned caller passes
  * token-boundary offsets), while [[applyFim]] derives them from the
  * row key via md5 — deterministic and re-runnable, though not
  * SQL-replayable cross-engine (hex→int differs), which is why the
  * oracle gate pins [[fim]] itself through arithmetic offsets.
  */
object Fim {

  /** PSM re-encoding of `text` cut at character offsets
    * 0 ≤ a ≤ b ≤ length: prefix = [1,a], middle = (a,b],
    * suffix = (b,len]. */
  def fim(text: Column, a: Column, b: Column,
          pre: String = "<PRE>", suf: String = "<SUF>",
          mid: String = "<MID>"): Column = {
    val n = length(text)
    concat(
      lit(pre), text.substr(lit(1), a),
      lit(suf), text.substr(b + 1, n - b),
      lit(mid), text.substr(a + 1, b - a))
  }

  /** The paper's corpus recipe: a deterministic hash-selected
    * `rate` fraction of documents is FIM-transformed at hash-derived
    * character offsets; the rest pass through. One map-only pass. */
  def applyFim(df: DataFrame, textCol: String, keyCol: String,
               rate: Double = 0.5, salt: String = "fim",
               outCol: String = "fim_text"): DataFrame = {
    val n = length(col(textCol))
    def h(tag: String): Column =
      conv(substring(md5(concat(lit(salt + tag),
        col(keyCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val a = h("a") % (n + 1)
    val b = a + h("b") % (n - a + 1)
    val transform = HexBucket.prefix(col(keyCol), salt, 8)
      .lt(lit(Mixing.rateCut(rate)))
    // a NULL key makes `transform` NULL, which would silently route
    // the row to the untransformed branch at ANY rate — fail fast
    // instead (the capPerDomain/tokenBudget convention)
    df.withColumn(outCol,
      when(col(keyCol).isNull,
        raise_error(lit(s"applyFim: NULL $keyCol — keys must be non-null")))
        .when(transform, fim(col(textCol), a, b))
        .otherwise(col(textCol)))
  }
}
