package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight join diagnostics: the report you run BEFORE a 100 TB
  * join, not the post-mortem after it OOMs. For an equi join, the
  * output row count is exactly Σ_k cnt_left(k) · cnt_right(k) — two
  * keys-sized aggregates predict it without executing the join, and
  * the per-key products name the skew offenders that need salting /
  * AQE skew handling.
  *
  * Scale shape: two map-side-combined groupBys (keys-sized outputs),
  * one equi join of those key frames, a global top-k
  * (TakeOrderedAndProject) for the offender list, one 1-row
  * aggregate for the totals. Nothing data-sized ever shuffles.
  *
  * NULL keys: SQL inner-join semantics — NULL never matches, so NULL
  * rows contribute 0 output rows and are excluded (their counts ARE
  * reported by the totals frame, because dropping a billion NULL-key
  * rows silently is itself a finding).
  *
  * Overflow: estimates SATURATE at Long.MaxValue instead of wrapping —
  * the products and their sum are computed in DECIMAL(38,0) and
  * clamped, so a key with ~3e9 rows on each side (exactly the hot key
  * this report exists to flag) reads as "at least 2^63−1", never as a
  * wrapped negative. */
object JoinDiag {

  /** `a · b` in DECIMAL(38,0), clamped to Long.MaxValue, returned as
    * BIGINT — positive saturation, never a wrapped product. */
  private def satProduct(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column) =
    least(lit(Long.MaxValue).cast("decimal(38,0)"),
      a.cast("decimal(19,0)") * b.cast("decimal(19,0)")).cast("long")

  /** Per-key counts for both sides, matched keys only:
    * `(key, n_left, n_right, est_rows)` — the top `topK` by estimated
    * output, tie-broken by key. */
  def explosionTopKeys(left: DataFrame, leftKey: String,
                       right: DataFrame, rightKey: String,
                       topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val la = left.where(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val ra = right.where(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    la.join(ra, Seq("key"))
      .withColumn("est_rows", satProduct(col("n_left"), col("n_right")))
      .orderBy(col("est_rows").desc, col("key").asc)
      .limit(topK)
  }

  /** One-row summary: exact output size of the would-be inner join,
    * matched-key count, the single worst key product, and the
    * NULL-key row counts each side would silently drop. */
  /** Totals over a matched per-key counts frame `(key, n_left,
    * n_right)`. Split out so the saturation arithmetic is testable
    * with synthetic counts no real test corpus can produce.
    *
    * Overflow discipline: each per-key product is clamped to
    * Long.MaxValue BEFORE the sum. A sum of decimal(38,0) that
    * overflows 38 digits either throws (ANSI — Spark 4's default,
    * killing the diagnostics job on exactly the join it exists to
    * flag) or returns NULL (non-ANSI — which an earlier coalesce
    * mapped to 0, the OPPOSITE of saturation). With pre-clamped terms
    * neither can happen: terms are ≤ 2^63−1 < 1e19 and there are at
    * most 2^63−1 keys (count is a long), so the sum is < 8.6e37 —
    * provably within decimal(38,0). Exact below the clamp; any
    * clamped term already forces the final saturation. */
  private[graft] def summarizeMatched(matchedCounts: DataFrame): DataFrame = {
    val satMax = lit(Long.MaxValue).cast("decimal(38,0)")
    val clamped = least(satMax, col("n_left").cast("decimal(19,0)") *
      col("n_right").cast("decimal(19,0)"))
    matchedCounts.agg(
      least(satMax, coalesce(sum(clamped), lit(0).cast("decimal(38,0)")))
        .cast("long").as("est_join_rows"),
      count(lit(1)).as("n_matched_keys"),
      // coalesce INSIDE the least: Spark's least SKIPS nulls, so
      // least(satMax, NULL-from-empty-max) would read Long.MaxValue
      least(satMax, coalesce(max(clamped), lit(0).cast("decimal(38,0)")))
        .cast("long").as("max_key_product"))
  }

  def explosionTotals(left: DataFrame, leftKey: String,
                      right: DataFrame, rightKey: String): DataFrame = {
    val la = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val ra = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    val matched = summarizeMatched(la.where(col("key").isNotNull)
      .join(ra.where(col("key").isNotNull), Seq("key")))
    val nullLeft = left.where(col(leftKey).isNull)
      .agg(count(lit(1)).as("null_key_rows_left"))
    val nullRight = right.where(col(rightKey).isNull)
      .agg(count(lit(1)).as("null_key_rows_right"))
    matched.crossJoin(nullLeft).crossJoin(nullRight)
  }
}
