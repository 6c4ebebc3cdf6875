package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distribution-drift detection between two snapshots of a numeric
  * column — the Population Stability Index (PSI), the standard
  * production monitor for "did this ingest batch change shape"
  * (public credit-scoring/ML-monitoring technique; pairs with
  * [[Profile]] for per-column stats and [[graft.catalog.Versioned]]
  * for the two snapshots to compare).
  *
  * PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i), where p/q are the
  * reference/current bucket shares. Buckets are k equal-width cells
  * over the REFERENCE min/max plus underflow/overflow cells (−1 and
  * k), so new out-of-range mass — the classic drift signature — is
  * never silently clamped into an edge bucket. Empty-bucket shares
  * floor at 1e-6 (the standard PSI smoothing) so the log never
  * explodes.
  *
  * Determinism contract (the LmScore convention): each bucket's term
  * is quantized to a LONG — `floor(term · 10⁶ + 0.5)`, non-negative
  * since (p−q) and ln(p/q) always share a sign — BEFORE the total
  * sum, so cross-engine comparison is integer-exact modulo ln's
  * accepted 1-ulp class. Conventional reading: psi_e6 ≤ 100_000
  * (PSI 0.1) stable, 100_000–250_000 moderate, > 250_000 drifted.
  *
  * Scale shape: the reference bounds are one agg (two scalars to the
  * driver); each side is histogrammed by ONE map-side-combined
  * aggregation over a map-only bucket expression; the per-bucket
  * join is k+2 rows. Nothing is corpus-sized after the scans.
  */
object Drift {

  /** Per-bucket comparison frame: (bucket, n_ref, n_cur, term_e6),
    * bucket ∈ [−1, k], every bucket present (zeros kept). */
  def psiByBucket(ref: DataFrame, cur: DataFrame, colName: String,
                  k: Int = 10): DataFrame = {
    require(k >= 2, "need at least 2 buckets")
    val b = ref.agg(min(col(colName)).cast("double"),
      max(col(colName)).cast("double")).head()
    require(!b.isNullAt(0), s"psi($colName): empty/all-NULL reference")
    val mn = b.getDouble(0)
    val mx = b.getDouble(1)
    val width = (mx - mn) / k
    // a constant reference (mn == mx) routes ALL in-range mass to the
    // overflow cell via the v >= mx clause — a point-mass reference
    // has no interior width to bucket into, and the oracle's CASE has
    // the same clause order, so both engines agree
    def bucketOf(v: org.apache.spark.sql.Column) =
      when(v.isNull, lit(null))
        .when(v < mn, lit(-1))
        .when(v >= mx, lit(k))
        .otherwise(floor((v - lit(mn)) / lit(width)).cast("int"))
    def hist(df: DataFrame) = df
      .select(bucketOf(col(colName)).as("bucket"))
      .where(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

    val spark = ref.sparkSession
    import spark.implicits._
    val allBuckets = (-1 to k).toDF("bucket")
    // pinned (k+2 rows): the totals head() below and the caller's
    // consumption are separate jobs — without this both corpus-sized
    // histogram aggregations would run twice
    val joined = allBuckets
      .join(hist(ref).withColumnRenamed("n", "n_ref"), Seq("bucket"), "left")
      .join(hist(cur).withColumnRenamed("n", "n_cur"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .localCheckpoint()
    // shares against each side's total; empty buckets floor at 1e-6
    val totals = joined.agg(sum(col("n_ref")), sum(col("n_cur"))).head()
    val (tr, tc) = (totals.getLong(0).toDouble, totals.getLong(1).toDouble)
    require(tr > 0 && tc > 0, s"psi($colName): a side has no rows")
    val p = greatest(col("n_ref") / lit(tr), lit(1e-6))
    val q = greatest(col("n_cur") / lit(tc), lit(1e-6))
    joined.withColumn("term_e6",
      floor((p - q) * log(p / q) * 1000000 + 0.5).cast(LongType))
  }

  /** The one-row verdict: total psi_e6 plus both row counts. */
  def psi(ref: DataFrame, cur: DataFrame, colName: String,
          k: Int = 10): DataFrame =
    psiByBucket(ref, cur, colName, k)
      .agg(sum(col("term_e6")).cast(LongType).as("psi_e6"),
        sum(col("n_ref")).cast(LongType).as("n_ref"),
        sum(col("n_cur")).cast(LongType).as("n_cur"))
}
