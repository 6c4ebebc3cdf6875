package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic experiment analysis: hash-based variant assignment
  * (the [[Splits]] md5 machinery — a unit's variant never changes
  * when other units enroll, and any engine can re-derive the
  * assignment) plus the two-proportion readout with a pooled z-score
  * (standard A/B arithmetic — Fisher 1935 lineage, public).
  *
  * Determinism contract: every statistic derives from INTEGER counts
  * through IEEE-exact ops (divide, sqrt are correctly rounded), so
  * two engines replaying the same arithmetic agree bit-for-bit; the
  * one discretionary step — final display quantization — uses the
  * explicit half-up formula, never an engine's round() builtin.
  *
  * Scale shape: assignment is map-only (a column expression);
  * the readout is one map-side-combined aggregate over units —
  * 2 rows out. The z-score joins the two variant rows: a 1×1
  * broadcast. */
object Experiment {

  /** Per-unit variant assignment column — [[Splits.splitCol]] with
    * experiment-name salting. */
  def variantCol(unit: org.apache.spark.sql.Column,
                 variants: Seq[(String, Double)], salt: String) =
    Splits.splitCol(unit, variants, salt)

  /** Per-variant conversion readout over a UNIT-GRAIN frame
    * (one row per unit, `convertedCol` boolean):
    * `(variant, n_units, n_converted, conv_rate)` — rate half-up to
    * 4 decimals. */
  def readout(units: DataFrame, unitCol: String,
              variants: Seq[(String, Double)], salt: String,
              convertedCol: String): DataFrame =
    units
      .withColumn("variant", variantCol(col(unitCol), variants, salt))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_units"),
        sum(when(col(convertedCol), 1L).otherwise(0L)).as("n_converted"))
      .withColumn("conv_rate",
        floor(col("n_converted").cast("double") / col("n_units") * 10000
          + lit(0.5)) / 10000)

  /** Two-variant significance: pooled two-proportion z-score between
    * `a` and `b` (must both exist in the readout). One output row:
    * counts, rates, z (half-up 4 decimals), and the |z| > 1.96
    * verdict (95% two-sided). Degenerate pools (rate 0 or 1 on both
    * arms → zero variance) yield z = 0: no evidence of a difference
    * is the correct readout for identical-constant arms. */
  def zTest(readout: DataFrame, a: String, b: String): DataFrame = {
    def side(v: String, tag: String) = readout
      .where(col("variant") === v)
      .select(col("n_units").as(s"n_$tag"),
        col("n_converted").as(s"c_$tag"))
    val j = side(a, "a").crossJoin(side(b, "b"))
    val pa = col("c_a").cast("double") / col("n_a")
    val pb = col("c_b").cast("double") / col("n_b")
    val pool = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    val z = when(se > 0, (pa - pb) / se).otherwise(lit(0.0))
    j.select(
      lit(a).as("variant_a"), lit(b).as("variant_b"),
      col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      (floor(pa * 10000 + lit(0.5)) / 10000).as("rate_a"),
      (floor(pb * 10000 + lit(0.5)) / 10000).as("rate_b"),
      (floor(z * 10000 + lit(0.5)) / 10000).as("z"),
      (abs(z) > lit(1.96)).as("significant_95"))
  }
}
