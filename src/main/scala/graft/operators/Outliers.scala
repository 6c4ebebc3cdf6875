package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation) z-scores — the estimator that survives the outliers it
  * is hunting (mean/stddev is dragged by the very tail it flags;
  * median/MAD has a 50% breakdown point — Hampel 1974, public).
  *
  * A value is flagged when |v − median| > k · 1.4826 · MAD (1.4826 =
  * 1/Φ⁻¹(3/4) makes MAD a consistent σ estimate under normality, so
  * k compares to the familiar "k sigmas").
  *
  * Exactness contract: medians are DISCRETE (the value at in-group
  * rank ⌈n/2⌉ — an actual data value, never an interpolation), so
  * every number here is reproducible bit-for-bit by any engine
  * sorting the same doubles — interpolation formulas differ across
  * engines in the last ulp; rank selection cannot.
  *
  * Scale shape — TWO-PASS FILTER-BY-VALUE selection (the x98-audit
  * recipe), not a rank of the whole table: each median costs one
  * bucket-histogram aggregate (values bucketed by sampled global
  * boundaries, map-only arithmetic) plus a sort of ONLY the target
  * bucket (≈ n_group / nBuckets rows — one task per group sized by
  * the bucket, not the group). The first shipped form ranked the
  * full table twice through data-sized localCheckpoints; counting
  * selection removed both materializations (measured: 25.0 s →
  * rank-free at sf1). Exactness does not depend on the sampled
  * boundary quality — boundaries only size the buckets; the selected
  * value is exact for ANY bucketing because equal values share a
  * bucket and ranks are recovered from exact bucket counts.
  *
  * Known degeneracy (inherent to MAD, documented not hidden): a
  * group where more than half the values are identical has MAD = 0,
  * and every non-median value gets flagged; callers gate on `mad >
  * 0` if that is not the intent.
  */
object Outliers {

  /** Per-group robust summary: `(groupCol, n_vals, med, mad,
    * n_outliers)`. NULL/NaN/±Inf values are excluded from ranks AND
    * from the outlier count (they are data-quality findings, not
    * distributional outliers — x99's expectation rules own them).
    * NULL groups audit like any other (struct-wrapped key).
    *
    * @param nBuckets histogram resolution for the two-pass selection:
    *   the per-group sort task handles ≈ n_group / nBuckets rows —
    *   size it so that fits one task at your scale. */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  k: Double = 3.0, nBuckets: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val thrFactor = k * 1.4826
    val v = col(valCol).cast("double")
    val nn = df.where(v.isNotNull && !isnan(v) &&
        v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity)
      .select(struct(col(groupCol)).as("__g"), v.as("__v"))

    // ONE boundary sample serves both selections (round 15): the MAD
    // pass's boundaries are derived driver-side by folding the value
    // boundaries around each group's median (|b − med_g| is exactly
    // the image of the value grid under the deviation transform), so
    // the second approxQuantile pass — measured 1.27 s warm at sf0.1,
    // the operator's single largest job because it also re-executed
    // the lazy median subtree to fill a data-sized persist — is gone,
    // and with it the persist: devs is map-only (scan + one broadcast
    // join + abs) and cheaper to recompute per pass than to cache.
    // Boundary quality still cannot affect the result (equal values
    // share a bucket; ranks come from exact counts).
    val bounds = sampleBounds(nn, nBuckets)
    val med = selectAtTargetRank(nn, "med", bounds)
    // med is one row per group — the SAME executor-memory bound the
    // broadcast join below already imposes; collecting it makes it a
    // LocalRelation so the three downstream passes (dev histogram,
    // MAD selection, final aggregate) reuse the values instead of
    // re-executing the median's histogram+selection subtree each.
    val spark = df.sparkSession
    val medRows = med.collect()
    val medDf = spark.createDataFrame(
      java.util.Arrays.asList(medRows: _*), med.schema)
    val meds = medRows.map(_.getDouble(1))
    val devBounds = foldBounds(bounds, meds, nBuckets)
    val devs = nn.join(broadcast(medDf), Seq("__g"))
      .withColumn("__dev", abs(col("__v") - col("med")))
    val mad = selectAtTargetRank(
      devs.select(col("__g"), col("__dev").as("__v")), "mad", devBounds)
    devs.join(broadcast(mad), Seq("__g"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_vals"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(thrFactor) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("__g").getField(groupCol).as(groupCol),
        col("n_vals"), col("med"), col("mad"), col("n_outliers"))
  }

  /** Sampled global bucket boundaries for counting selection — one
    * approxQuantile pass, deduped and sorted. */
  private def sampleBounds(vals: DataFrame, nBuckets: Int): Array[Double] =
    vals.stat.approxQuantile("__v", (1 until nBuckets)
      .map(_.toDouble / nBuckets).toArray, 0.001)
      .distinct.sorted

  /** Deviation-pass boundaries derived WITHOUT a second data pass:
    * fold the value grid around every group median (each |b − m| is a
    * real deviation-space landmark), dedup, sort, and thin to
    * ≤ nBuckets−1 evenly-strided entries so the literal stays small
    * whatever the group count. Boundaries only size buckets — any
    * grid is exact — so thinning trades per-task bucket size, never
    * correctness. */
  private def foldBounds(bounds: Array[Double], meds: Array[Double],
                         nBuckets: Int): Array[Double] = {
    // cap the driver-side cross product for very many groups: a
    // deterministic stride over the sorted medians keeps landmarks
    // spread across the median range
    val medsCapped =
      if (meds.length <= 1024) meds.sorted
      else {
        val s = meds.sorted
        val stride = s.length / 1024
        (0 until 1024).map(i => s(i * stride)).toArray
      }
    val folded = (for (m <- medsCapped; b <- bounds) yield math.abs(b - m))
      .distinct.sorted
    if (folded.length <= nBuckets - 1) folded
    else {
      val stride = folded.length.toDouble / (nBuckets - 1)
      (0 until nBuckets - 1).map(i => folded((i * stride).toInt))
        .toArray.distinct.sorted
    }
  }

  /** Value at in-group rank ⌈n/2⌉ (the lower median) per group over
    * a `(__g, __v)` frame, by counting selection:
    *
    *  1. bucket every value by the caller's global boundaries
    *     (map-only; callers pass a sampled or derived grid);
    *  2. exact (group, bucket) counts → per group, the bucket
    *     containing rank ⌈n_g/2⌉ and the count of rows before it
    *     (a groups × buckets frame — never data-sized);
    *  3. keep only each group's target bucket and take the row at
    *     local rank (target − preceding), via a window whose
    *     partition holds one BUCKET of one group.
    *
    * Sampled boundaries size the buckets but cannot affect the
    * result: equal values always share a bucket, and the rank
    * arithmetic uses exact counts. */
  private def selectAtTargetRank(vals: DataFrame, outCol: String,
                                 bounds: Array[Double]): DataFrame = {
    // native binary-search bucketing (NativeSelect scaladoc): the
    // HOF filter-count was interpreted per element per row
    val bucketed = vals.withColumn("__b",
      if (bounds.isEmpty) lit(0)
      else graft.expressions.NativeSelect.searchSorted(col("__v"), bounds))
    val wG = Window.partitionBy(col("__g")).orderBy(col("__b"))
    val targets = bucketed.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__before", coalesce(
        sum(col("__c")).over(wG.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__g"))))
      .withColumn("__target", ceil(col("__n") / lit(2.0)).cast("long"))
      .where(col("__target") > col("__before") &&
        col("__target") <= col("__before") + col("__c"))
      .select(col("__g"), col("__b"), (col("__target") - col("__before"))
        .as("__lrank"))
    // targets is ≤ one row per group — broadcast keeps the data side
    // map-only (a shuffle join here would sort the whole table to
    // discard all but one bucket per group)
    bucketed.join(broadcast(targets), Seq("__g", "__b"))
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))))
      .where(col("__lrn") === col("__lrank"))
      .select(col("__g"), col("__v").as(outCol))
  }
}
