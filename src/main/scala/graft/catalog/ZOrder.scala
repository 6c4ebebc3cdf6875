package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering — the multi-dimensional
  * layout technique behind Delta/Iceberg `OPTIMIZE ZORDER BY` (public
  * technique; Morton 1966). Sorting a table by ONE key gives perfect
  * min/max pruning on that key and none on any other; interleaving
  * the bits of TWO keys' bucket ranks gives a single sort key whose
  * contiguous ranges are small rectangles in (x, y) space — so
  * parquet footer min/max stats prune files for predicates on EITHER
  * dimension (or both). At 100 TB this is the difference between a
  * selective two-column query reading every file and reading a few
  * percent.
  *
  * Determinism contract: buckets are
  * `least(floor(double(c - mn) · 2^bits / (mx - mn + 1)), 2^bits - 1)`
  * — the multiply-then-divide order is fixed and both engines do
  * IEEE-754 round-to-nearest per op, so an oracle replaying the same
  * expression agrees bit-for-bit; the LEAST cap absorbs the one
  * boundary case where the quotient rounds up to 2^bits. Inputs must
  * satisfy (mx − mn) · 2^bits < 2^53 (exact double products).
  *
  * Layout writing is `repartitionByRange` on the z-value + an
  * in-partition sort: range partitioning puts disjoint z-ranges in
  * disjoint files (the pruning guarantee); the local sort tightens
  * row-group stats inside each file.
  */
object ZOrder {

  /** Exact integer bucket of `c` into [0, 2^bits). */
  def bucket(c: Column, mn: Long, mx: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 20, "bits must be in 1..20")
    val scale = 1L << bits
    require(mx >= mn, "empty range")
    require((mx - mn) <= (1L << 52) / scale, "range too wide for exact doubles")
    least(
      floor((c - lit(mn)).cast("double") * lit(scale.toDouble) /
        lit((mx - mn + 1).toDouble)),
      lit(scale - 1L)).cast("long")
  }

  /** Morton interleave of two bucket ranks: bit k of `bx` lands at
    * position 2k, bit k of `by` at 2k+1. Pure codegen'd column
    * arithmetic — no UDF, stays inside whole-stage codegen. */
  def interleave2(bx: Column, by: Column, bits: Int): Column =
    interleaveN(Seq(bx, by), bits)

  /** N-dimensional Morton interleave: bit k of dimension d lands at
    * position k·N + d. Total bits must fit a signed LONG. */
  def interleaveN(bs: Seq[Column], bits: Int): Column = {
    require(bs.nonEmpty, "interleaveN needs at least one dimension")
    require(bs.size * bits <= 63,
      s"${bs.size} dims x $bits bits exceeds a signed LONG")
    val n = bs.size
    (for (k <- 0 until bits; (b, d) <- bs.zipWithIndex) yield
      shiftright(b, k).bitwiseAND(lit(1L)) * lit(1L << (k * n + d)))
      .reduce(_ + _)
  }

  /** The z-value of two numeric columns, bounds computed in one scan
    * (two scalars to the driver — bounded, the Ivf-centroid
    * precedent). */
  def zValue(df: DataFrame, xCol: String, yCol: String,
             bits: Int = 16): Column = {
    val r = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"zValue($xCol, $yCol): empty input or all-NULL key column — " +
        "no bounds to bucket against")
    interleave2(
      bucket(col(xCol), r.getLong(0), r.getLong(1), bits),
      bucket(col(yCol), r.getLong(2), r.getLong(3), bits), bits)
  }

  /** Rewrite `df` as a z-clustered parquet layout: range-partitioned
    * by z (disjoint z-ranges → disjoint files) and locally sorted
    * (tight row-group stats). The z column itself is layout, not
    * data — it is dropped from the written schema. */
  def write(df: DataFrame, xCol: String, yCol: String, dir: String,
            numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(df, xCol, yCol, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
