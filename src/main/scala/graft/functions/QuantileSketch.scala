package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Mergeable quantile sketch — the 100 TB complement to
  * [[graft.operators.Percentiles]] (which sorts) for monitoring-class
  * percentiles, joining the CMS/Bloom mergeable-sketch family
  * ([[graft.operators.Sketches]]).
  *
  * The sketch is the log-bucketed relative-error design published as
  * DDSketch (Masson, Lee & Rim, VLDB 2019): a value x > 0 lands in
  * bucket ⌈log_γ x⌉ with γ = (1+α)/(1−α), and the bucket's
  * representative value 2γ^i/(γ+1) is within relative error α of
  * every value in the bucket — so any rank query answered from the
  * cumulative bucket counts returns an estimate within α RELATIVE
  * ERROR of the true value at that rank, a hard deterministic
  * guarantee. Negatives mirror into their own bucket store; zeros
  * count exactly.
  *
  * Why this sketch and not KLL/t-digest: merging here is plain
  * bucket-count ADDITION — commutative and associative — so the
  * result is BIT-IDENTICAL under any partitioning, shuffle order, or
  * merge tree (property-tested). KLL's randomized compaction and
  * t-digest's order-sensitive centroid merging both make the estimate
  * depend on partition order, which a distributed aggregation cannot
  * control; their advantage (rank-error independent of the value
  * range) costs determinism the rest of this engine's oracle gating
  * is built on. The price: state is O(log_γ(max/min)) buckets —
  * bounded by the value RANGE (≈ 6,900 buckets at α = 0.01 across
  * ten orders of magnitude), not a fixed k.
  *
  * Scale shape: per-partition sketches partial-aggregate map-side
  * (standard Aggregator contract), one tiny bucket map crosses the
  * exchange per partition, and the driver only ever sees the final
  * k quantile estimates.
  */
object QuantileSketch {

  /** Sketch state: positive/negative bucket counts keyed by
    * ⌈log_γ |x|⌉, plus the exact zero count. MUTABLE — `reduce` runs
    * once per input row on the 100 TB hot path, so it must increment
    * in place, not rebuild a persistent map per row (the Aggregator
    * contract explicitly permits mutating and returning the buffer).
    * Kryo-encoded: the buffer only serializes at partial/final
    * exchange boundaries, never per row. */
  final class DDState extends Serializable {
    val pos = new java.util.HashMap[Integer, java.lang.Long]()
    val neg = new java.util.HashMap[Integer, java.lang.Long]()
    var zero: Long = 0L
    def bump(m: java.util.HashMap[Integer, java.lang.Long], k: Int): Unit =
      m.merge(k, 1L, (a, b) => a + b)
  }

  /** Typed aggregator: `Double` values (nulls skipped) →
    * `qs.size` quantile estimates. */
  class DDQuantilesAgg(alpha: Double, qs: Seq[Double])
      extends Aggregator[java.lang.Double, DDState, Seq[Double]] {
    require(alpha > 0.0 && alpha < 1.0, "alpha in (0, 1)")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    private val gamma = (1 + alpha) / (1 - alpha)
    private val lg = math.log(gamma)

    private def bucketOf(mag: Double): Int =
      math.ceil(math.log(mag) / lg).toInt

    override def zero: DDState = new DDState

    override def reduce(b: DDState, a: java.lang.Double): DDState = {
      if (a == null) return b
      val x = a.doubleValue()
      // non-finite values are skipped like nulls: NaN has no order, and
      // ±Infinity has no log-bucket — bucketOf(Inf) would overflow to
      // Int.MaxValue and silently void the α relative-error guarantee
      // for every rank past it
      if (x.isNaN || x.isInfinite) ()
      else if (x > 0.0) b.bump(b.pos, bucketOf(x))
      else if (x < 0.0) b.bump(b.neg, bucketOf(-x))
      else b.zero += 1L
      b
    }

    override def merge(a: DDState, b: DDState): DDState = {
      b.pos.forEach((k, v) => a.pos.merge(k, v, (x, y) => x + y))
      b.neg.forEach((k, v) => a.neg.merge(k, v, (x, y) => x + y))
      a.zero += b.zero
      a
    }

    override def finish(b: DDState): Seq[Double] = qs.map(quantile(b, _))

    private def total(m: java.util.HashMap[Integer, java.lang.Long]): Long = {
      var s = 0L
      val it = m.values().iterator()
      while (it.hasNext) s += it.next()
      s
    }

    /** Value at rank ⌈q·n⌉ (1-based, ascending — the `quantile_disc`
      * convention), estimated from the cumulative bucket walk:
      * negatives by descending magnitude first, then zeros, then
      * positives by ascending magnitude. Empty input → NaN. */
    private def quantile(b: DDState, q: Double): Double = {
      val n = b.zero + total(b.pos) + total(b.neg)
      if (n == 0L) return Double.NaN
      val rank = math.min(n, math.max(1L, math.ceil(q * n).toLong))
      var cum = 0L
      // negatives: ascending VALUE = descending magnitude = bucket
      // index descending
      val negKeys = b.neg.keySet().toArray(Array.empty[Integer])
        .map(_.intValue()).sorted.reverse
      for (k <- negKeys) {
        cum += b.neg.get(k)
        if (cum >= rank) return -estimate(k)
      }
      cum += b.zero
      if (cum >= rank) return 0.0
      val posKeys = b.pos.keySet().toArray(Array.empty[Integer])
        .map(_.intValue()).sorted
      for (k <- posKeys) {
        cum += b.pos.get(k)
        if (cum >= rank) return estimate(k)
      }
      // unreachable (rank <= n); keep the compiler total
      Double.NaN
    }

    /** Bucket representative: 2γ^i/(γ+1) — within α of every value in
      * (γ^(i−1), γ^i]. */
    private def estimate(k: Int): Double =
      2.0 * math.pow(gamma, k) / (gamma + 1.0)

    override def bufferEncoder: Encoder[DDState] = Encoders.kryo[DDState]
    override def outputEncoder: Encoder[Seq[Double]] = {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      ExpressionEncoder[Seq[Double]]()
    }
  }

  /** Column form: `agg(quantiles($"v", 0.01, Seq(0.5, 0.9)))` →
    * `array<double>` of estimates aligned with `qs`. Nulls and
    * non-finite values (NaN, ±Infinity) contribute nothing — the
    * estimated population is the FINITE values of the column. */
  def quantiles(value: Column, alpha: Double, qs: Seq[Double]): Column =
    functions.udaf(new DDQuantilesAgg(alpha, qs), Encoders.DOUBLE)
      .apply(value.cast("double"))
}
