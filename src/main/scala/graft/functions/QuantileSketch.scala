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
    * ⌈log_γ |x|⌉, plus the exact zero count. */
  final case class DDBuf(pos: Map[Int, Long], neg: Map[Int, Long],
                         zero: Long)

  /** Typed aggregator: `Double` values (nulls skipped) →
    * `qs.size` quantile estimates. */
  class DDQuantilesAgg(alpha: Double, qs: Seq[Double])
      extends Aggregator[java.lang.Double, DDBuf, Seq[Double]] {
    require(alpha > 0.0 && alpha < 1.0, "alpha in (0, 1)")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    private val gamma = (1 + alpha) / (1 - alpha)
    private val lg = math.log(gamma)

    private def bucketOf(mag: Double): Int =
      math.ceil(math.log(mag) / lg).toInt

    override def zero: DDBuf = DDBuf(Map.empty, Map.empty, 0L)

    override def reduce(b: DDBuf, a: java.lang.Double): DDBuf = {
      if (a == null) return b
      val x = a.doubleValue()
      if (x.isNaN) b
      else if (x > 0.0) {
        val k = bucketOf(x)
        b.copy(pos = b.pos.updated(k, b.pos.getOrElse(k, 0L) + 1L))
      } else if (x < 0.0) {
        val k = bucketOf(-x)
        b.copy(neg = b.neg.updated(k, b.neg.getOrElse(k, 0L) + 1L))
      } else b.copy(zero = b.zero + 1L)
    }

    override def merge(a: DDBuf, b: DDBuf): DDBuf = DDBuf(
      addMaps(a.pos, b.pos), addMaps(a.neg, b.neg), a.zero + b.zero)

    private def addMaps(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

    override def finish(b: DDBuf): Seq[Double] = qs.map(quantile(b, _))

    /** Value at rank ⌈q·n⌉ (1-based, ascending — the `quantile_disc`
      * convention), estimated from the cumulative bucket walk:
      * negatives by descending magnitude first, then zeros, then
      * positives by ascending magnitude. Empty input → NaN. */
    private def quantile(b: DDBuf, q: Double): Double = {
      val n = b.zero + b.pos.valuesIterator.sum + b.neg.valuesIterator.sum
      if (n == 0L) return Double.NaN
      val rank = math.min(n, math.max(1L, math.ceil(q * n).toLong))
      var cum = 0L
      // negatives: ascending VALUE = descending magnitude = bucket
      // index descending
      for (k <- b.neg.keys.toSeq.sortBy(-_)) {
        cum += b.neg(k)
        if (cum >= rank) return -estimate(k)
      }
      cum += b.zero
      if (cum >= rank) return 0.0
      for (k <- b.pos.keys.toSeq.sorted) {
        cum += b.pos(k)
        if (cum >= rank) return estimate(k)
      }
      // unreachable (rank <= n); keep the compiler total
      Double.NaN
    }

    /** Bucket representative: 2γ^i/(γ+1) — within α of every value in
      * (γ^(i−1), γ^i]. */
    private def estimate(k: Int): Double =
      2.0 * math.pow(gamma, k) / (gamma + 1.0)

    override def bufferEncoder: Encoder[DDBuf] = Encoders.product[DDBuf]
    override def outputEncoder: Encoder[Seq[Double]] = {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      ExpressionEncoder[Seq[Double]]()
    }
  }

  /** Column form: `agg(quantiles($"v", 0.01, Seq(0.5, 0.9)))` →
    * `array<double>` of estimates aligned with `qs`. */
  def quantiles(value: Column, alpha: Double, qs: Seq[Double]): Column =
    functions.udaf(new DDQuantilesAgg(alpha, qs), Encoders.DOUBLE)
      .apply(value.cast("double"))
}
