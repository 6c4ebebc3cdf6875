package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise running sum + count over dense vectors. */
case class VecBuf(sums: Seq[Double], n: Long)

/** Mean-pooling UDAF over an `array<double>` column (embedding
  * centroid per group — mean-of-cluster / class-prototype op).
  *
  * Scale shape: the buffer is one dim-length vector + a count, so
  * map-side partial aggregation reduces each partition to a single
  * row per group before the shuffle — the explode-to-(pos,value)
  * formulation shuffles N·dim rows. Dimension is taken from the first
  * vector seen; mismatched inputs fail fast rather than silently
  * truncating.
  */
class VectorMean extends Aggregator[Seq[Double], VecBuf, Seq[Double]] {

  private def add(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
    require(a.length == b.length,
      s"vector dim mismatch: ${a.length} vs ${b.length}")
    val out = new Array[Double](a.length)
    var i = 0
    while (i < out.length) { out(i) = a(i) + b(i); i += 1 }
    out.toSeq
  }

  override def zero: VecBuf = VecBuf(Seq.empty, 0L)

  override def reduce(b: VecBuf, v: Seq[Double]): VecBuf =
    if (v == null) b
    else if (b.n == 0L) VecBuf(v, 1L)
    else VecBuf(add(b.sums, v), b.n + 1L)

  override def merge(a: VecBuf, b: VecBuf): VecBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else VecBuf(add(a.sums, b.sums), a.n + b.n)

  override def finish(r: VecBuf): Seq[Double] =
    if (r.n == 0L) Seq.empty else r.sums.map(_ / r.n)

  override def bufferEncoder: Encoder[VecBuf] = ExpressionEncoder[VecBuf]()

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Element-wise SUM pooling (no final divide): under cosine the sum
  * vector is the same DIRECTION as the mean, and for integer-valued
  * inputs every element stays an exactly-representable integer —
  * which makes downstream cosine comparisons bit-deterministic across
  * engines and summation orders (integer adds < 2^53 are exact in any
  * order; the mean's divide would reintroduce per-element rounding).
  * Same one-row-per-group map-side partial shape as [[VectorMean]]. */
class VectorSum extends VectorMean {
  override def finish(r: VecBuf): Seq[Double] =
    if (r.n == 0L) Seq.empty else r.sums
}

object VectorAgg {
  /** Column form: `meanVec(col("embedding_as_double"))` →
    * array<double> mean vector. */
  val meanVec: Column => Column = {
    val fn = udaf(new VectorMean, ExpressionEncoder[Seq[Double]]())
    (v: Column) => fn(v)
  }

  /** Column form: element-wise sum vector (the centroid DIRECTION —
    * see [[VectorSum]]). */
  val sumVec: Column => Column = {
    val fn = udaf(new VectorSum, ExpressionEncoder[Seq[Double]]())
    (v: Column) => fn(v)
  }
}
