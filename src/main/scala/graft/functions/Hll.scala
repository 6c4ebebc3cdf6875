package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions
import org.apache.spark.sql.types.{DataType, LongType}

/** STORABLE HyperLogLog distinct-count sketches (Flajolet et al.
  * 2007, with the 64-bit-hash simplification of Heule et al. 2013:
  * linear counting below the small-range threshold, no large-range
  * correction needed at 64 bits).
  *
  * Spark's built-in `approx_count_distinct` answers one query and
  * throws its state away; warehouse pipelines need the SKETCH ITSELF
  * as a column — per-day/per-source register blobs stored in
  * parquet, merged across arbitrary slices later without re-scanning
  * the raw data (the "pre-aggregate once, roll up forever" pattern).
  * This module provides exactly that: [[sketch]] aggregates values
  * into a register blob, [[merge]] aggregates blobs into a blob, and
  * [[cardinality]] reads an estimate off a blob.
  *
  * Determinism: values hash with `xxhash64` (Spark's own
  * deterministic 64-bit hash, seed 42), and both aggregation steps
  * are register-wise MAX — commutative and associative, so sketches
  * and estimates are BIT-IDENTICAL under any partitioning or merge
  * tree, like the rest of the sketch family. NULLs contribute
  * nothing.
  *
  * Accuracy: `p` index bits → 2^p single-byte registers; standard
  * error ≈ 1.04/√(2^p) (p = 12 → 4 KiB blob, ~1.6%).
  *
  * Scale shape: per-partition register blobs partial-aggregate
  * map-side; one 2^p-byte array per partition crosses the exchange;
  * stored sketches are ordinary BINARY columns.
  */
object Hll {

  private[graft] def registers(p: Int) = 1 << p

  /** ρ(w): position of the leftmost 1-bit of the (64−p)-bit suffix,
    * in 1..64−p+1. */
  private def updateBuf(buf: Array[Byte], hash: Long, p: Int): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val suffix = hash << p
    val rho = (if (suffix == 0L) 64 - p else
      java.lang.Long.numberOfLeadingZeros(suffix)) + 1
    if (rho > (buf(idx) & 0xff)) buf(idx) = rho.toByte
  }

  def estimate(buf: Array[Byte]): Long = {
    val m = buf.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buf(i) & 0xff
      sum += 1.0 / (1L << r).toDouble
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  /** Aggregator: hashed values (xxhash64 longs, null = skipped) →
    * the 2^p-byte register blob. */
  class SketchAgg(p: Int) extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 16, "p in 4..16 (16 B .. 64 KiB per sketch)")
    override def zero: Array[Byte] = new Array[Byte](registers(p))
    override def reduce(b: Array[Byte], a: java.lang.Long): Array[Byte] = {
      if (a != null) updateBuf(b, a.longValue(), p)
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) {
        if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
        i += 1
      }
      a
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregator: stored register blobs → their union blob (NULL
    * blobs skipped; mixed sizes rejected — sketches only merge with
    * the same p). */
  class MergeAgg(p: Int) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 16, "p in 4..16")
    override def zero: Array[Byte] = new Array[Byte](registers(p))
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = {
      if (a == null) return b
      require(a.length == b.length,
        s"cannot merge HLL sketches of different precision: " +
          s"${a.length} vs ${b.length} registers")
      var i = 0
      while (i < b.length) {
        if ((a(i) & 0xff) > (b(i) & 0xff)) b(i) = a(i)
        i += 1
      }
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      reduce(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a sketch of `value`'s distinct values:
    * `groupBy(day).agg(Hll.sketch($"user_id"))` → BINARY. */
  def sketch(value: Column, p: Int = 12): Column =
    functions.udaf(new SketchAgg(p), Encoders.LONG)
      // xxhash64(NULL) is the SEED, not NULL — guard so missing
      // values contribute nothing to the sketch
      .apply(functions.when(value.isNull,
          functions.lit(null).cast("long"))
        .otherwise(functions.xxhash64(value)))

  /** Union stored sketches: `agg(Hll.merge($"user_sketch"))`. */
  def merge(sketchCol: Column, p: Int = 12): Column =
    functions.udaf(new MergeAgg(p), Encoders.BINARY).apply(sketchCol)

  /** Register-blob → estimate, as a NATIVE codegen'd expression (no
    * closure UDF — the engine-wide invariant). */
  case class HllCardinalityExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "hll_cardinality_native"

    override def nullSafeEval(v: Any): Any =
      estimate(v.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Hll.estimate($c);")

    override protected def withNewChildInternal(c: Expression): HllCardinalityExpr =
      copy(child = c)
  }

  /** Estimate a blob's distinct count — usable per row on a stored
    * sketch column. */
  def cardinality(sketchCol: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(HllCardinalityExpr(ColumnBridge.expression(sketchCol)))
  }
}
