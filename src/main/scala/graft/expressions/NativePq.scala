package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native product-quantization expressions (Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search"): vectors are
  * split into `m` subvectors, each encoded as the index of its
  * nearest entry in a per-subspace codebook — `m` bytes per vector
  * instead of `dim` doubles. Codebooks travel like IVF centroids: a
  * broadcast-small `m × ksub × (dim/m)` reference object inside the
  * expression, so encode and score are both map-only.
  *
  * Scoring is the asymmetric form (query stays exact, candidate is
  * its code words): approx cosine = Σ_m ⟨q_m, book_m[code_m]⟩ /
  * (‖q‖ · storedNorm). The true vector norm is captured at encode
  * time (one double next to the codes), so cosine keeps its exact
  * denominator and only the direction is quantized.
  */
object NativePq {

  @inline private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** codes + true norm in one pass: struct<codes array<byte>, norm
    * double>. Per subspace: squared-L2 argmin over the codebook with
    * the same early-exit + lowest-index tie rule as
    * [[NativeVector.nearestCentroidEval]]. Vectors shorter than
    * m·subDim treat missing elements as 0. */
  def encodeEval(arr: ArrayData, books: Array[Array[Array[Double]]],
                 isFloat: Boolean): InternalRow = {
    val m = books.length
    val codes = new Array[Byte](m)
    val n = arr.numElements()
    var norm2 = 0.0
    var i = 0
    while (i < n) { val x = elem(arr, i, isFloat); norm2 += x * x; i += 1 }
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val sd = if (book.isEmpty) 0 else book(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        var d = 0.0
        var j = 0
        while (j < sd && d < bestD) {
          val x = if (off + j < n) elem(arr, off + j, isFloat) else 0.0
          val diff = x - cv(j)
          d += diff * diff
          j += 1
        }
        if (j == sd && d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best.toByte
      off += sd
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(codes), math.sqrt(norm2)))
  }

  /** Asymmetric cosine: exact query against the candidate's decoded
    * direction, with the candidate's TRUE norm (stored at encode
    * time) in the denominator. Zero-norm guard matches
    * [[NativeVector.cosineEval]]. */
  def adcCosineEval(q: ArrayData, codes: ArrayData, norm: Double,
                    books: Array[Array[Double]], subDim: Int,
                    isFloat: Boolean): Double = {
    val n = q.numElements()
    var qn2 = 0.0
    var i = 0
    while (i < n) { val x = elem(q, i, isFloat); qn2 += x * x; i += 1 }
    // codes from a DIFFERENT codebook set (e.g. lists encoded at one
    // m scored against another) must fail LOUD — truncating or
    // zero-padding would return deflated-but-plausible similarities
    // and silently collapse recall
    val m = books.length / 256
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"PQ code/codebook mismatch: ${codes.numElements()} codes for " +
          s"$m-subspace codebooks — lists were encoded with different books")
    if (qn2 == 0.0 || norm == 0.0) return 0.0
    var dot = 0.0
    var s = 0
    var off = 0
    while (s < m) {
      val cv = books(s * 256 + (codes.getByte(s) & 0xff))
      var j = 0
      while (j < subDim && off + j < n) {
        dot += elem(q, off + j, isFloat) * cv(j)
        j += 1
      }
      off += subDim
      s += 1
    }
    dot / (math.sqrt(qn2) * norm)
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  case class PqEncodeExpr(child: Expression,
                          books: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("codes", ArrayType(ByteType, containsNull = false),
        nullable = false),
      StructField("norm", DoubleType, nullable = false)))
    override def prettyName: String = "pq_encode_native"
    @transient private lazy val isFloat = isFloatArray(child)

    override def nullSafeEval(v: Any): Any =
      encodeEval(v.asInstanceOf[ArrayData], books, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.NativePq.encodeEval($c, $ref, $isFloat);")
    }

    override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
      copy(child = c)
  }

  /** (query vector, codes, stored norm) → approximate cosine. The
    * codebooks flatten to a dense `m·256 × subDim` table at plan time
    * so the per-row lookup is one index computation, no nested-array
    * chasing. */
  case class PqAdcSimExpr(first: Expression, second: Expression,
                          third: Expression,
                          booksNested: Array[Array[Array[Double]]])
      extends TernaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc_sim_native"
    @transient private lazy val isFloat = isFloatArray(first)
    @transient private lazy val subDim: Int =
      booksNested.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
    @transient private lazy val flat: Array[Array[Double]] = {
      val empty = new Array[Double](subDim)
      val out = Array.fill(booksNested.length * 256)(empty)
      for (s <- booksNested.indices; c <- booksNested(s).indices)
        out(s * 256 + c) = booksNested(s)(c)
      out
    }

    override def nullSafeEval(a: Any, b: Any, c: Any): Any =
      adcCosineEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        c.asInstanceOf[Double], flat, subDim, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqFlatBooks", flat, "double[][]")
      nullSafeCodeGen(ctx, ev, (a, b, c) =>
        s"${ev.value} = graft.expressions.NativePq.adcCosineEval($a, $b, $c, $ref, $subDim, $isFloat);")
    }

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): PqAdcSimExpr =
      copy(first = f, second = s, third = t)
  }

  // Column-level entry points
  def encode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec), books))

  def adcSim(q: Column, codes: Column, norm: Column,
             books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcSimExpr(ColumnBridge.expression(q),
      ColumnBridge.expression(codes), ColumnBridge.expression(norm), books))
}
