package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math (kNN scoring,
  * IVF cluster assignment).
  *
  * The HOF formulations (`zip_with` + `aggregate`) are interpreted
  * per element and force the whole projection out of whole-stage
  * codegen; these run the same double math in a tight JVM loop and
  * generate a single static call, so the enclosing stage stays
  * codegen'd. Crucially, `NearestCentroidExpr` makes IVF assignment
  * map-only: the centroid matrix rides along as a broadcast-style
  * reference object instead of a crossJoin + per-row-id window (which
  * shuffled N·k vector-carrying rows).
  *
  * Accumulation order is sequential left-to-right, matching both the
  * HOF `aggregate` shape and DuckDB's `list_inner_product`, so
  * 4-dp-rounded scores are engine-portable.
  */
object NativeVector {

  // --- static eval helpers (called from generated code) ---

  /** Element read that accepts array<float> or array<double> input
    * (float→double widening is exact). */
  @inline private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  def cosineEval(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // zero-norm guard: a degenerate (all-zero) vector has no direction;
    // define its similarity as 0.0 rather than NaN. NaN would also rank
    // inconsistently across ranking paths (Spark's DESC window sorts
    // NaN first, the TopKAgg tuple Ordering sorts it last).
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Index of the squared-L2-nearest centroid (ties → lowest index). */
  def nearestCentroidEval(arr: ArrayData, cents: Array[Array[Double]],
                          isFloat: Boolean): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(arr.numElements(), cv.length)
      var d = 0.0
      var i = 0
      while (i < n && d < bestD) {
        val diff = elem(arr, i, isFloat) - cv(i)
        d += diff * diff
        i += 1
      }
      if (i == n && d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nprobe` nearest centroid indices, ordered by distance asc
    * (ties → lower index first). nprobe is tiny, so selection is an
    * insertion into a bounded array. */
  def nearestCentroidsEval(arr: ArrayData, cents: Array[Array[Double]],
                           nprobe: Int, isFloat: Boolean): ArrayData = {
    val m = math.min(nprobe, cents.length)
    val ids = new Array[Int](m)
    val ds = Array.fill(m)(Double.PositiveInfinity)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(arr.numElements(), cv.length)
      var d = 0.0
      var i = 0
      while (i < n && d < ds(m - 1)) {
        val diff = elem(arr, i, isFloat) - cv(i)
        d += diff * diff
        i += 1
      }
      if (i == n && d < ds(m - 1)) {
        // insert (d, c) keeping ds sorted; equal distances keep the
        // earlier (lower) centroid index ahead because of strict <
        var p = m - 1
        while (p > 0 && ds(p - 1) > d) { ds(p) = ds(p - 1); ids(p) = ids(p - 1); p -= 1 }
        ds(p) = d
        ids(p) = c
      }
      c += 1
    }
    new GenericArrayData(ids)
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  // --- expressions ---

  /** Cosine similarity of two float/double vectors. */
  case class CosineSimExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim_native"
    @transient private lazy val lf = isFloatArray(left)
    @transient private lazy val rf = isFloatArray(right)

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Double.valueOf(
        cosineEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.NativeVector.cosineEval($a, $b, $lf, $rf);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
      copy(left = l, right = r)
  }

  /** Map-only IVF assignment: argmin squared distance over a
    * driver-held centroid matrix shipped as a codegen reference
    * object. */
  case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    require(centroids.nonEmpty, "centroid matrix must be non-empty")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid_native"
    @transient private lazy val f = isFloatArray(child)

    override def nullSafeEval(v: Any): Any =
      java.lang.Integer.valueOf(
        nearestCentroidEval(v.asInstanceOf[ArrayData], centroids, f))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.NativeVector.nearestCentroidEval($c, $ref, $f);")
    }

    override protected def withNewChildInternal(c: Expression): NearestCentroidExpr =
      copy(child = c)
  }

  /** Top-`nprobe` nearest centroid indices per vector (IVF probe
    * selection without a per-query window shuffle). */
  case class NearestCentroidsExpr(child: Expression,
                                  centroids: Array[Array[Double]], nprobe: Int)
      extends UnaryExpression {
    require(centroids.nonEmpty, "centroid matrix must be non-empty")
    require(nprobe > 0, "nprobe must be positive")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_centroids_native"
    @transient private lazy val f = isFloatArray(child)

    override def nullSafeEval(v: Any): Any =
      nearestCentroidsEval(v.asInstanceOf[ArrayData], centroids, nprobe, f)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.NativeVector.nearestCentroidsEval($c, $ref, $nprobe, $f);")
    }

    override protected def withNewChildInternal(c: Expression): NearestCentroidsExpr =
      copy(child = c)
  }

  // Column-level entry points
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(
      NearestCentroidExpr(ColumnBridge.expression(v), centroids))

  def nearestCentroids(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ColumnBridge.column(
      NearestCentroidsExpr(ColumnBridge.expression(v), centroids, nprobe))
}
