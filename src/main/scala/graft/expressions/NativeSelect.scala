package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native bucketing for the counting-selection family (Ranks ntile,
  * Outliers medians, Sketches grouped multi-rank, Percentiles
  * shards): bucket index = #sampled boundaries ≤ value.
  *
  * The HOF formulation `size(filter(boundsArray, b -> b <= v))` is
  * interpreted per ELEMENT per row — ~64 boxed compares × every row ×
  * every pass over the data — and drops the enclosing projection out
  * of whole-stage codegen (the round-15 ntile decomposition measured
  * the bucketing+assignment HOFs at ~6 s of a 7 s gate). This is the
  * same tight-loop + static-call shape as [[NativeVector]]: one
  * binary search (≤ ⌈log₂ 64⌉ = 6 unboxed compares) per row, bounds
  * ride the generated class as a reference object, and the stage
  * stays codegen'd.
  *
  * Semantics are bit-identical to the HOF form for non-NaN inputs
  * (callers route NULL/NaN to their own buckets before this runs):
  * IEEE `<=` matches SQL `<=` on doubles, including -0.0 ≡ 0.0.
  */
object NativeSelect {

  /** Upper bound: #bounds ≤ v (bounds ascending). */
  def searchSortedEval(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  case class SearchSortedExpr(child: Expression, bounds: Array[Double])
      extends UnaryExpression {
    require(bounds.nonEmpty, "bounds must be non-empty")
    require(bounds.zip(bounds.tail).forall { case (a, b) => a < b },
      "bounds must be strictly ascending")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "search_sorted_native"
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == DoubleType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName needs DOUBLE input, got " +
          child.dataType.simpleString)

    override def nullSafeEval(v: Any): Any =
      java.lang.Integer.valueOf(
        searchSortedEval(v.asInstanceOf[Double], bounds))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("searchSortedBounds", bounds, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.NativeSelect.searchSortedEval($c, $ref);")
    }

    override protected def withNewChildInternal(c: Expression): SearchSortedExpr =
      copy(child = c)
  }

  /** Column entry point; `v` must already be DOUBLE (callers cast —
    * the proxy columns of the counting-selection family already are). */
  def searchSorted(v: Column, bounds: Array[Double]): Column =
    ColumnBridge.column(SearchSortedExpr(ColumnBridge.expression(v), bounds))
}
