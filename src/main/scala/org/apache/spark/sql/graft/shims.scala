package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (the Spark
  * 4 Column API hides raw expressions behind ColumnNode). Lives in the
  * spark.sql namespace solely to satisfy the access modifier — the
  * standard pattern for libraries shipping custom Catalyst
  * expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Classify an order-spec Column for operators that need the plain
    * VALUE column behind it (Spark 4 wraps `.asc`/`.desc` in a
    * `private[sql]` SortOrder ColumnNode, not a catalyst expression):
    * Some(value) for a bare column or an ascending-nulls-first sort —
    * the direction struct comparison and `filter(x <= v)` bucketing
    * agree with — None for any other direction. */
  def ascNullsFirstValue(c: Column): Option[Column] = {
    import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder}
    c.node match {
      case so: NodeSortOrder
          if so.sortDirection == NodeSortOrder.Ascending &&
            so.nullOrdering == NodeSortOrder.NullsFirst =>
        Some(Column(so.child))
      case _: NodeSortOrder => None
      case _ => Some(c)
    }
  }
}
