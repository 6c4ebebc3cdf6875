package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimension-decode operator (SURVEY.md §2.5 D1–D15).
  *
  * The reference's signature computation: for a coded column, emit the
  * distinct non-null codes with a label decoded through an inline
  * `CASE` map, ordered by code
  * (`SELECT DISTINCT(col), CASE ... END AS name FROM t WHERE col IS
  * NOT NULL ORDER BY col`, e.g. `export_svg.py:275-293`).
  *
  * Scale notes: `distinct()` on a single low-cardinality column is a
  * partial-aggregate shuffle of just that column (map-side combine
  * collapses each partition to ≤|codes| rows before the exchange), so
  * this holds at 100 TB. The decode itself is a literal `CASE WHEN`
  * chain — constant-folded, whole-stage-codegen'd, no join, no
  * broadcast needed.
  */
object Dims {

  /** Chained `when` with NO `otherwise`: unmatched keys fall through
    * to NULL, preserving the reference's CASE-without-ELSE semantics
    * (`export_svg.py:290,544`). */
  def decode(c: Column, mapping: Seq[(Any, String)]): Column = {
    require(mapping.nonEmpty, "decode needs at least one mapping entry")
    mapping.tail.foldLeft(when(c === lit(mapping.head._1), lit(mapping.head._2))) {
      case (acc, (k, v)) => acc.when(c === lit(k), lit(v))
    }
  }

  /** Build one dimension table from a fact column. */
  def buildDim(fact: DataFrame, codeCol: String, labelCol: String,
               mapping: Seq[(Any, String)]): DataFrame =
    fact
      .select(col(codeCol))
      .where(col(codeCol).isNotNull)
      .distinct()
      .withColumn(labelCol, decode(col(codeCol), mapping))
      .orderBy(asc_nulls_first(codeCol))
}
