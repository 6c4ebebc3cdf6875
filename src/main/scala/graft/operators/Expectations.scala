package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality CONTRACTS over a table — the
  * expectation-suite shape every production ingest runs before
  * publishing (the public Great Expectations / dbt-test surface,
  * re-expressed as Spark aggregations): row-level rules (not-null,
  * range, set membership, regex, arbitrary predicate), set-level
  * rules (key uniqueness), and referential rules (foreign key
  * containment), each reported as `(rule, violations, pass)`.
  *
  * Scale shape:
  *  - ALL row rules evaluate in ONE map-side aggregation pass —
  *    k rules = k conditional-sum columns over one scan, no per-rule
  *    jobs;
  *  - uniqueness is a groupBy on the key (one shuffle per key set,
  *    partial-aggregated);
  *  - referential rules are LEFT ANTI joins (AQE broadcasts small
  *    reference sides);
  *  - [[annotate]] is map-only: each row gains the array of rule
  *    names it violates, so quarantine is a filter, not a re-scan
  *    per rule.
  *
  * NULL semantics (documented contract): value rules — [[InRange]],
  * [[OneOf]], [[Matches]] — PASS on NULL; nullability is its own
  * concern ([[NotNull]]), so one missing value doesn't double-count
  * across every rule on the column. [[Predicate]] passes exactly
  * when its expression is TRUE (NULL fails — state the null case in
  * the predicate). Referential rules skip NULL foreign keys (a NULL
  * FK is [[NotNull]]'s job).
  */
object Expectations {

  /** A row-level rule: `passes` must be a deterministic map-side
    * expression. */
  sealed trait RowRule {
    def name: String
    def passes: Column
  }
  final case class NotNull(c: String) extends RowRule {
    val name = s"not_null($c)"
    def passes: Column = col(c).isNotNull
  }
  final case class InRange(c: String, lo: Double, hi: Double) extends RowRule {
    val name = s"in_range($c,$lo,$hi)"
    def passes: Column =
      col(c).isNull || (col(c) >= lit(lo) && col(c) <= lit(hi))
  }
  final case class OneOf(c: String, values: Seq[String]) extends RowRule {
    val name = s"one_of($c)"
    def passes: Column =
      col(c).isNull || col(c).cast("string").isin(values: _*)
  }
  final case class Matches(c: String, regex: String) extends RowRule {
    val name = s"matches($c)"
    def passes: Column = col(c).isNull || col(c).cast("string").rlike(regex)
  }
  /** Escape hatch: any boolean SQL expression; NULL fails. */
  final case class Predicate(name: String, sql: String) extends RowRule {
    def passes: Column = coalesce(expr(sql), lit(false))
  }

  /** One row per rule: `(rule, violations, pass)`, ordered by rule
    * name. `uniqueKeys`: each key set contributes a
    * `unique(k1,k2,…)` rule whose violations count the rows BEYOND
    * the first in every duplicated key group. `refs`:
    * `(fkCol, refTable, refCol)` rules counting non-null foreign
    * keys absent from the reference column. */
  def audit(df: DataFrame, rowRules: Seq[RowRule],
            uniqueKeys: Seq[Seq[String]] = Nil,
            refs: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty || refs.nonEmpty,
      "audit needs at least one rule")
    // the rule groups are independent full-table jobs — submit them
    // CONCURRENTLY (SparkSession actions are thread-safe) so audit
    // wall-clock is ~max(group), not the sum over k groups
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(8, 1 + uniqueKeys.size + refs.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val rowPart: Option[Future[Seq[(String, Long)]]] =
        if (rowRules.isEmpty) None
        else Some(Future {
          val aggs = rowRules.zipWithIndex.map { case (r, i) =>
            sum(when(!r.passes, 1L).otherwise(0L)).as(s"__v$i")
          }
          val one = df.agg(aggs.head, aggs.tail: _*).head
          rowRules.zipWithIndex.map { case (r, i) =>
            (r.name, if (one.isNullAt(i)) 0L else one.getLong(i))
          }
        })
      val uniqParts = uniqueKeys.map { ks => Future {
        val v = df.groupBy(ks.map(col): _*).agg(count(lit(1)).as("__n"))
          .where(col("__n") > 1)
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
          .head.getLong(0)
        Seq((s"unique(${ks.mkString(",")})", v))
      }}
      val refParts = refs.map { case (fk, ref, rc) => Future {
        val v = df.where(col(fk).isNotNull).select(col(fk))
          .join(ref.select(col(rc).as(fk)).distinct(), Seq(fk), "left_anti")
          .count()
        Seq((s"ref($fk->$rc)", v))
      }}
      val verdicts = Await.result(
        Future.sequence(rowPart.toSeq ++ uniqParts ++ refParts),
        scala.concurrent.duration.Duration.Inf).flatten
      verdicts.toDF("rule", "violations")
        .select(col("rule"), col("violations"),
          (col("violations") === 0L).as("pass"))
        .orderBy(asc_nulls_first("rule"))
    } finally { pool.shutdown(); () }
  }

  /** Map-only annotation: adds `violations array<string>` — the
    * row-rule names this row fails (empty = clean). Quarantine is
    * `where(size(col("violations")) > 0)`; the clean publish is the
    * complement. One scan, no joins. */
  def annotate(df: DataFrame, rowRules: Seq[RowRule],
               outCol: String = "violations"): DataFrame = {
    require(rowRules.nonEmpty, "annotate needs at least one row rule")
    df.withColumn(outCol,
      filter(array(rowRules.map(r =>
        when(!r.passes, lit(r.name)).otherwise(lit(null))): _*),
        x => x.isNotNull))
  }
}
