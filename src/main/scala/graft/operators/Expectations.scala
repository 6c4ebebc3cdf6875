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
  *  - the audit is ONE lazy plan → ONE action: rule groups are union
  *    branches whose stages run concurrently in a single job (no
  *    per-group driver jobs, no per-job scheduling constants);
  *  - ALL row rules evaluate in ONE map-side aggregation pass —
  *    k rules = k conditional-sum columns over one scan, no per-rule
  *    jobs;
  *  - uniqueness is one groupBy branch per key set over the PRUNED
  *    key columns (violations = Σ(group count − 1) ≡ COUNT(*) −
  *    COUNT(DISTINCT key-struct)) — map-side partial counts, narrow
  *    shuffle rows, and NO Expand (multi-count_distinct in a shared
  *    Aggregate multiplies the full scan k× before shuffling);
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
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty || refs.nonEmpty,
      "audit needs at least one rule")
    // the whole audit is ONE lazy plan → ONE action at the sink: the
    // rule groups become union branches whose stages the scheduler
    // runs concurrently inside a single job, instead of k driver-side
    // jobs each paying its own scheduling constant (the round-12
    // review's 4.7×-at-sf1 finding). Uniqueness folds to arithmetic —
    // violations(rows beyond first per duplicated group) ≡
    // COUNT(*) − COUNT(DISTINCT key-struct) — so each key set is one
    // aggregate branch, no groupBy + refilter pass.
    val branches = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      // ALL row rules evaluate in ONE map-side aggregation pass: k
      // rules = k conditional sums over one scan, zero shuffle beyond
      // the 1-row agg.
      val aggs = rowRules.zipWithIndex.map { case (r, i) =>
        sum(when(!r.passes, 1L).otherwise(0L)).as(s"__v$i")
      }
      val entries = rowRules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"),
          coalesce(col(s"__v$i"), lit(0L)).as("violations"))
      }
      branches += df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(entries: _*)).as("kv"))
        .select(col("kv.rule").as("rule"),
          col("kv.violations").as("violations"))
    }
    // Uniqueness and referential rules share per-key-set GROUPED
    // COUNTS `(keys…, __c)` instead of each walking the full table:
    //  - NOT count_distinct aggregates in the row-rule scan: k
    //    distinct aggs in one Aggregate plan through Expand — a k×
    //    row multiplication of the full table before the shuffle
    //    (measured 5× DuckDB at sf1). A plain groupBy over the PRUNED
    //    key columns shuffles narrow rows once, with map-side partial
    //    counts (clustered keys — the lineitem orderkey layout —
    //    shrink by their duplication factor);
    //  - a key set that is a SUBSET of another derives its counts
    //    from the superset's grouped frame (groupBy + sum), so
    //    unique(k1,k2) + unique(k1) cost one full-data shuffle, not
    //    two — the second hop aggregates groups, not rows;
    //  - a referential rule anti-joins its fk's GROUPED keys (one row
    //    per distinct key, weighted by __c) instead of every data
    //    row, shrinking the probe side by the duplication factor;
    //    identical grouped subplans across branches collapse to one
    //    physical shuffle via exchange reuse.
    // GROUP BY groups NULL keys together, exactly like the
    // COUNT(DISTINCT struct) it replaces (struct keys are never
    // NULL); violations = Σ(group count − 1) over duplicated groups
    // ≡ COUNT(*) − COUNT(DISTINCT key-struct).
    val neededKeySets: Seq[Seq[String]] =
      (uniqueKeys ++ refs.map { case (fk, _, _) => Seq(fk) })
        .map(_.distinct).distinct
    val groupedCache =
      scala.collection.mutable.Map[Seq[String], DataFrame]()
    def grouped(ks0: Seq[String]): DataFrame = {
      val ks = ks0.distinct
      groupedCache.getOrElseUpdate(ks.sorted, {
        val sup = neededKeySets
          .filter(o => o.toSet != ks.toSet && ks.forall(o.contains))
          .sortBy(_.size).headOption
        sup match {
          case Some(o) => grouped(o).groupBy(ks.map(col): _*)
            .agg(sum(col("__c")).as("__c"))
          case None => df.select(ks.map(col): _*)
            .groupBy(ks.map(col): _*).agg(count(lit(1)).as("__c"))
        }
      })
    }
    uniqueKeys.foreach { ks =>
      branches += grouped(ks)
        .where(col("__c") > 1L)
        .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"))
        .select(lit(s"unique(${ks.mkString(",")})").as("rule"),
          col("violations"))
    }
    refs.foreach { case (fk, ref, rc) =>
      // no distinct() on the reference side: LEFT ANTI only tests
      // existence, the join's own hashed relation dedupes — a
      // distinct would be one extra shuffle+agg of the whole
      // reference column for nothing
      branches += grouped(Seq(fk)).where(col(fk).isNotNull)
        .join(ref.select(col(rc).as(fk)), Seq(fk), "left_anti")
        .agg(coalesce(sum(col("__c")), lit(0L)).as("violations"))
        .select(lit(s"ref($fk->$rc)").as("rule"), col("violations"))
    }
    branches.result().reduce(_.unionByName(_))
      .select(col("rule"), col("violations"),
        (col("violations") === 0L).as("pass"))
      .orderBy(asc_nulls_first("rule"))
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
