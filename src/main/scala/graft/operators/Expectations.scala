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
  *  - a FUSED key-set chain (a base key set with exactly one needed
  *    strict superset — the `unique(pk) + unique(pk, seq)` shape)
  *    pays ONE full-data exchange total: the data repartitions on the
  *    base key, and the one-distinct aggregate
  *    `count(*) + count_distinct(extra-cols-struct)` runs entirely
  *    exchange-free on top (HashPartitioning(base) satisfies every
  *    phase's ClusteredDistribution, base ⊆ base∪extras), yielding
  *    both key sets' violation counts AND the grouped probe frame the
  *    referential rules want. The unfused direction shuffled the full
  *    data TWICE (raw→fine groups, fine→coarse regroup);
  *  - unfused uniqueness stays one groupBy per key set over the
  *    PRUNED key columns (violations = Σ(group count − 1) ≡ COUNT(*)
  *    − COUNT(DISTINCT key-struct)) — map-side partial counts, narrow
  *    shuffle rows, and NO Expand (multi-count_distinct in a shared
  *    Aggregate multiplies the full scan k× before shuffling);
  *  - referential rules are LEFT ANTI joins probing GROUPED keys. The
  *    reference side carries a SHUFFLE_HASH hint: the probe side is
  *    already hash-partitioned on the key (its grouping/repartition
  *    exchange is reused), so only the keys-sized reference column
  *    shuffles and neither side sorts — where the unhinted plan
  *    either sort-merges both sides (reference above the session's
  *    10 MB broadcast estimate) or hands the driver a data-sized
  *    broadcast build. Per-partition hash builds of a key column stay
  *    bounded at any scale; a broadcast of a 100 TB table's PK does
  *    not;
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
    //    (measured 5× DuckDB at sf1);
    //  - a base key set with EXACTLY ONE needed strict superset (and
    //    the superset relating to no other set) fuses: repartition on
    //    the base key, then `count(*) + count_distinct(struct(extra
    //    cols))` per base group — a single distinct aggregate, so no
    //    Expand, and zero further exchanges (HashPartitioning(base)
    //    already clusters every phase). Superset violations =
    //    Σ(__c − __d) ≡ COUNT(*) − COUNT(DISTINCT superset-struct);
    //    base violations = Σ(__c − 1 | __c > 1). Repartitioning on
    //    the base key is safe BY CONSTRUCTION: a key audited for
    //    uniqueness (or probing a reference PK) is near-unique in
    //    intent — violations are the exception — so it spreads, and
    //    a pathologically broken dataset degrades to slow, never to
    //    wrong. The keys-sized grouped frame persists (the Ranks/
    //    Intervals precedent) so every consuming branch (uniques,
    //    refs) reads ONE InMemoryRelation — column pruning would
    //    otherwise specialize each consumer's copy of the subplan
    //    (the ref branch needs no __d) and re-shuffle the full data
    //    per branch. The cache backs the RETURNED lazy plan, so it
    //    cannot be unpersisted here; long-lived sessions release it
    //    via spark.sqlContext.clearCache() between measurements;
    //  - unfused key sets keep the plain groupBy over the PRUNED key
    //    columns (map-side partial counts — clustered keys shrink by
    //    their duplication factor), and a subset still derives from
    //    an unfused superset's grouped frame;
    //  - a referential rule anti-joins its fk's GROUPED keys (one row
    //    per distinct key, weighted by __c) instead of every data
    //    row; identical grouped subplans across branches collapse to
    //    one physical shuffle via exchange reuse.
    // GROUP BY groups NULL keys together, exactly like the
    // COUNT(DISTINCT struct) it replaces (struct keys are never
    // NULL); fused __d counts distinct extra-col structs within each
    // base group, which sum to exactly COUNT(DISTINCT superset-
    // struct) — same NULL grouping, struct inputs never NULL.
    val neededKeySets: Seq[Seq[String]] =
      (uniqueKeys ++ refs.map { case (fk, _, _) => Seq(fk) })
        .map(_.distinct).distinct
    def subsetOf(a: Seq[String], b: Seq[String]): Boolean =
      a.toSet != b.toSet && a.toSet.subsetOf(b.toSet)
    // sorted base key cols -> (base key set, its single superset)
    val fused: Map[Seq[String], (Seq[String], Seq[String])] =
      neededKeySets.flatMap { b =>
        val sups = neededKeySets.filter(o => subsetOf(b, o))
        val subs = neededKeySets.filter(o => subsetOf(o, b))
        sups match {
          case Seq(s) if subs.isEmpty &&
              neededKeySets.filter(o => subsetOf(o, s))
                .forall(_.toSet == b.toSet) =>
            Some(b.sorted -> (b, s))
          case _ => None
        }
      }.toMap
    val fusedFrames: Map[Seq[String], DataFrame] =
      fused.map { case (bKey, (b, s)) =>
        val extras = s.filterNot(b.contains)
        // explicit partition count: an N-less repartition plans as
        // REPARTITION_BY_COL, whose AQE advisory re-optimization was
        // measured 2.0x slower on this exchange at sf1 (0.70 s vs
        // 1.38 s calm minima) — the partition count is the session's
        // shuffle parallelism either way
        bKey -> df.select((b ++ extras).map(col): _*)
          .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
            b.map(col): _*)
          .groupBy(b.map(col): _*)
          .agg(count(lit(1)).as("__c"),
            count_distinct(struct(extras.map(col): _*)).as("__d"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    val fusedSetKeys: Set[Set[String]] =
      fused.values.flatMap { case (b, s) => Seq(b.toSet, s.toSet) }.toSet
    val groupedCache =
      scala.collection.mutable.Map[Seq[String], DataFrame]()
    def grouped(ks0: Seq[String]): DataFrame = {
      val ks = ks0.distinct
      groupedCache.getOrElseUpdate(ks.sorted, {
        val sup = neededKeySets
          .filter(o => o.toSet != ks.toSet && ks.forall(o.contains) &&
            !fusedSetKeys.contains(o.toSet))
          .sortBy(_.size).headOption
        sup match {
          case Some(o) => grouped(o).groupBy(ks.map(col): _*)
            .agg(sum(col("__c")).as("__c"))
          case None => df.select(ks.map(col): _*)
            .groupBy(ks.map(col): _*).agg(count(lit(1)).as("__c"))
        }
      })
    }
    def uniqueName(ks: Seq[String]) = s"unique(${ks.mkString(",")})"
    // one branch per fused chain, emitting BOTH key sets' rules from
    // one global aggregate over the shared grouped frame
    fused.foreach { case (bKey, (b, s)) =>
      val names = uniqueKeys.map(_.distinct)
      val bName = names.find(_.toSet == b.toSet).map(uniqueName)
      val sName = names.find(_.toSet == s.toSet).map(uniqueName)
      val entries =
        bName.map(n => struct(lit(n).as("rule"),
          col("__vb").as("violations"))).toSeq ++
        sName.map(n => struct(lit(n).as("rule"),
          col("__vs").as("violations")))
      if (entries.nonEmpty)
        branches += fusedFrames(bKey).agg(
            coalesce(sum(when(col("__c") > 1L, col("__c") - 1L)), lit(0L))
              .as("__vb"),
            coalesce(sum(col("__c") - col("__d")), lit(0L)).as("__vs"))
          .select(explode(array(entries: _*)).as("kv"))
          .select(col("kv.rule").as("rule"),
            col("kv.violations").as("violations"))
    }
    uniqueKeys.map(_.distinct)
      .filterNot(ks => fusedSetKeys.contains(ks.toSet)).foreach { ks =>
      branches += grouped(ks)
        .where(col("__c") > 1L)
        .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"))
        .select(lit(uniqueName(ks)).as("rule"), col("violations"))
    }
    refs.foreach { case (fk, ref, rc) =>
      // no distinct() on the reference side: LEFT ANTI only tests
      // existence, the join's own hashed relation dedupes — a
      // distinct would be one extra shuffle+agg of the whole
      // reference column for nothing. SHUFFLE_HASH (not broadcast):
      // the probe side's exchange is reused, the reference side is a
      // keys-sized column that hash-builds per partition at any
      // scale, and neither side sorts (scaladoc, scale shape).
      val probe = fusedFrames.getOrElse(Seq(fk), grouped(Seq(fk)))
      branches += probe.where(col(fk).isNotNull)
        .join(ref.select(col(rc).as(fk)).hint("shuffle_hash"),
          Seq(fk), "left_anti")
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
