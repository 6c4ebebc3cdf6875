package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view update
  * pattern: keep a per-key aggregate STATE (count, sum, min, max per
  * metric) and fold each new delta batch into it with work
  * proportional to |state| + |delta|, never rescanning the base
  * data. The lakehouse shape: nightly facts land, the rollup table
  * updates in delta-time.
  *
  * Correctness rests on the aggregates being MERGEABLE: count/sum
  * merge by addition, min/max by min/max — so
  * `merge(build(A), build(B)) == build(A ∪ B)` for any split, any
  * order (the same partial/final discipline Spark's own hash
  * aggregate uses inside one query, lifted across queries). avg is
  * DERIVED (sum/count) at read time, never stored — a stored average
  * is not mergeable.
  *
  * Retraction: counts and sums are invertible (feed a delta with
  * negated weights); min/max are NOT — a retraction touching the
  * current extreme requires a rebuild of the touched keys. That is an
  * inherent property of non-invertible aggregates, documented rather
  * than papered over.
  *
  * Scale shape: `build` is one map-side-combined groupBy of the
  * delta; `merge` is one shuffle of state ∪ partials on the key
  * (both sides agg-sized, NOT data-sized). NULL keys are keys (SQL
  * GROUP BY semantics on both sides).
  */
object IncrementalAgg {

  /** Per-key mergeable state of the delta: `(keyCols..., n_rows,
    * <m>_cnt, <m>_sum, <m>_min, <m>_max per metric)`. NULL metric
    * values are ignored by cnt/sum/min/max but counted in n_rows
    * (SQL aggregate semantics); the per-metric non-null count is
    * what makes the derived average exact, not approximate. */
  def build(delta: DataFrame, keyCols: Seq[String],
            metricCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "incremental agg needs key columns")
    require(metricCols.nonEmpty, "incremental agg needs metric columns")
    val aggs = count(lit(1)).as("n_rows") +: metricCols.flatMap { m =>
      Seq(count(col(m)).as(s"${m}_cnt"), sum(col(m)).as(s"${m}_sum"),
        min(col(m)).as(s"${m}_min"), max(col(m)).as(s"${m}_max"))
    }
    delta.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a new delta's state into the existing state: union +
    * re-aggregate with the MERGE functions (sum of sums, min of
    * mins…). Both inputs must have [[build]]'s schema over the same
    * keys/metrics (checked). */
  def merge(state: DataFrame, deltaState: DataFrame, keyCols: Seq[String],
            metricCols: Seq[String]): DataFrame = {
    val expect = (keyCols ++ Seq("n_rows") ++ metricCols.flatMap(m =>
      Seq(s"${m}_cnt", s"${m}_sum", s"${m}_min", s"${m}_max"))).sorted
    Seq(state, deltaState).foreach(df =>
      require(df.columns.sorted.sameElements(expect),
        s"incremental agg: expected state schema ${expect.mkString(",")}, " +
          s"got ${df.columns.sorted.mkString(",")}"))
    // names alone don't catch a DRIFTED state (a LongType v_sum merged
    // with a DoubleType delta would unionByName-coerce and silently
    // degrade values); types must match field-for-field, fail fast
    val stateTypes = state.schema.map(f => f.name -> f.dataType).toMap
    val deltaTypes = deltaState.schema.map(f => f.name -> f.dataType).toMap
    val drifted = expect.filter(c => stateTypes(c) != deltaTypes(c))
    require(drifted.isEmpty,
      "incremental agg: state/delta type drift on " + drifted.map(c =>
        s"$c(${stateTypes(c).simpleString} vs ${deltaTypes(c).simpleString})")
        .mkString(", "))
    val aggs = sum(col("n_rows")).as("n_rows") +: metricCols.flatMap { m =>
      Seq(sum(col(s"${m}_cnt")).as(s"${m}_cnt"),
        sum(col(s"${m}_sum")).as(s"${m}_sum"),
        min(col(s"${m}_min")).as(s"${m}_min"),
        max(col(s"${m}_max")).as(s"${m}_max"))
    }
    state.unionByName(deltaState)
      .groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[build]] the delta and [[merge]] it in one call. */
  def update(state: DataFrame, delta: DataFrame, keyCols: Seq[String],
             metricCols: Seq[String]): DataFrame =
    merge(state, build(delta, keyCols, metricCols), keyCols, metricCols)

  /** The read-time view: derived averages added to the state (never
    * stored — a stored avg is not mergeable). sum / non-null count =
    * exact SQL AVG semantics; a key whose metric values were all NULL
    * has cnt 0 → avg NULL (matching AVG over an all-NULL group). */
  def withAverages(state: DataFrame, metricCols: Seq[String]): DataFrame =
    metricCols.foldLeft(state) { (df, m) =>
      df.withColumn(s"${m}_avg",
        when(col(s"${m}_cnt") > 0, col(s"${m}_sum") / col(s"${m}_cnt")))
    }
}
