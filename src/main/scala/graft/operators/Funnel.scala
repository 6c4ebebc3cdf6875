package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics: funnel conversion and retention cohorts
  * — the two queries every product-analytics workload runs over an
  * event stream (the ClickHouse `windowFunnel` / cohort-retention
  * shape, re-expressed as Spark aggregations).
  *
  * Scale shape (both operators):
  *  - events are FILTERED to the relevant types before any exchange —
  *    on a 100 TB event table the shuffle carries only the funnel's
  *    step events, not the stream;
  *  - exactly ONE shuffle by user for the per-user computation (the
  *    funnel fold runs inside the aggregation's collected, per-user
  *    event list; users are numerous and small, so the groupBy
  *    parallelizes perfectly and no window-over-everything sort
  *    exists);
  *  - the final counts are a handful of rows (steps × 1, cohorts ×
  *    weeks), partial-aggregated map-side.
  */
object Funnel {

  /** Funnel conversion over ordered steps. Semantics (earliest-first
    * greedy, deterministic and oracle-replayable): per user,
    * `t(0)` = the user's earliest step-0 event; `t(i)` = the earliest
    * step-i event STRICTLY after `t(i-1)`; with `windowSeconds` set,
    * every step must also land within the window opened at `t(0)`.
    * A user's level = number of steps reached.
    *
    * Returns one row per step: `(step, step_name, users)` where
    * `users` counts users whose level reached that step —
    * monotonically non-increasing down the funnel.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             windowSeconds: Option[Long] = None,
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    val k = steps.size
    val folded = chainTimes(events, steps, windowSeconds,
      userCol, tsCol, typeCol)
      .select(col("user"),
        size(filter(col("__times"), t => t =!= -1L)).as("level"))
    stepCounts(folded, steps)
  }

  /** Per-user levels → one row per step `(step, step_name, users)` —
    * k counts in ONE aggregation pass, then unpivoted; step names
    * ride as literal VALUES, never spliced into a SQL string (an
    * apostrophe in an event type must not parse, let alone inject).
    * Zero input rows count 0, not NULL. Shared by the batch funnel
    * and the x96 streaming gate's final reduction. */
  def stepCounts(levels: DataFrame, steps: Seq[String],
                 levelCol: String = "level"): DataFrame = {
    val k = steps.size
    val aggs = (1 to k).map(i =>
      coalesce(sum(when(col(levelCol) >= i, 1L).otherwise(0L)), lit(0L))
        .as(s"u$i"))
    val one = levels.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array((1 to k).map(i =>
        struct(lit(i).as("step"), lit(steps(i - 1)).as("step_name"),
          col(s"u$i").cast("long").as("users"))): _*)).as("r"))
      .select(col("r.step").as("step"), col("r.step_name").as("step_name"),
        col("r.users").as("users"))
  }

  /** Per-user greedy-chain step times (the funnel's intermediate,
    * exposed for conversion-lag analytics): `(userCol, t1 .. tk)` in
    * epoch MICROS, NULL where the chain never reached that step. */
  def stepTimes(events: DataFrame, steps: Seq[String],
                windowSeconds: Option[Long] = None,
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type"): DataFrame = {
    val k = steps.size
    val times = chainTimes(events, steps, windowSeconds,
      userCol, tsCol, typeCol)
    times.select(col("user").as(userCol) +:
      (1 to k).map(i =>
        when(element_at(col("__times"), i) =!= -1L,
          element_at(col("__times"), i)).as(s"t$i")): _*)
  }

  /** The shared greedy fold: `(user, __times)` with `__times(i)` the
    * step-i time in micros or -1. */
  private def chainTimes(events: DataFrame, steps: Seq[String],
                         windowSeconds: Option[Long],
                         userCol: String, tsCol: String,
                         typeCol: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct event types")
    val k = steps.size
    // step index via a when-chain (codegen'd; no UDF), events of
    // other types dropped BEFORE the shuffle
    val stepIdx = steps.zipWithIndex.tail.foldLeft(
      when(col(typeCol) === steps.head, lit(0))) {
      case (acc, (s, i)) => acc.when(col(typeCol) === s, lit(i))
    }
    val winUs = windowSeconds.map(_ * 1000000L)
    val perUser = events
      // NULL-ts events carry no position in event time: without this
      // filter a NULL lands in acc[0] (struct sort is nulls-first and
      // every s==0 guard passes) and poisons the whole user's chain
      .where(col(typeCol).isin(steps: _*) && col(tsCol).isNotNull)
      .select(col(userCol).as("user"),
        struct(unix_micros(col(tsCol)).as("t"), stepIdx.as("s")).as("ev"))
      .groupBy(col("user"))
      .agg(array_sort(collect_list(col("ev"))).as("evs"))
    // greedy fold: acc = array of k step times (-1 = unreached).
    // element_at is 1-based; events arrive time-ordered from the sort.
    perUser.select(
      col("user"),
      aggregate(
        col("evs"),
        array_repeat(lit(-1L), k),
        (acc, e) => {
          val s = e.getField("s")
          val t = e.getField("t")
          val prevSet = s === 0 || element_at(acc, s) =!= -1L
          val after = s === 0 || t > element_at(acc, s)
          val inWin = winUs.map(w =>
            s === 0 || t <= element_at(acc, 1) + w).getOrElse(lit(true))
          transform(acc, (cur, i) =>
            when(i === s && cur === -1L && prevSet && after && inWin, t)
              .otherwise(cur))
        }).as("__times"))
  }

  /** Weekly retention cohorts: users are cohorted by the ISO week of
    * their FIRST event; `users` counts distinct users of cohort
    * `cohort_week` active in week `cohort_week + week_no` (week 0 is
    * the cohort week itself, so its count is the cohort size).
    * Returns `(cohort_week date, week_no int, users)`.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val dated = events.where(col(tsCol).isNotNull)
    val firsts = dated.groupBy(col(userCol).as("user"))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    val active = dated
      .select(col(userCol).as("user"),
        to_date(date_trunc("week", col(tsCol))).as("week"))
      .distinct()
    // both sides are already hash-partitioned by user from their own
    // aggregations; the join reuses that exchange under AQE
    active.join(firsts, "user")
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_no"))
      .agg(count_distinct(col("user")).as("users"))
  }
}
