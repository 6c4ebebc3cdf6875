package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (SQL `PERCENTILE_CONT` /
  * DuckDB `quantile_cont` semantics), computed sort-based instead of
  * via Spark's built-in `percentile` aggregate.
  *
  * Why not the builtin: `percentile`'s aggregation buffer is a
  * value→count map of EVERY distinct value in the group, serialized
  * through the partial/final merge. On a high-cardinality DOUBLE
  * column at large scale that buffer is unbounded — the one reducer
  * holding a hot group materializes the group's whole value set in
  * memory. The sort-based form keeps the heavy lifting in Spark's
  * spillable sort machinery: rank within group (window `row_number`),
  * keep only the ≤2 ranks each requested percentile interpolates
  * between, and aggregate those few rows. Nothing unbounded ever
  * lives in an agg buffer, and the post-filter shuffle moves
  * O(groups × percentiles) rows.
  *
  * Known hazard (documented in SCALE.md): the within-group sort
  * concentrates each group on one task, so very hot groups need the
  * same upstream salting/range-split treatment as any skewed window —
  * but that is a spill-to-disk slowdown, not the builtin's OOM.
  *
  * NULL values are ignored (both engines' semantics); a group whose
  * values are all NULL does not appear in the output. `n_vals` is the
  * group's non-null value count.
  */
object Percentiles {

  /** @param ps (outputColumnName, percentile in [0,1]) pairs */
  def exact(df: DataFrame, groupCol: String, valCol: String,
            ps: Seq[(String, Double)]): DataFrame = {
    validate(ps)
    val nonNull = prep(df, groupCol, valCol)
    // rank + group size as two window passes over the SAME partitioning
    // (running frame + unbounded frame): one scan, one exchange, no
    // second aggregate branch or join
    val byG = Window.partitionBy(col("__g"))
    val ranked = nonNull
      .withColumn("__rn", row_number().over(byG.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(byG))
    interpolate(ranked, groupCol, ps)
  }

  /** [[exact]] with the hot-group hazard removed: global rank is
    * computed in TWO LEVELS — values are split into sampled RANGE
    * shards (boundaries from `approxQuantile`, so shards are
    * contiguous in the sort order and roughly even), ranked locally
    * within (group, shard), and shifted by the broadcast count of the
    * group's preceding shards. No single task ever sorts a whole
    * group; results are identical to [[exact]] (property-tested) —
    * equal values always share a shard, and the interpolation reads
    * only the VALUE at each global rank.
    *
    * Costs one extra scan (shard counts) and a driver-side boundary
    * sample of `nShards−1` doubles — the recipe SCALE.md promises for
    * skewed windows, as code. */
  def exactSharded(df: DataFrame, groupCol: String, valCol: String,
                   ps: Seq[(String, Double)], nShards: Int = 32): DataFrame = {
    validate(ps)
    require(nShards >= 2, s"nShards $nShards must be at least 2")
    val nonNull = prep(df, groupCol, valCol)
    // global boundaries (not per-group): a hot group dominates the
    // sample, so its values spread across shards — exactly the case
    // the sharding exists for. Duplicate boundaries (heavy ties)
    // collapse; equal values then still share a shard.
    val probs = (1 until nShards).map(_.toDouble / nShards)
    val bounds = nonNull.stat
      .approxQuantile("__v", probs.toArray, 0.001)
      .distinct.sorted
    if (bounds.isEmpty) {
      // degenerate value distribution (≤1 distinct) — single shard IS
      // the single-window form
      return exact(df, groupCol, valCol, ps)
    }
    // native binary-search sharding (NativeSelect scaladoc)
    val sharded = nonNull.withColumn("__shard",
      graft.expressions.NativeSelect.searchSorted(col("__v"), bounds))
    val localRanked = sharded.withColumn("__lrn",
      row_number().over(
        Window.partitionBy(col("__g"), col("__shard")).orderBy(col("__v"))))
    // per-(group, shard) counts → preceding-shard offsets + group
    // totals: groups × ≤nShards rows, broadcastable at any scale
    val wG = Window.partitionBy(col("__g")).orderBy(col("__shard"))
    val offsets = sharded.groupBy(col("__g"), col("__shard"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(wG.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__g"))))
      .select(col("__g"), col("__shard"), col("__off"), col("__n"))
    val ranked = localRanked.join(broadcast(offsets), Seq("__g", "__shard"))
      .withColumn("__rn", col("__lrn") + col("__off"))
    interpolate(ranked, groupCol, ps)
  }

  private def validate(ps: Seq[(String, Double)]): Unit = {
    require(ps.nonEmpty, "at least one percentile required")
    ps.foreach { case (_, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentile $p outside [0,1]") }
  }

  private def prep(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.select(col(groupCol).as("__g"), col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)

  /** Shared interpolation tail over a frame carrying (__g, __v, __rn,
    * __n): keep the ≤2 bracketing ranks per percentile, aggregate
    * their weighted contributions. 0-based fractional position of
    * percentile p in the sorted run; ranks floor(pos)+1 and
    * ceil(pos)+1 (1-based) bracket it. Ties in __v make row_number's
    * choice arbitrary but the VALUE at each rank deterministic, which
    * is all the interpolation reads. */
  private def interpolate(ranked: DataFrame, groupCol: String,
                          ps: Seq[(String, Double)]): DataFrame = {
    def pos(p: Double): Column = (col("__n") - lit(1L)) * lit(p)
    val needed = ps.map { case (_, p) =>
      col("__rn") === floor(pos(p)) + 1 || col("__rn") === ceil(pos(p)) + 1
    }.reduce(_ || _)
    val contribs = ps.map { case (name, p) =>
      val lo = floor(pos(p)) + 1
      val hi = ceil(pos(p)) + 1
      val frac = pos(p) - floor(pos(p))
      sum(
        when(col("__rn") === lo && col("__rn") === hi, col("__v"))
          .when(col("__rn") === lo, col("__v") * (lit(1.0) - frac))
          .when(col("__rn") === hi, col("__v") * frac)
          .otherwise(lit(0.0))).as(name)
    } :+ max(col("__n")).as("n_vals")
    ranked.where(needed)
      .groupBy(col("__g"))
      .agg(contribs.head, contribs.tail: _*)
      .withColumnRenamed("__g", groupCol)
  }
}
