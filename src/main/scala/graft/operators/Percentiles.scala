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
    require(ps.nonEmpty, "at least one percentile required")
    ps.foreach { case (_, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentile $p outside [0,1]") }
    val nonNull = df
      .select(col(groupCol).as("__g"), col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
    // rank + group size as two window passes over the SAME partitioning
    // (running frame + unbounded frame): one scan, one exchange, no
    // second aggregate branch or join
    val byG = Window.partitionBy(col("__g"))
    val ranked = nonNull
      .withColumn("__rn", row_number().over(byG.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(byG))
    // 0-based fractional position of percentile p in the sorted run;
    // ranks floor(pos)+1 and ceil(pos)+1 (1-based) bracket it. Ties in
    // __v make row_number's choice arbitrary but the VALUE at each
    // rank deterministic, which is all the interpolation reads.
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
