package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands: merge overlapping-or-touching intervals per key
  * (validity windows, coverage spans, outage episodes).
  *
  * Semantics: intervals [s, e] with s ≤ e; two intervals belong to
  * the same island iff the later one starts at or before the running
  * maximum end of the earlier ones (touching merges; the running max
  * — not lag(e) — is what makes contained intervals correct:
  * [1,10],[2,3],[4,5] is ONE island even though [4,5] starts after
  * lag-end 3).
  *
  * Shape: one shuffle on the key, two window passes over the SAME
  * (key → order) partitioning (running max with a 1-PRECEDING frame,
  * then a running sum for the island id), one partial-aggregating
  * groupBy(key, island). Skew: a hot key concentrates on one task —
  * the usual per-key-window hazard; per-key interval counts are
  * small in every real layout (per-entity validity history), and the
  * sorted-neighborhood escalation recipe (EntityResolution) applies
  * if one ever is not. NULL starts/ends are dropped (an interval
  * with an unknown endpoint has no merge semantics).
  */
object Intervals {

  /** One row per merged island: key, island_start, island_end,
    * n_merged (source intervals folded into it). `tieCols` must make
    * (start, end, tieCols) a total order within key — island ids are
    * running sums over that order, and a total order keeps the
    * window deterministic. */
  def mergeIslands(df: DataFrame, keyCol: String, startCol: String,
                   endCol: String, tieCols: Seq[String]): DataFrame = {
    val s = col(startCol); val e = col(endCol)
    val ord = (Seq(s, e) ++ tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val prevMax = max(e).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .where(s.isNotNull && e.isNotNull)
      .withColumn("__new", when(prevMax.isNull || s > prevMax, 1L)
        .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col(keyCol), col("__island"))
      .agg(min(s).as("island_start"), max(e).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** Per-key coverage summary over the merged islands (DATE
    * endpoints): island count, total covered days (inclusive — a
    * one-day interval covers 1), first/last covered day. */
  def coverageByKey(df: DataFrame, keyCol: String, startCol: String,
                    endCol: String, tieCols: Seq[String]): DataFrame =
    mergeIslands(df, keyCol, startCol, endCol, tieCols)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(datediff(col("island_end"), col("island_start")) + 1)
          .as("covered_days"),
        min(col("island_start")).as("first_day"),
        max(col("island_end")).as("last_day"))
}
