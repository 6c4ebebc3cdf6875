package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe global ranking. `row_number() OVER (ORDER BY …)` with
  * no PARTITION BY collapses the whole table into ONE task in Spark —
  * the canonical 100 TB scale killer (fine at sf0.1, dead at sf1000).
  * The distributed form is the two-level trick the sharded cumsum
  * operators already use:
  *
  *  1. `repartitionByRange` + in-partition sort on the rank order —
  *     partition p holds a contiguous, ordered slice;
  *  2. per-partition local indexes from
  *     `monotonically_increasing_id()` (documented layout: partition
  *     id in the upper bits, a per-partition sequential counter in the
  *     lower 33 — assigned downstream of the sort in the same stage,
  *     so it follows the sorted order);
  *  3. per-partition row counts → one bounded driver pass (≤
  *     #partitions rows, the Ivf-centroid precedent) → cumulative
  *     offsets broadcast back; global rank = offset + local index + 1.
  *
  * The order columns must form a TOTAL order (add a unique tiebreak);
  * ranks are then exact and independent of where the range sampler
  * happens to place partition boundaries.
  */
object Ranks {

  /** CONTRACT (load-bearing since the persist move): either `order`
    * is a total order, or the caller is tie-insensitive. persist pins
    * the partitioning but — unlike the old localCheckpoint — not the
    * bytes: on cache eviction a recompute replays the same shuffle
    * blocks with the same boundaries, yet `monotonically_increasing_id`
    * may renumber rows that compare EQUAL under `order` (the sort is
    * not stable across replays). With a total order the replay is
    * bit-identical; without one, two downstream actions could see tied
    * rows swap ranks. Every in-repo caller passes a unique tiebreak or
    * consumes ranks tie-insensitively (Outliers' deviation persist has
    * the same contract).
    *
    * Lifecycle: the cached frame backs the RETURNED plan, so it cannot
    * be unpersisted here; long-lived sessions (BenchServe) release
    * accumulated caches via `spark.sqlContext.clearCache()` between
    * measurements. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
                      outCol: String = "rn"): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs at least one order column")
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    // persist PINS the partitioning: the counts collect below and the
    // caller's consumption of the result are separate Spark jobs, and
    // RangePartitioner's boundary sampling is seeded per physical
    // RDD — re-executing the range shuffle in each job could place
    // boundaries differently, pairing offsets from one partitioning
    // with local indexes from another (wrong ranks once partitions
    // outgrow the boundary sample — exactly the at-scale regime).
    // persist, not localCheckpoint (the round-13 Intervals move): the
    // counts collect both populates the cache AND reads the stats in
    // ONE job, where the eager checkpoint spent a separate data-sized
    // materialization pass first; a cache miss recomputes from the
    // already-written shuffle blocks — same boundaries, same order,
    // same local ids.
    val mid = sorted.withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one bounded collect: a count per non-empty partition
    val counts = mid.groupBy(col("__pid"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // each pid's offset = count-sum of all prior (lower-range) pids
    val running = counts.scanLeft(0L)(_ + _._2)
    val offRows = counts.indices.map(i => (counts(i)._1, running(i)))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offRows.toDF("__pid", "__off")
    mid.join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol,
        col("__off") + col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop("__mid", "__pid", "__off")
  }

  /** Exact global NTILE(k) — SQL semantics (the first n mod k buckets
    * get ⌈n/k⌉ rows, the rest ⌊n/k⌋) WITHOUT the single-task window:
    * `ntile(k) OVER (ORDER BY …)` has no PARTITION BY, so Spark
    * collapses the whole table into one task — the same scale killer
    * [[globalRowNumber]] exists for. Here the bucket is plain
    * arithmetic over the distributed global rank plus a 1-row
    * broadcast of the total count. Equi-depth binning /
    * quantile-bucket feature transforms at corpus scale.
    *
    * `order` must be a total order (unique tiebreak) for
    * engine-exact bucket assignment; all longs stay < 2^53 so the
    * double intermediates are exact. */
  def ntileExact(df: DataFrame, k: Int, order: Seq[Column],
                 outCol: String = "bin"): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1, got $k")
    val ranked = globalRowNumber(df, order, "__ntile_rn")
    // ranked is cache-backed, so this count is a cheap second read,
    // not a recompute of the range shuffle
    val nFrame = ranked.agg(count(lit(1)).as("__ntile_total"))
    val n = col("__ntile_total"); val rn = col("__ntile_rn")
    val q = ((n - pmod(n, lit(k))) / k).cast("long") // n div k, exact
    val r = pmod(n, lit(k))
    val cut = r * (q + 1)
    ranked.crossJoin(broadcast(nFrame))
      .withColumn(outCol,
        when(rn <= cut, ceil(rn / (q + 1)))
          // never selected when q = 0 (then cut = n ≥ rn) — CASE
          // branches are lazy, so the q division cannot hit zero
          .otherwise(r + ceil((rn - cut) / q)))
      .drop("__ntile_rn", "__ntile_total")
  }

  /** Per-group exact NTILE(k) — `ntile(k) OVER (PARTITION BY g ORDER
    * BY …)` semantics without the per-group single-task sort (the
    * x104 trap: few huge groups = few huge tasks). In-group ranks
    * come from ONE [[globalRowNumber]] over (group, order…) minus the
    * group's min global rank; group sizes ride the same groups-sized
    * join. NULL groups bin like any other (struct-wrapped key). */
  def ntileExactBy(df: DataFrame, k: Int, groupCol: String,
                   order: Seq[Column], outCol: String = "bin"): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1, got $k")
    val g = struct(col(groupCol)).as("__ntile_g")
    val ranked = globalRowNumber(df.withColumn("__ntile_g", g),
      col("__ntile_g") +: order, "__ntile_grn")
    val stats = ranked.groupBy(col("__ntile_g"))
      .agg(min(col("__ntile_grn")).as("__ntile_off"),
        count(lit(1)).as("__ntile_n"))
    val n = col("__ntile_n")
    val rn = col("__ntile_grn") - col("__ntile_off") + 1
    val q = ((n - pmod(n, lit(k))) / k).cast("long")
    val r = pmod(n, lit(k))
    val cut = r * (q + 1)
    ranked.join(stats, Seq("__ntile_g"))
      .withColumn(outCol,
        when(rn <= cut, ceil(rn / (q + 1)))
          .otherwise(r + ceil((rn - cut) / q)))
      .drop("__ntile_g", "__ntile_grn", "__ntile_off", "__ntile_n")
  }
}
