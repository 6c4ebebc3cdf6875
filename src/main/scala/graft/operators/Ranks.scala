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
    * [[globalRowNumber]] exists for. Equi-depth binning /
    * quantile-bucket feature transforms at corpus scale.
    *
    * Plan shape: COUNTING SELECTION (the x98/x104 recipe, promoted
    * from audits to the operator itself in round 15) whenever the
    * leading order column has a monotone numeric proxy and every
    * order column is plain ascending-nulls-first — the data is never
    * globally sorted, shuffled, or ranked: one map-only bucketing by
    * sampled boundaries, one exact (bucket) histogram, a row_number
    * over ONLY the ≤ k−1 boundary buckets (≈ n/nBuckets rows per
    * task — `nBuckets` is the scale knob, size it so that fits one
    * task), and a map-only broadcast bin assignment comparing each
    * row's order tuple against the k−1 boundary tuples. Exactness is
    * boundary-independent: equal leading values share a bucket and
    * every rank is recovered from exact counts. Orders the proxy
    * can't serve (descending, nulls-last, non-numeric head) fall back
    * to the [[globalRowNumber]] formulation.
    *
    * `order` must be a TOTAL order (unique tiebreak): SQL ntile bin
    * SIZES are only well-defined up to tie placement, and the
    * boundary path raises a clear error if duplicate order tuples
    * land exactly on a bin boundary instead of silently mis-sizing
    * bins. All longs stay < 2^53 so double intermediates are exact. */
  def ntileExact(df: DataFrame, k: Int, order: Seq[Column],
                 outCol: String = "bin", nBuckets: Int = 64): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1, got $k")
    boundaryNtile(df, k, lit(0L), order, outCol, nBuckets)
      .getOrElse {
        val ranked = globalRowNumber(df, order, "__ntile_rn")
        // ranked is cache-backed, so this count is a cheap second
        // read, not a recompute of the range shuffle
        val nFrame = ranked.agg(count(lit(1)).as("__ntile_total"))
        val n = col("__ntile_total"); val rn = col("__ntile_rn")
        val q = ((n - pmod(n, lit(k))) / k).cast("long") // n div k
        val r = pmod(n, lit(k))
        val cut = r * (q + 1)
        ranked.crossJoin(broadcast(nFrame))
          .withColumn(outCol,
            when(rn <= cut, ceil(rn / (q + 1)))
              // never selected when q = 0 (then cut = n ≥ rn) — CASE
              // branches are lazy, so the division cannot hit zero
              .otherwise(r + ceil((rn - cut) / q)))
          .drop("__ntile_rn", "__ntile_total")
      }
  }

  /** Per-group exact NTILE(k) — `ntile(k) OVER (PARTITION BY g ORDER
    * BY …)` semantics without the per-group single-task sort (the
    * x104 trap: few huge groups = few huge tasks). Same counting-
    * selection plan shape as [[ntileExact]] (see its scaladoc),
    * grouped: the histogram and boundary frames are groups × buckets
    * and groups × (k−1) sized — the boundary table must broadcast,
    * the x104 convention. NULL groups bin like any other
    * (struct-wrapped key). Falls back to the [[globalRowNumber]]
    * formulation for orders the boundary path can't serve. */
  def ntileExactBy(df: DataFrame, k: Int, groupCol: String,
                   order: Seq[Column], outCol: String = "bin",
                   nBuckets: Int = 64): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1, got $k")
    boundaryNtile(df, k, struct(col(groupCol)), order, outCol, nBuckets)
      .getOrElse {
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

  /** The counting-selection ntile core shared by [[ntileExact]] (one
    * constant group) and [[ntileExactBy]]. None = this order can't
    * ride the boundary path (descending / nulls-last direction, or a
    * leading column with no monotone numeric proxy) — callers fall
    * back to the rank formulation. */
  private def boundaryNtile(df: DataFrame, k: Int, gExpr: Column,
      order: Seq[Column], outCol: String,
      nBuckets: Int): Option[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types._
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    // plain ascending-nulls-first value columns, or bail
    val plainOpt: Seq[Option[Column]] =
      order.map(ColumnBridge.ascNullsFirstValue)
    if (plainOpt.exists(_.isEmpty)) return None
    val plain = plainOpt.map(_.get)
    // monotone non-decreasing DOUBLE proxy of the leading order
    // column: boundaries only SIZE buckets (equal heads must share a
    // bucket; a lossy-but-monotone cast is fine), so long → double
    // rounding cannot affect exactness
    val headType = df.select(plain.head).schema.head.dataType
    val proxyOf: Column => Column = headType match {
      case _: NumericType => _.cast("double")
      case DateType => unix_date(_).cast("double")
      case TimestampType => unix_micros(_).cast("double")
      case _ => return None
    }
    if (k == 1) return Some(df.withColumn(outCol, lit(1L)))

    val pv = proxyOf(plain.head)
    // sampled GLOBAL boundaries (nulls/NaN excluded — they get their
    // own buckets below, matching Spark's nulls-first / NaN-greatest
    // double ordering)
    val bounds = df.where(plain.head.isNotNull && !isnan(pv))
      .select(pv.as("__p")).stat
      .approxQuantile("__p",
        (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.001)
      .distinct.sorted
    val boundsCol = array(bounds.map(lit(_)): _*)
    val bCol = when(plain.head.isNull, lit(-1))
      .when(isnan(pv), lit(Int.MaxValue))
      .otherwise(if (bounds.isEmpty) lit(0)
        else size(filter(boundsCol, b => b <= pv)))
    val bucketed = df.withColumn("__ntb_g", gExpr).withColumn("__ntb_b", bCol)

    // exact (group, bucket) histogram + per-group running offsets —
    // a groups × buckets frame, never data-sized
    val hist = bucketed.groupBy(col("__ntb_g"), col("__ntb_b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__before", coalesce(
        sum(col("__c")).over(Window.partitionBy(col("__ntb_g"))
          .orderBy(col("__ntb_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // the k−1 boundary ranks per group: end-of-bin ranks under SQL
    // ntile sizing (first n mod k bins one row larger); duplicates
    // (q = 0 ⇒ empty trailing bins share rank n) collapse safely —
    // no row sorts after the last tuple
    val nC = col("__ntb_n")
    val qC = ((nC - pmod(nC, lit(k))) / k).cast("long")
    val rC = pmod(nC, lit(k))
    val wanted = hist.groupBy(col("__ntb_g"))
      .agg(sum(col("__c")).as("__ntb_n"))
      .select(col("__ntb_g"), explode(array_distinct(
        transform(sequence(lit(1), lit(k - 1)),
          i => when(i <= rC, i * (qC + 1))
            .otherwise(rC * (qC + 1) + (i - rC) * qC)))).as("__rn"))
    // locate each boundary rank's bucket and local rank; ≤ k−1 rows
    // per group
    val targets = hist.join(wanted, Seq("__ntb_g"))
      .where(col("__rn") > col("__before") &&
        col("__rn") <= col("__before") + col("__c"))
      .groupBy(col("__ntb_g"), col("__ntb_b"))
      .agg(collect_list(col("__rn") - col("__before")).as("__lranks"))
    // row_number ONLY inside boundary buckets (≈ n_g/nBuckets rows
    // per window task), then the boundary ORDER TUPLES per group
    val tup = struct(plain: _*)
    val boundaries = bucketed
      .join(broadcast(targets), Seq("__ntb_g", "__ntb_b"))
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col("__ntb_g"), col("__ntb_b"))
          .orderBy(plain: _*)).cast("long"))
      .where(array_contains(col("__lranks"), col("__lrn")))
      .select(col("__ntb_g"), tup.as("__bt"))
      .groupBy(col("__ntb_g"))
      .agg(sort_array(collect_list(col("__bt"))).as("__bs"))
    // map-only assignment: bin = 1 + #boundary tuples strictly below
    // this row's tuple. Duplicate boundary TUPLES at distinct ranks
    // mean ties sit exactly on a bin boundary — bin sizes would be
    // silently wrong, so fail loudly instead (add a tiebreak).
    val bin = when(
      size(array_distinct(col("__bs"))) =!= size(col("__bs")),
      raise_error(concat(lit("ntile order is not total: duplicate "),
        lit("order tuples land on a bin boundary — add a unique "),
        lit("tiebreak column"))).cast("long"))
      .otherwise((size(filter(col("__bs"), b => b < tup)) + 1).cast("long"))
    Some(bucketed.join(broadcast(boundaries), Seq("__ntb_g"))
      .withColumn(outCol, bin)
      .drop("__ntb_g", "__ntb_b", "__bs"))
  }
}
