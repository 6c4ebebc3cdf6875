package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ivf, Sim, Text}
import graft.operators.{AsOfJoin, Dedup, Sessionize}
import graft.ops.{Dims, Quality}
import graft.sources.Tables

/** Driver contract — one `queries` entry + matching DuckDB `oracleSql`
  * per implemented operator from SURVEY.md §2. Column names/aliases are
  * kept identical between the DataFrame code and the oracle SQL (the
  * driver's compare sorts columns by name before hashing).
  *
  * Determinism rules (SURVEY.md §2.10): total ORDER BY with explicit
  * NULLS FIRST and unique tie-break keys; ROUND(·,2) on floating
  * aggregates; integer-kind outputs cast to BIGINT on both sides
  * (DuckDB widens COUNT/LENGTH/EXTRACT to BIGINT where Spark uses INT).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Streaming-source staging of the events table (readStream needs a
    * µs-timestamp parquet dir; the fixture is TIMESTAMP(NANOS)).
    * Staged once per dataset dir and reused across streaming queries
    * and repeat invocations — the copy is setup, not the operator. */
  private val stagedEventsCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageEvents(s: SparkSession, d: String): String =
    stagedEventsCache.computeIfAbsent(d, _ => {
      // disk tmp, NOT scratchDir: the staged dataset lives for the
      // whole session and scales with the fixture — pinning it in a
      // (possibly tiny) /dev/shm would either eat RAM or ENOSPC
      val p = sessionTempDir("graft_events_stage")
      t(s, d, "events").write.mode("overwrite").parquet(p)
      p
    })

  /** Events staged for OUTER stream-stream joins: the real events as
    * one file, then a far-future sentinel pair (user −1 view / user
    * −2 click — both branch watermarks advance, the sentinels join
    * nothing) as a second file with a later mtime. Replayed with
    * maxFilesPerTrigger=1 the sentinel batch models "time passes":
    * it drives the watermark past every real view_ts + gap, so the
    * state store evicts and flushes every outer null — without it an
    * AvailableNow replay stops after the last data batch and the
    * unmatched rows never emit. */
  private val stagedEventsSentinelCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageEventsWithSentinel(s: SparkSession, d: String): String =
    stagedEventsSentinelCache.computeIfAbsent(d, _ => {
      import s.implicits._
      val p = sessionTempDir("graft_events_sentinel")
      val ev = t(s, d, "events")
      ev.coalesce(1).write.mode("append").parquet(p)
      val far = ev.agg(org.apache.spark.sql.functions.max(col("ts")) +
        expr("INTERVAL 240 HOURS")).head.getTimestamp(0)
      val before = listParquet(p)
      Seq((-1L, far, -1L, "view", 0.0, "{}"),
          (-2L, far, -2L, "click", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(p)
      bumpMtime(p, before) // sentinel file strictly later, no sleep
      p
    })

  /** FileStreamSource orders files by modification time; make every
    * parquet file NOT in `before` strictly newer than all that are,
    * so the new files replay as later micro-batches deterministically
    * (explicit setLastModifiedTime instead of a wall-clock sleep). */
  private def listParquet(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
  private def bumpMtime(dir: String, before: Set[String]): Unit = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    val maxBefore = files.filter(f => before(f.getName))
      .map(_.lastModified()).foldLeft(0L)(math.max)
    files.filterNot(f => before(f.getName))
      .foreach { f =>
        // A silent setLastModified failure would put FileStreamSource
        // ordering back on wall-clock timing — fail loudly instead.
        require(f.setLastModified(maxBefore + 2000L),
          s"setLastModified failed for $f — filesystem without mtime-set support?")
      }
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** Temp dir that lives for the session (staged datasets, index
    * artifacts) but is deleted on JVM exit — repeated bench/verify
    * runs must not accumulate fixture-sized copies in /tmp. */
  private def sessionTempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(p.toFile)))
    p.toString
  }

  /** Scratch dir for staging/checkpoints, preferring tmpfs (/dev/shm)
    * over java.io.tmpdir. Measured neutral vs disk-backed /tmp at
    * fixture scale (the page cache absorbs the state-store commit
    * writes either way); kept because tmpfs scratch can never leave
    * stale checkpoint litter on disk. A cluster deployment points
    * checkpoints at durable storage instead — this is local-mode
    * scratch placement, not a semantics change. */
  private def scratchDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, prefix).toString
  }

  /** Fresh checkpoint dir per streaming-query invocation (a reused
    * AvailableNow checkpoint would treat the staged files as already
    * processed and emit nothing on re-run), deleted afterwards. The
    * body must leave no query running against the dir — [[awaitGate]]
    * is the sanctioned way to wait. */
  private def withCheckpoint[T](body: String => T): T = {
    val dir = scratchDir("graft_ckpt")
    try body(dir)
    finally rmTree(new java.io.File(dir))
  }

  /** Await a gate stream; if the timeout fires with the query still
    * running, STOP it (before the caller's checkpoint dir is deleted
    * out from under a live micro-batch) and fail LOUDLY — returning
    * normally would hand the caller a partially-populated sink to
    * compare against the oracle. */
  private def awaitGate(q: org.apache.spark.sql.streaming.StreamingQuery,
                        timeoutMs: Long = 120000): Unit =
    if (!q.awaitTermination(timeoutMs)) {
      q.stop()
      throw new IllegalStateException(
        s"streaming gate query did not finish within ${timeoutMs} ms")
    }

  /** IVF inverted lists staged once per dataset dir (hive-partitioned
    * by centroid id — see [[Ivf.writeLists]]). Like the trained
    * quantizer, the lists are a build artifact: searches read only the
    * probed partitions (DPP), so staging them is index construction,
    * not per-query work. */
  private val ivfListsCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageIvfLists(s: SparkSession, d: String, indexKey: String,
                            idx: graft.functions.IvfIndex): String =
    stageIvfListsFor(indexKey, t(s, d, "embeddings"), idx)

  private def stageIvfListsFor(indexKey: String, corpus: DataFrame,
                               idx: graft.functions.IvfIndex): String =
    // keyed by the SAME identity as the quantizer cache — lists are
    // only valid for the quantizer that assigned them
    ivfListsCache.computeIfAbsent(indexKey, _ => {
      val p = sessionTempDir("graft_ivf_lists")
      Ivf.writeLists(corpus, idx, p)
      p
    })

  /** Shared recall-containment gate tail (x14/x14b): how many exact
    * top-k pairs the approximate result missed, bounded — emitted as
    * (n_exact, recall_ok) so the oracle recomputes the exact count
    * and pins the boolean. The exact side is checkpointed once (read
    * twice: count + anti-join). */
  private def recallGate(exactPairs: DataFrame, approxPairs: DataFrame,
                         maxMissed: Long): DataFrame = {
    val exact = exactPairs.localCheckpoint()
    exact.agg(count(lit(1)).cast(LongType).as("n_exact"))
      .crossJoin(
        exact.join(approxPairs, Seq("query_id", "neighbor_id"), "left_anti")
          .agg((count(lit(1)) <= lit(maxMissed)).as("recall_ok")))
  }

  /** Run a streaming gate query with state-store parallelism sized to
    * the load: each shuffle partition is a state-store instance with
    * per-batch commit overhead, so a fixture-scale stream wants a few
    * partitions, not the batch default (a production job would size
    * this to keys×state, same reasoning). Conf is restored afterwards
    * — the stream captures it at start. */
  private def withStreamPartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_join_star")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- core

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ extQueries

  def oracleSql: Map[String, String] = coreOracleSql ++ extOracleSql

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 [S13,P1,W1] scan + project + sort
    "q01_scan_sort" -> ((s, d) =>
      t(s, d, "region")
        .select(col("r_regionkey"), col("r_name"))
        .orderBy(asc_nulls_first("r_regionkey"))),

    // Q2 [P3,P5] sentinel→NULL (ref pattern export_svg.py:212)
    "q02_sentinel_null" -> ((s, d) =>
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          Quality.sentinelNull(col("c_mktsegment"), Seq("AUTOMOBILE")).as("seg"))
        .orderBy(asc_nulls_first("c_custkey"))),

    // Q3 [P4,F5] sentinel→NULL + cast (ref pattern export_svg.py:211)
    "q03_sentinel_cast" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          Quality.sentinelNull(col("o_orderstatus"), Seq("P")).as("st"),
          (col("o_orderkey").cast(LongType) * 2).as("k2"))
        .orderBy(asc_nulls_first("o_orderkey"))),

    // Q4 [A1,D*,P6,W1] distinct + CASE-decode dim build (export_svg.py:275-293)
    "q04_dim_decode" -> ((s, d) =>
      Dims.buildDim(t(s, d, "nation"), "n_regionkey", "region_name",
        Seq(0 -> "AFRICA", 1 -> "AMERICA", 2 -> "ASIA", 3 -> "EUROPE",
            4 -> "MIDDLE EAST"))),

    // Q5 [J1,J2] equi joins through the star; dims broadcast
    "q05_join_star" -> ((s, d) => {
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("r_name"))
    }),

    // Q6 [J3] left outer + null probe. Scale-aware shape: pre-aggregate
    // the big side down to |nations| rows, then broadcast that to the
    // small side — avoids shuffling `customer` for an outer join.
    "q06_left_join" -> ((s, d) => {
      val n = t(s, d, "nation")
      val perNation = t(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(col("c_custkey")).as("cnt"))
      n.join(broadcast(perNation), n("n_nationkey") === perNation("c_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_cust"))
        .orderBy(asc_nulls_first("n_name"))
    }),

    // Q7a [J4] left semi (EXISTS)
    "q07a_semi" -> ((s, d) => {
      val sup = t(s, d, "supplier")
      val li = t(s, d, "lineitem")
      sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
        .select(col("s_suppkey"))
        .orderBy(asc_nulls_first("s_suppkey"))
    }),

    // Q7b [J4] left anti (NOT EXISTS)
    "q07b_anti" -> ((s, d) => {
      val p = t(s, d, "part")
      val li = t(s, d, "lineitem")
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select(col("p_partkey"))
        .orderBy(asc_nulls_first("p_partkey"))
    }),

    // Q8 [A2,F10] TPC-H Q1-style grouped aggregate
    "q08_group_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Q9 [A3] exact count distinct
    "q09_count_distinct" -> ((s, d) =>
      t(s, d, "orders").agg(count_distinct(col("o_custkey")).as("n"))),

    // Q9b [A3] approx count distinct (HLL++), error-bound gated: the
    // estimate itself is engine-specific, but |approx − exact| ≤
    // 3·rsd·exact is the design guarantee — emitted as a boolean the
    // DuckDB oracle pins TRUE next to the exact count it recomputes.
    "q09b_approx_distinct" -> ((s, d) =>
      t(s, d, "orders")
        .agg(count_distinct(col("o_custkey")).cast(LongType).as("n_exact"),
          approx_count_distinct(col("o_custkey"), 0.05).as("approx"))
        .select(col("n_exact"),
          (abs(col("approx") - col("n_exact")) <=
            lit(3 * 0.05) * col("n_exact")).as("within_bound"))),

    // Q10 [A4] rollup
    "q10_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // Q10b [A4] cube
    "q10b_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // Q10c [A5] filtered/conditional aggregate (CASE-inside-agg idiom)
    "q10c_cond_agg" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          count(when(col("o_totalprice") > 150000d, lit(1))).as("n_big"))
        .orderBy(asc_nulls_first("o_orderpriority"))),

    // Q11 [W2] ranking window, top-3 per nation
    "q11_rank_window" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          row_number().over(w).cast(LongType).as("rnk"))
        .where(col("rnk") <= 3)
        .orderBy(asc_nulls_first("c_nationkey"), asc_nulls_first("rnk"))
    }),

    // Q12 [W4] running-sum frame
    "q12_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("run"))
        .orderBy(asc_nulls_first("o_custkey"), asc_nulls_first("o_orderkey"))
    }),

    // Q12b [W3] lag/lead analytics
    "q12b_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(asc_nulls_first("o_custkey"), asc_nulls_first("o_orderkey"))
    }),

    // Q13 [W5] top-k with unique tie-break (TakeOrderedAndProject)
    "q13_topk" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // Q14a [W6] intersect
    "q14a_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(asc_nulls_first("k"))),

    // Q14b [W6] except
    "q14b_except" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey").as("k"))
        .except(t(s, d, "customer").select(col("c_nationkey").as("k")))
        .orderBy(asc_nulls_first("k"))),

    // Q14c [W6] union distinct
    "q14c_union" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy(asc_nulls_first("k"))),

    // Q15 [F2,F6,F13] string functions
    "q15_string_funcs" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("b"),
          lower(col("p_type")).as("t"),
          substring(col("p_name"), 1, 5).as("pfx"),
          length(col("p_name")).cast(LongType).as("len"),
          regexp_replace(col("p_brand"), "#", "-").as("rep"),
          trim(col("p_name")).as("trimmed"),
          concat_ws("|", col("p_brand"), col("p_type")).as("joined"))
        .orderBy(asc_nulls_first("p_partkey"))),

    // Q16 [F3,F9] date/time functions
    "q16_date_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast(LongType).as("y"),
          month(col("o_orderdate")).cast(LongType).as("m"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
          col("o_orderdate").cast(DateType).as("d"))
        .orderBy(asc_nulls_first("o_orderkey"))),

    // Q17 [F10] math functions
    "q17_math_funcs" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_extendedprice") - col("l_tax")), 2).as("a"),
          floor(col("l_quantity")).as("f"),
          ceil(col("l_discount") * 100).as("c"),
          (col("l_orderkey") % 7).as("m"),
          round(sqrt(col("l_extendedprice")), 2).as("sq"))
        .orderBy(asc_nulls_first("l_orderkey"), asc_nulls_first("l_linenumber"))),

    // Q18 [ST2-batch] tumbling-window batch analogue over events
    "q18_hourly_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("HOUR", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .orderBy(asc_nulls_first("h"), asc_nulls_first("event_type"))),

    // Q19 [P1-P6 composite] quality-zone replica over events
    // (mirrors export_svg.py:209-246 semantics on fixture data).
    // The half-up cent rounding is spelled out as floor(v*100+0.5)/100
    // so both engines compute the identical double. The gate emits the
    // cents as DOUBLE: values were proven equal under DECIMAL(18,2) on
    // both sides (round-2 adjudication), but the two engines' decimal
    // wire types canonicalize differently in the driver hash, so the
    // decimal-cast coverage lives in FjcPipelineSpec / tools/check.py
    // and the gate column stays in a type both engines render alike.
    "q19_quality_zone" -> ((s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          Quality.sentinelNull(col("event_type"), Seq("error")).as("etype"),
          when(col("value") < 0, lit(null))
            .otherwise(round(floor(col("value") * 100 + lit(0.5)) / 100, 2))
            .as("val"))
        .orderBy(asc_nulls_first("event_id"))),

    // Q20 [F11] array access — paired-dialect (Spark element_at is
    // 1-based like DuckDB's [n]; both sides cast float→double)
    "q20_array_access" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(
          col("vec_id"),
          round(element_at(col("embedding"), 1).cast(DoubleType), 4).as("e0"),
          size(col("embedding")).cast(LongType).as("dim"))
        .orderBy(asc_nulls_first("vec_id"))),

    // Q21 [F8] JSON extraction — native streaming single-field parse
    // (from_json/get_json_object are CodegenFallback and would kick
    // the whole projection off whole-stage codegen)
    "q21_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          graft.expressions.NativeJson.jsonGetLong(col("props"), "k").as("k"))
        .orderBy(asc_nulls_first("event_id"))),

    // Q22 [F3] date parse round-trip — paired-dialect
    "q22_date_parse" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          to_date(date_format(col("o_orderdate"), "MM/dd/yyyy"), "MM/dd/yyyy").as("d"))
        .orderBy(asc_nulls_first("o_orderkey"))),

    // Q23 [J5,J6] range join: lineitems shipped within 30 days of
    // order. Equi-anchored on the order key with the range conditions
    // as join residuals (never a BNLJ); fact-fact, so no broadcast.
    "q23_range_join" -> ((s, d) => {
      val o = t(s, d, "orders").hint("shuffle_hash")
      val li = t(s, d, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") < o("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(o("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderpriority"))
    }),

    // Q24 [J8] cross join (tiny × tiny)
    "q24_cross_join" -> ((s, d) =>
      t(s, d, "region").select(col("r_regionkey"))
        .crossJoin(t(s, d, "nation").select(col("n_nationkey")))
        .groupBy(col("r_regionkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("r_regionkey"))),

    // Q28 [A2+] exact interpolated percentiles + width_bucket histogram.
    // Sort-based (operators/Percentiles) rather than the builtin
    // `percentile` aggregate, whose buffer holds the group's whole
    // distinct-value map; o_totalprice is never NULL, so n_vals ≡
    // COUNT(*) and the oracle is unchanged.
    "q28_percentiles" -> ((s, d) =>
      graft.operators.Percentiles.exact(
        t(s, d, "orders"), "o_orderpriority", "o_totalprice",
        Seq("p50r" -> 0.5, "p90r" -> 0.9))
        .select(col("o_orderpriority"),
          round(col("p50r"), 2).as("p50"),
          round(col("p90r"), 2).as("p90"),
          col("n_vals").as("n"))
        .orderBy(asc_nulls_first("o_orderpriority"))),

    "q28b_width_bucket" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(width_bucket(col("o_totalprice"), lit(0d), lit(500000d), lit(10))
          .as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("bucket"))),

    // Q29 pivot: order counts per priority × status (fixed pivot values)
    "q29_pivot" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
        .withColumnRenamed("P", "n_p")
        .orderBy(asc_nulls_first("o_orderpriority"))),

    // Q29b unpivot (melt): wide per-priority counts back to long form
    "q29b_unpivot" -> ((s, d) => {
      val wide = t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"))
      wide.unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_f"), col("n_o")),
        "status_col", "n")
        .orderBy(asc_nulls_first("o_orderpriority"), asc_nulls_first("status_col"))
    }),

    // Q30 collect_list/set + listagg-style string aggregation
    "q30_collect" -> ((s, d) =>
      t(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          to_json(sort_array(collect_list(col("n_name")))).as("names"),
          array_join(sort_array(collect_set(col("n_name"))), ",").as("name_csv"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("n_regionkey"))),

    // Q31 statistical aggregates
    "q31_stats" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd"),
          round(var_samp(col("l_quantity")), 4).as("vr"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("cr"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cv"))
        .orderBy(asc_nulls_first("l_returnflag"))),

    // Q15b regex extraction (F13 full form)
    "q15b_regex_extract" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"))
        .orderBy(asc_nulls_first("p_partkey"))),

    // Q16b date arithmetic: diffs, shifts, truncation. Fact-fact join
    // (orders is NOT broadcastable at scale): shuffle-HASH on the
    // order key — both sides shuffle either way, but hashing the
    // smaller build side skips the two sort passes SMJ would pay
    // (measured 1.3 s → 0.83 s at sf0.1; the output sort the oracle
    // mandates is unchanged).
    "q16b_date_arith" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders").hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast(LongType).as("lag_days"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).cast(DateType).as("week_later"),
          date_trunc("MONTH", col("o_orderdate")).cast(DateType).as("month_start"))
        .orderBy(asc_nulls_first("l_orderkey"), asc_nulls_first("l_linenumber"))),

    // Q25 [EP3] ad-hoc SQL surface with a correlated + scalar subquery
    // (Catalyst decorrelates EXISTS → semi join, scalar → cross agg).
    // SHUFFLE_HASH on the decorrelated semi join: unhinted, AQE
    // broadcasts LINEITEM — the fact side, a plan that dies at scale —
    // and measures 1.0 s; the hash-shuffled semi is 0.56 s at sf0.1
    // (ProfileQ25, best-of-3) and shuffles only 8-byte keys at any
    // scale.
    "q25_sql_subquery" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql(
        """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p
           FROM orders o
           WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
             AND EXISTS (SELECT /*+ SHUFFLE_HASH(l) */ 1
                         FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
           ORDER BY o_orderkey NULLS FIRST""")
    }),

    // Q26 [A4] grouping sets (finer than rollup/cube)
    "q26_grouping_sets" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
           FROM orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
           ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    }),

    // Q27 [J3] full outer join with null probes on both sides
    "q27_full_outer" -> ((s, d) => {
      val n = t(s, d, "nation").select(col("n_nationkey").as("k"), col("n_name"))
      val agg = t(s, d, "supplier")
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      n.join(agg, n("k") === agg("s_nationkey"), "full_outer")
        .select(
          coalesce(col("k"), col("s_nationkey")).as("k"),
          col("n_name"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(asc_nulls_first("k"))
    })
  )

  // ----------------------------------------------------- extensions
  // LLM-training-data pipeline operators over documents/embeddings
  // (SURVEY.md north star): dedup, similarity search, text analysis,
  // as-of join, sessionization.

  private def extQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1 exact dedup: survivors (min doc_id per identical text)
    "x01_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "text", "doc_id")
        .select(col("doc_id"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X2 fingerprint dedup (whitespace/case-insensitive identity) —
    // xxhash64-based, rows-only check
    "x02_dedup_fingerprint" -> ((s, d) =>
      Dedup.byFingerprint(t(s, d, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("n_dups"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X3 MinHash+LSH near-dup pairs (verified Jaccard) — rows-only
    "x03_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(t(s, d, "documents"), threshold = 0.4,
        cacheKey = Some(s"docs:$d"))
        .orderBy(asc_nulls_first("id_a"), asc_nulls_first("id_b"))),

    // X4 SimHash pigeonhole pairing, full hash-match oracle: the real
    // banding+verify operator (Dedup.hammingPairs — the exact code
    // path simhashPairs rides) runs over engine-replayable synthetic
    // 64-bit signatures (16 clusters of 4, members 0-3 bit-flips from
    // the cluster base — pure integer arithmetic, identical in both
    // engines), and DuckDB recomputes the exact pair set with
    // bit_count(xor(a,b)) ≤ 3. Any pigeonhole miss OR any Hamming
    // disagreement breaks the hash match — the x27 synthetic-audit
    // pattern upgraded from containment to full equality. The
    // text→simhash64 step itself stays pinned by NativeEquivalence/
    // DedupSim specs and the x10 fingerprint gate.
    "x04_simhash_pairs" -> ((s, d) => {
      val sigSql =
        """((id div 4) * 2654435761 ^ shiftleft((id div 4) * 40503, 20))
           ^ IF(id % 4 > 0, shiftleft(1L, cast(((id div 4) * 7 + 5) % 62 + 1 as int)), 0L)
           ^ IF(id % 4 > 1, shiftleft(1L, cast(((id div 4) * 7 + 22) % 62 + 1 as int)), 0L)
           ^ IF(id % 4 > 2, shiftleft(1L, cast(((id div 4) * 7 + 39) % 62 + 1 as int)), 0L)"""
      val sigs = s.range(64).select(col("id"), expr(sigSql).as("sig"))
      Dedup.hammingPairs(sigs, maxHamming = 3)
        .orderBy(asc_nulls_first("id_a"), asc_nulls_first("id_b"))
    }),

    // X5 brute-force cosine top-5 for query vectors vec_id < 10
    "x05_knn_cosine" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Sim.knnBrute(emb.where(col("vec_id") < 10), emb, k = 5)
        .orderBy(asc_nulls_first("query_id"), asc_nulls_first("rnk"))
    }),

    // X6 SRP-LSH approximate near-dup vector pairs — rows-only
    "x06_srp_neardup" -> ((s, d) =>
      Sim.nearDupPairs(t(s, d, "embeddings"), threshold = 0.4)
        .orderBy(asc_nulls_first("id_a"), asc_nulls_first("id_b"))),

    // X7 language ID (stopword heuristic + CJK fast path) — rows-only
    // (accuracy vs the fixture lang column is asserted in ScalaTest)
    "x07_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X8 quality scoring (length/punct/stopword composite) — rows-only
    "x08_quality_score" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.punctRatio(col("text")).as("punct_ratio"),
          Text.stopwordRatio(col("text")).as("stopword_ratio"),
          Text.charEntropy(col("text")).as("entropy"),
          Text.qualityScore(col("text")).as("quality"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X9 token counting (whitespace + subword proxy) — portable oracle
    "x09_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.tokenCount(col("text")).as("n_tok"),
          Text.subwordCount(col("text")).as("n_subword"),
          length(col("text")).cast(LongType).as("n_chars_calc"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X10 document fingerprint + SimHash signatures — rows-only
    "x10_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Text.fingerprint(col("text")).as("fp"),
          Text.simhash64(col("text")).as("simhash"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X11 as-of join: latest order at-or-before each event, per user
    "x11_asof_join" -> ((s, d) => {
      val e = t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"))
      val o = t(s, d, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.asOf(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_orderdate"))
        .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(asc_nulls_first("event_id"))
    }),

    // X11b forward as-of: earliest order at-or-after each event —
    // the direction that was previously only ScalaTest-covered
    // (DuckDB's ASOF expresses it with the <= inequality)
    "x11b_asof_forward" -> ((s, d) => {
      val e = t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"))
      val o = t(s, d, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.asOf(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_orderdate"), direction = "forward")
        .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(asc_nulls_first("event_id"))
    }),

    // X12 sessionization (10-minute inactivity gap) via session_window
    "x12_sessionize" -> ((s, d) =>
      Sessionize.sessions(t(s, d, "events"), "user_id", "ts")
        .orderBy(asc_nulls_first("user_id"), asc_nulls_first("session_start"))),

    // X20 end-to-end near-dup dedup: LSH pairs → connected components
    // → one representative per cluster (rows-only; semantics pinned
    // by DedupSimSpec chain/cluster tests)
    "x20_dedup_pipeline" -> ((s, d) =>
      Dedup.dedupNearDups(t(s, d, "documents"), threshold = 0.5,
        cacheKey = Some(s"docs:$d"))
        .select(col("doc_id"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X19 curation verdicts: quality signals + rule attribution
    // (rows-only; signal math covered by unit tests + x08/x09 oracles)
    "x19_curation" -> ((s, d) =>
      graft.operators.Curation.annotate(t(s, d, "documents"))
        .select(col("doc_id"), col("n_tok"), col("entropy"),
          col("top_bigram_frac"), col("dup_line_frac"),
          to_json(col("drop_reasons")).as("drop_reasons"), col("keep"))
        .orderBy(asc_nulls_first("doc_id"))),

    // X16 exact char-4-gram Jaccard over a bounded pair set — full
    // DuckDB oracle (shingle construction spelled out in SQL)
    "x16_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(
        t(s, d, "documents").where(col("doc_id") < 40 && length(col("text")) >= 4),
        threshold = 0.2, shingleSize = 4, shingler = Text.charShingles)
        .orderBy(asc_nulls_first("id_a"), asc_nulls_first("id_b"))),

    // X15 [UDTF surface] explode token stream → global top-20 words
    "x15_word_counts" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, asc_nulls_first("word"))
        .limit(20)),

    // X17 multimodal plumbing through the gate: deterministic
    // synthetic assets → stub-decode features → frame sampling,
    // aggregated per modality. The assets are generated by pure
    // arithmetic on the asset index (Multimodal.syntheticAssets), so
    // the oracle replays the generator formulas in SQL — the whole
    // decode/sample path is hash-checked, not rows-only.
    "x17_multimodal" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticAssets(s, 200)
      val feats = graft.operators.Multimodal.decodeFeatures(assets)
      val frames = graft.operators.Multimodal.sampleFrames(feats, stride = 8)
        .groupBy(lit(1).as("g")).agg(count(lit(1)).as("n_frames"))
      feats.groupBy(col("modality"))
        .agg(count(lit(1)).as("n"),
          sum(col("byte_len")).as("bytes"),
          max(col("width")).cast(LongType).as("max_w"),
          sum(col("n_frames")).as("frames"))
        .crossJoin(broadcast(frames.select(col("n_frames").as("sampled_frames"))))
        .orderBy(asc_nulls_first("modality"))
    }),

    // X44 REAL image decode through the gate: deterministic tiny
    // PNG/JPEG/GIF/BMP images are encoded on the executors
    // (javax.imageio, pure JDK), then decodeFeatures must recover
    // width/height by actually parsing the image headers — the dims are index arithmetic the
    // oracle replays WITHOUT seeing the bytes, so a codec that didn't
    // really decode the image container could not match.
    "x44_image_decode" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticImageAssets(s, 64)
      graft.operators.Multimodal.decodeFeatures(assets)
        .select(col("asset_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("n_frames").cast(LongType).as("n_frames"))
        .orderBy(asc_nulls_first("asset_id"))
    }),

    // X45 REAL audio decode through the gate (the x44 pattern for the
    // audio modality): deterministic 16-bit PCM WAVs encoded on the
    // executors (javax.sound.sampled, pure JDK), then decodeFeatures
    // must recover sample rate / channels / PCM frame count by
    // actually parsing the WAV headers — index arithmetic the oracle
    // replays without seeing the bytes.
    "x45_audio_decode" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticAudioAssets(s, 64)
      graft.operators.Multimodal.decodeFeatures(assets)
        .select(col("asset_id"),
          col("sample_rate").cast(LongType).as("sample_rate"),
          col("channels").cast(LongType).as("channels"),
          col("n_frames").cast(LongType).as("n_frames"))
        .orderBy(asc_nulls_first("asset_id"))
    }),

    // X45B COMPRESSED audio metadata: MPEG-1 Layer III frame streams
    // (real header arithmetic behind an ID3v2 tag) — decodeFeatures
    // must skip the tag and walk the frame-header chain to recover
    // sample rate, channel mode, and PCM frame count (1152 × frames),
    // index arithmetic the oracle replays without the bytes.
    "x45b_mp3_decode" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticMp3Assets(s, 64)
      graft.operators.Multimodal.decodeFeatures(assets)
        .select(col("asset_id"),
          col("sample_rate").cast(LongType).as("sample_rate"),
          col("channels").cast(LongType).as("channels"),
          col("n_frames").cast(LongType).as("n_frames"))
        .orderBy(asc_nulls_first("asset_id"))
    }),

    // X45C FLAC metadata: real STREAMINFO headers — decodeFeatures
    // must unpack the 20-bit sample rate / 3-bit channel / 36-bit
    // total-sample fields from the bit-packed block, index arithmetic
    // the oracle replays without the bytes.
    "x45c_flac_decode" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticFlacAssets(s, 64)
      graft.operators.Multimodal.decodeFeatures(assets)
        .select(col("asset_id"),
          col("sample_rate").cast(LongType).as("sample_rate"),
          col("channels").cast(LongType).as("channels"),
          col("n_frames").cast(LongType).as("n_frames"))
        .orderBy(asc_nulls_first("asset_id"))
    }),

    // X48 REAL video decode through the gate (closing the x44/x45
    // pattern over the last modality): deterministic uncompressed DIB
    // AVIs encoded on the executors (hand-rolled RIFF writer, pure
    // JDK), then decodeFeatures must recover width / height / frame
    // count by actually walking the RIFF chunk tree to the 'avih'
    // header — index arithmetic the oracle replays without the bytes.
    "x48_video_decode" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticVideoAssets(s, 64)
      graft.operators.Multimodal.decodeFeatures(assets)
        .select(col("asset_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("n_frames").cast(LongType).as("n_frames"))
        .orderBy(asc_nulls_first("asset_id"))
    }),

    // X48B COMPRESSED video metadata: MJPEG-in-AVI assets whose
    // container headers advertise NOTHING (zeroed avih/strf dims and
    // counts) — decodeFeatures must recover width/height from each
    // first frame's JPEG SOF marker and the frame count from the
    // '00dc' chunks, i.e. by parsing the real compressed stream. The
    // oracle replays the index arithmetic without the bytes.
    "x48b_mjpeg_decode" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticMjpegAssets(s, 64)
      graft.operators.Multimodal.decodeFeatures(assets)
        .select(col("asset_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("n_frames").cast(LongType).as("n_frames"))
        .orderBy(asc_nulls_first("asset_id"))
    }),

    // X48C MP4/ISO-BMFF container metadata: deterministic box trees
    // (ftyp/moov/mvhd/trak/tkhd/stbl/stsd/stsz) encoded on the
    // executors, then mp4Metadata must recover dims from tkhd's 16.16
    // fixed-point fields, frame count from stsz, codec id from the
    // stsd sample entry, and duration from mvhd — pure big-endian box
    // arithmetic the oracle replays without the bytes. Sample data is
    // absent by design: container metadata, not codec decode.
    "x48c_mp4_metadata" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticMp4Assets(s, 64)
      graft.operators.Multimodal.containerMetadata(assets)
        .select(col("asset_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("n_frames").cast(LongType).as("n_frames"),
          col("codec"),
          col("duration_ms"))
        .orderBy(asc_nulls_first("asset_id"))
    }),

    // X48D Matroska/WebM container metadata: deterministic EBML trees
    // (Segment/Info/Tracks/TrackEntry/Video/Cluster) encoded on the
    // executors, then containerMetadata must recover dims from
    // PixelWidth/Height, codec from CodecID, duration from
    // Duration × TimecodeScale, and frame count from the SimpleBlock
    // elements — EBML varint arithmetic the oracle replays without
    // the bytes. VP8/VP9/AV1 sample decode stays behind the stub.
    "x48d_webm_metadata" -> ((s, d) => {
      val assets = graft.operators.Multimodal.syntheticWebmAssets(s, 64)
      graft.operators.Multimodal.containerMetadata(assets)
        .select(col("asset_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("n_frames").cast(LongType).as("n_frames"),
          col("codec"),
          col("duration_ms"))
        .orderBy(asc_nulls_first("asset_id"))
    }),

    // X49 Kafka-shaped transfer bus end-to-end: TransferRequests built
    // from orders rows, produced onto a 4-partition file-backed commit
    // log in two batches (offsets must chain across segments), then
    // group-consumed, decoded, and aggregated by month. The oracle
    // replays the request construction straight from orders — so the
    // produce→partition→offset→poll→decode round trip must be lossless
    // and duplicate-free to hash-match.
    "x49_kafka_transfer" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_kafka")
      try {
        val rootS = root.toString
        graft.pipeline.KafkaLog.createTopic(rootS, "transfers", 4)
        val reqs = t(s, d, "orders")
          .orderBy(asc("o_orderkey")).limit(200)
          .select(
            concat(lit("sftp://legacy/orders/"), col("o_orderkey"),
              lit(".csv")).as("source_connection_string"),
            concat(lit("blob://lake/landing/"), col("o_orderkey"),
              lit(".csv")).as("destination_connection_string"),
            (col("o_orderkey") % 2 === 0).as("remove_file"),
            col("o_orderdate").cast(DateType).cast(StringType).as("event_date"))
        def asReqs(df: DataFrame) =
          df.as[graft.pipeline.Messages.TransferRequest]
        graft.pipeline.Messages.producePartitioned(
          asReqs(reqs.where(col("remove_file"))), rootS, "transfers")
        graft.pipeline.Messages.producePartitioned(
          asReqs(reqs.where(!col("remove_file"))), rootS, "transfers")
        val consumed =
          graft.pipeline.Messages.consumePartitioned(s, rootS, "transfers", "g1")
        // materialize eagerly (bounded: one row per month) so the
        // temp log can be deleted before the frame is re-read
        val rows = consumed
          .groupBy(substring(col("event_date"), 1, 7).as("month"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("remove_file"), 1L).otherwise(0L)).as("n_remove"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        rows.toSeq.toDF("month", "n_files", "n_remove")
          .orderBy(asc_nulls_first("month"))
      } finally rmTree(root.toFile)
    }),

    // X49B the same transfer bus consumed through the STREAMING
    // path: KafkaLog.readStream (file-stream over the segment logs,
    // checkpointed exactly-once) + foreachBatch, each micro-batch
    // decoded, appended to the sink, and its offsets committed via
    // commitPolled — the subscribe loop a production consumer runs.
    // The gate also REQUIRES the post-stream batch poll to come back
    // empty (the foreachBatch commits really advanced the group
    // watermark over the whole log). Same oracle replay as x49.
    "x49b_kafka_stream" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_kafka_s")
      try {
        val rootS = root.toString
        graft.pipeline.KafkaLog.createTopic(rootS, "transfers", 4)
        val reqs = t(s, d, "orders")
          .orderBy(asc("o_orderkey")).limit(200)
          .select(
            concat(lit("sftp://legacy/orders/"), col("o_orderkey"),
              lit(".csv")).as("source_connection_string"),
            concat(lit("blob://lake/landing/"), col("o_orderkey"),
              lit(".csv")).as("destination_connection_string"),
            (col("o_orderkey") % 2 === 0).as("remove_file"),
            col("o_orderdate").cast(DateType).cast(StringType).as("event_date"))
        def asReqs(df: DataFrame) =
          df.as[graft.pipeline.Messages.TransferRequest]
        graft.pipeline.Messages.producePartitioned(
          asReqs(reqs.where(col("remove_file"))), rootS, "transfers")
        graft.pipeline.Messages.producePartitioned(
          asReqs(reqs.where(!col("remove_file"))), rootS, "transfers")
        val outDir = rootS + "/_consumed"
        val group = "stream-g"
        val reqSchema = org.apache.spark.sql.Encoders
          .product[graft.pipeline.Messages.TransferRequest].schema
        withCheckpoint { ckpt =>
          val q = graft.pipeline.KafkaLog.readStream(s, rootS, "transfers")
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              batch.persist()
              try {
                batch
                  .select(from_json(unbase64(col("value")).cast("string"),
                    reqSchema).as("m"))
                  .select(col("m.*"))
                  .write.mode("append").parquet(outDir)
                graft.pipeline.KafkaLog.commitPolled(rootS, "transfers", group, batch)
              } finally { batch.unpersist(); () }
              ()
            }
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          awaitGate(q)
        }
        // the streaming consumer's commits must cover the entire log
        require(graft.pipeline.Messages
          .consumePartitioned(s, rootS, "transfers", group).isEmpty,
          "x49b: streaming consumer left uncommitted records behind")
        val rows = s.read.parquet(outDir)
          .groupBy(substring(col("event_date"), 1, 7).as("month"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("remove_file"), 1L).otherwise(0L)).as("n_remove"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        rows.toSeq.toDF("month", "n_files", "n_remove")
          .orderBy(asc_nulls_first("month"))
      } finally rmTree(root.toFile)
    }),

    // X50 INCREMENTAL near-dup dedup: admit a new batch (doc_id in
    // [300, 800)) against the already-admitted corpus (doc_id < 300)
    // — drop batch docs with exact 5-gram Jaccard >= 0.5 vs ANY
    // corpus doc, then keep the min-id representative per surviving
    // intra-batch cluster. The oracle replays the exact all-pairs
    // formulation (cross-drop anti-join + the same recursive-CTE
    // components as x20); the hybrid verify matches it up to the
    // ~2e-10-per-pair bound documented on lshHybridPairs. The batch is
    // BOUNDED (like the x26/x27 audit populations) because the
    // oracle's all-pairs side is quadratic in it: at the driver's
    // sf0.01 correctness SF the bound is a no-op (documents end at
    // 500), while at sf0.1 an unbounded batch made the DuckDB replay
    // grind for an hour. The operator itself has no such bound — x20
    // covers the growing-corpus path.
    "x50_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.dedupIncremental(
        docs.where(col("doc_id") >= 300 && col("doc_id") < 800),
        docs.where(col("doc_id") < 300),
        threshold = 0.5,
        corpusCacheKey = Some(s"inc_corpus:$d"))
        .select(col("doc_id"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X51 keyed MERGE upsert: refresh a customer-keyed parquet table
    // from an orders-derived delta — matched keys are REPLACED (tagged
    // name, order-revenue balance), unmatched delta keys (offset by
    // 1e6) are inserted — then read the physically swapped table
    // back. The oracle replays the merge relationally (FULL OUTER
    // JOIN, update-row-wins), so every row of the rewritten table is
    // value-checked.
    "x51_merge_upsert" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft_merge")
      try {
        val tgt = root.toString + "/cust"
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"),
            round(col("c_acctbal"), 2).as("c_acctbal"))
          .write.parquet(tgt)
        val rev = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(round(sum(col("o_totalprice")), 2).as("rev"))
        val upd = rev.where(col("o_custkey") % 3 === 0)
          .select(col("o_custkey").as("c_custkey"),
            concat(lit("upd_"), col("o_custkey")).as("c_name"),
            col("rev").as("c_acctbal"))
          .union(rev.where(col("o_custkey") % 7 === 0)
            .select((col("o_custkey") + lit(1000000L)).as("c_custkey"),
              concat(lit("new_"), col("o_custkey")).as("c_name"),
              col("rev").as("c_acctbal")))
        graft.catalog.Catalog.merge(s, tgt, upd, Seq("c_custkey"))
        // materialize eagerly so the temp dir can be deleted here —
        // the returned frame must not re-read it
        s.read.parquet(tgt)
          .orderBy(asc_nulls_first("c_custkey"))
          .localCheckpoint()
      } finally rmTree(root.toFile)
    }),

    // X51B PARTITION-SCOPED MERGE: the same keyed refresh as x51 but
    // the target is hive-partitioned by market segment and only the
    // leaves the delta touches are rewritten (untouched leaves stay
    // byte-identical — asserted by CatalogSpec; here the oracle
    // value-checks every row of the partially rewritten table).
    // Matched keys carry their own segment (the merge identity is
    // partition + key, so keys never migrate); inserted keys open a
    // brand-new SYNTHETIC partition to exercise leaf creation. The
    // oracle replays the same relational merge with the partition
    // column in the join identity.
    "x51b_merge_partitioned" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft_merge_part")
      try {
        val tgt = root.toString + "/cust"
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"),
            round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
          .write.partitionBy("c_mktsegment").parquet(tgt)
        val rev = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(round(sum(col("o_totalprice")), 2).as("rev"))
        val upd = rev.join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .where(col("o_custkey") % 3 === 0)
          .select(col("o_custkey").as("c_custkey"),
            concat(lit("upd_"), col("o_custkey")).as("c_name"),
            col("rev").as("c_acctbal"), col("c_mktsegment"))
          .union(rev.where(col("o_custkey") % 7 === 0)
            .select((col("o_custkey") + lit(1000000L)).as("c_custkey"),
              concat(lit("new_"), col("o_custkey")).as("c_name"),
              col("rev").as("c_acctbal"),
              lit("SYNTHETIC").as("c_mktsegment")))
        graft.catalog.Catalog.mergePartitioned(s, tgt, upd,
          Seq("c_custkey"), Seq("c_mktsegment"))
        s.read.parquet(tgt)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("c_mktsegment").cast("string").as("c_mktsegment"))
          .orderBy(asc_nulls_first("c_custkey"))
          .localCheckpoint()
      } finally rmTree(root.toFile)
    }),

    // X46 BM25 relevance (query-driven corpus curation): top-10 docs
    // for a 3-term probe query, Okapi BM25 with corpus-wide N/avgdl.
    // Both the tokenizer (the x15/x43 stream) and the scoring formula
    // are engine-replayable, so the oracle recomputes scores
    // term-for-term. Compared score is ROUND(...,2): Spark and DuckDB
    // sum the ≤3 per-term contributions in different orders, so the
    // float sums differ in the last ulps — a 2-decimal grid keeps a
    // boundary flip (sum within ~1e-13 of a 0.005 edge) out of
    // realistic reach where a 4-decimal grid did not. Ordering uses
    // the same rounded score + doc_id tiebreak so the top-10
    // selection is engine-stable.
    "x46_bm25_topk" -> ((s, d) =>
      graft.operators.Bm25.score(t(s, d, "documents"),
          Seq("window", "column", "scan"))
        .select(col("doc_id"), round(col("score"), 2).as("score"))
        .orderBy(col("score").desc, asc_nulls_first("doc_id"))
        .limit(10)),

    // X13 [ST1,ST2,ST6] REAL streaming path through the correctness
    // gate: events replayed as a parquet stream, complete-mode hourly
    // aggregate, memory sink — must equal the q18 batch oracle.
    "x13_stream_hourly" -> ((s, d) => {
      val staged = stageEvents(s, d)
      withStreamPartitions(s, 4) {
        val agg = s.readStream.schema(graft.streaming.EventStreams.schema)
          .parquet(staged)
          .groupBy(date_trunc("HOUR", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        withCheckpoint { ckpt =>
          val q = agg.writeStream.outputMode("complete").format("memory")
            .queryName("x13_out").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          awaitGate(q)
        }
      }
      s.table("x13_out")
        .orderBy(asc_nulls_first("h"), asc_nulls_first("event_type"))
    }),

    // X18 [ST3,ST4,ST5] STATEFUL streaming through the gate: session
    // windows in append mode — only watermark-closed sessions emit;
    // the oracle replicates the emission rule (session_last + gap <
    // max_ts - delay) on top of gaps-and-islands sessionization.
    "x18_stream_sessions" -> ((s, d) => {
      val staged = stageEvents(s, d)
      withStreamPartitions(s, 4) {
        val agg = s.readStream.schema(graft.streaming.EventStreams.schema)
          .parquet(staged)
          .withWatermark("ts", "10 minutes")
          .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("v"))
          .select(col("user_id"), col("session_window.start").as("session_start"),
            col("n_events"), col("v"))
        withCheckpoint { ckpt =>
          val q = agg.writeStream.outputMode("append").format("memory")
            .queryName("x18_out").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          awaitGate(q)
        }
      }
      s.table("x18_out")
        .orderBy(asc_nulls_first("user_id"), asc_nulls_first("session_start"))
    }),

    // X28 [ST5+] STREAMING DEDUP through the gate: first-occurrence
    // key dedup over the event stream — the streaming form of exact
    // dedup for incremental corpus ingestion (state = the distinct
    // key set, exactly what the batch operator would shuffle; grows
    // with key cardinality, not stream length). The emitted set is
    // deterministic regardless of arrival order, so the batch
    // DISTINCT oracle applies.
    "x28_stream_dedup" -> ((s, d) => {
      val staged = stageEvents(s, d)
      withStreamPartitions(s, 4) {
        val dedup = s.readStream.schema(graft.streaming.EventStreams.schema)
          .parquet(staged)
          .select(col("user_id"), col("event_type"))
          .dropDuplicates("user_id", "event_type")
        withCheckpoint { ckpt =>
          val q = dedup.writeStream.outputMode("append").format("memory")
            .queryName("x28_out").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          awaitGate(q)
        }
      }
      s.table("x28_out")
        .orderBy(asc_nulls_first("user_id"), asc_nulls_first("event_type"))
    }),

    // X32 [ST+] stream-static enrichment join: the event stream joins
    // a broadcast static dimension mid-stream (the standard streaming
    // enrichment shape — dim lookup per micro-batch, no stream-side
    // state), then aggregates per dimension label in complete mode.
    // Oracle = the identical batch join+aggregate.
    "x32_stream_enrich" -> ((s, d) => {
      val staged = stageEvents(s, d)
      val nation = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      withStreamPartitions(s, 4) {
        val agg = s.readStream.schema(graft.streaming.EventStreams.schema)
          .parquet(staged)
          .withColumn("nk", col("user_id") % 25)
          .join(broadcast(nation), col("nk") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        withCheckpoint { ckpt =>
          val q = agg.writeStream.outputMode("complete").format("memory")
            .queryName("x32_out").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          awaitGate(q)
        }
      }
      s.table("x32_out").orderBy(asc_nulls_first("n_name"))
    }),

    // X14 IVF approximate kNN (k-means coarse quantizer, nprobe=8),
    // recall-gated vs the exact top-k: the IVF result rows are
    // approximate, but recall@5 against knnBrute (itself hash-verified
    // by x05's oracle) is the design guarantee — emitted as a bounded
    // boolean the oracle pins TRUE next to the exact pair count it
    // recomputes in SQL. Both index halves are cached per dataset dir
    // as build artifacts: the trained quantizer AND the
    // hive-partitioned inverted lists — the search reads only the
    // probed lists' partitions (DPP pruning asserted in PlanSpec),
    // the shape that survives 100 TB.
    // Recall bound context (measured, tools/ProfileX14): the fixture
    // embeddings are RANDOM vectors — no cluster structure, IVF's
    // worst case — so recall@5 at nprobe=8/16 measures 0.78-0.86
    // across sf; the gate bound is missed ≤ 20 (recall ≥ 0.6) to hold
    // at every sf. x14b audits the design case (clustered vectors)
    // with a tight bound.
    "x14_ivf_knn" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val idx = Ivf.indexFor(s"ivf16:$d", emb, k = 16, iters = 3)
      val lists = stageIvfLists(s, d, s"ivf16:$d", idx)
      val queries = emb.where(col("vec_id") < 10)
      val ivf = Ivf.searchIndexed(queries, lists, idx, k = 5, nprobe = 8)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Sim.knnBrute(queries, emb, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      recallGate(exact, ivf, maxMissed = 20L)
    }),

    // X14b IVF recall on CLUSTERED vectors — the operator's design
    // case, over the x27-style deterministic synthetic corpus (12
    // clusters of 8, mate cosine ≈ 1): probing nprobe=4 of 12 cells
    // must recover ≥ 90% of the exact top-5 (which are all cluster
    // mates). Engine-replayable, so the oracle recomputes the exact
    // side and pins the bound.
    "x14b_ivf_clustered_recall" -> ((s, d) => {
      val synth = s.range(96)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(15)), j =>
            (((col("id") / 8).cast(LongType) * 31 + j * 7) % 13 - 6).cast(DoubleType)
              + ((col("id") * 13 + j * 5) % 7 - 3).cast(DoubleType) / 1024.0)
            .as("embedding"))
      val idx = Ivf.indexFor("ivf-synth12", synth, k = 12, iters = 3)
      val lists = stageIvfListsFor("ivf-synth12", synth, idx)
      val queries = synth.where(col("vec_id") < 10)
      val ivf = Ivf.searchIndexed(queries, lists, idx, k = 5, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Sim.knnBrute(queries, synth, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      recallGate(exact, ivf, maxMissed = 5L)
    }),

    // X22 token-window chunking (training-data prep): 80-token
    // windows, 20-token overlap; map-only native expression emitting
    // struct<chunk, n_tok> so the per-chunk token count rides along
    // from the window construction instead of being re-tokenized.
    // Oracle replicates the window arithmetic.
    "x22_chunking" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(graft.functions.Text.chunksWithCounts(col("text"), 80, 20)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
          col("col.n_tok").as("n_tok"),
          col("col.chunk").as("chunk"))
        .orderBy(asc_nulls_first("doc_id"), asc_nulls_first("chunk_id"))),

    // X25 the full training-data pipeline as ONE dataflow: curation
    // verdicts → keep → near-dup dedup (LSH + exact verify + CC) →
    // deterministic split → chunk/token budget per split. Every stage
    // is an operator already oracle-verified on its own (x19, x20,
    // x24, x22, x09); this query pins their composition.
    "x25_training_pipeline" -> ((s, d) => {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      // stage the curated set: dedup reads it twice (signature pass +
      // survivor anti-join), and at warehouse scale each pipeline
      // stage writes its output as a table between stages anyway —
      // without staging, the curation signal math runs twice.
      // localCheckpoint is the local-mode stand-in for that table
      // write: it is NOT fault-tolerant to executor loss (a real
      // cluster run would use a durable table/checkpoint between
      // stages), which also bounds the lifetime of the signature
      // cache entry built over it below.
      val curated = graft.operators.Curation.annotate(t(s, d, "documents"))
        .where(col("keep")).select("doc_id", "text")
        .localCheckpoint()
      val deduped = Dedup.dedupNearDups(curated, threshold = 0.5,
        cacheKey = Some(s"curated:$d"))
      graft.operators.Splits.hashSplit(deduped, "doc_id", splits, "v1")
        .select(col("split"), graft.functions.Text.tokenCount(col("text")).as("nt"))
        // chunk count is pure window arithmetic on the token count
        // (size 80, step 60): no need to materialize chunk strings
        .withColumn("nc",
          when(col("nt") === 0, 0L)
            .when(col("nt") <= 80, 1L)
            .otherwise(lit(1L) +
              ceil((col("nt") - 80).cast("double") / 60).cast("long")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("nc").cast("long").as("n_chunks"),
          sum("nt").cast("long").as("n_tokens"))
        .orderBy(asc_nulls_first("split"))
    }),

    // X26 LSH recall containment audit: every exact char-5-gram
    // Jaccard ≥ 0.9 pair (the banding's design point: 16 bands × 8
    // rows misses a j=0.9 pair w.p. ~1.2e-4) must appear in the LSH
    // candidate set. The approximate operator (x03) can't have an
    // equality oracle, but this containment CAN be gated exactly: the
    // oracle recomputes the exact pair count and pins missed = 0 —
    // recall enforced by the driver, not just ScalaTest. Bounded to
    // doc_id < 200 — wide enough that the sf0.01 gate population
    // actually CONTAINS j ≥ 0.9 pairs (3 of them; doc_id < 40 had
    // none, which made the audit vacuous), small enough that the
    // exact side stays crossJoin-safe.
    "x26_lsh_recall" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .where(col("doc_id") < 200 && length(col("text")) >= 5)
      val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.9, shingleSize = 5,
        shingler = Text.charShingles)
        .localCheckpoint() // read twice below (count + anti-join)
      val cand = Dedup.lshCandidates(docs, cacheKey = Some(s"docs200:$d"))
      exact.agg(count(lit(1)).cast(LongType).as("n_exact"))
        .crossJoin(
          exact.join(cand, Seq("id_a", "id_b"), "left_anti")
            .agg(count(lit(1)).cast(LongType).as("missed_pairs")))
    }),

    // X27 SRP recall containment audit (same idea for the vector
    // near-dup path). The embedding FIXTURE has no high-cosine pairs
    // at any scale factor (max pairwise cosine ≈ 0.46 — an audit over
    // it is vacuous), so the audit runs on deterministic clustered
    // vectors generated by pure integer/dyadic arithmetic on the row
    // index — identical doubles in both engines, clusters of 4 with
    // mate cosine ≥ 0.99999. Every exact cosine ≥ 0.999 pair must be
    // an SRP band-join candidate: at that threshold the 6-band ×
    // 10-bit banding misses a pair w.p. < 1e-5 (p = 1 − θ/π ≈ 0.986,
    // (1 − p^10)^6), the same margin class as x26.
    "x27_srp_recall" -> ((s, d) => {
      val synth = s.range(60)
        .select(col("id"),
          transform(sequence(lit(0), lit(15)), j =>
            (((col("id") / 4).cast(LongType) * 31 + j * 7) % 13 - 6).cast(DoubleType)
              + ((col("id") * 13 + j * 5) % 7 - 3).cast(DoubleType) / 1024.0)
            .as("v"))
      val exact = synth.select(col("id").as("id_a"), col("v").as("v_a"))
        .crossJoin(synth.select(col("id").as("id_b"), col("v").as("v_b")))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.expressions.NativeVector.cosineSim(col("v_a"), col("v_b")), 6)
            .as("sim"))
        .where(col("sim") >= 0.999)
        .localCheckpoint() // read twice below (count + anti-join)
      val cand = Sim.srpCandidates(synth, idCol = "id", vecCol = "v")
      exact.agg(count(lit(1)).cast(LongType).as("n_exact"))
        .crossJoin(
          exact.join(cand, Seq("id_a", "id_b"), "left_anti")
            .agg(count(lit(1)).cast(LongType).as("missed_pairs")))
    }),

    // X29 [skew] two-phase salted aggregation through the gate: the
    // hot-key mitigation (group on (key, salt) first, re-aggregate on
    // the key) must be result-invariant to salting — pinned against
    // the plain GROUP BY oracle.
    "x29_salted_agg" -> ((s, d) =>
      graft.operators.SkewJoin.saltedSumAgg(t(s, d, "events"), "user_id",
        salts = 8, Seq("value"))
        .select(col("user_id"), col("cnt").cast(LongType).as("cnt"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy(asc_nulls_first("user_id"))),

    // X30 [storage scale] symmetric int8 embedding quantization:
    // codes = floor(x/scale + 0.5) with scale = max|x|/127 (4-8×
    // storage reduction for ANN corpora). The gate checks per-vector
    // scale and the max reconstruction error — which the design bounds
    // by scale/2 — against an oracle replaying the same arithmetic.
    "x30_quantize" -> ((s, d) => {
      val e = Sim.asDouble(col("embedding"))
      t(s, d, "embeddings")
        .select(col("vec_id"), e.as("e"))
        .withColumn("sc", Sim.quantScale(col("e")))
        .withColumn("qv", Sim.quantize(col("e"), col("sc")))
        .select(col("vec_id"),
          round(col("sc"), 6).as("scale"),
          round(aggregate(
            zip_with(col("e"), Sim.dequantize(col("qv"), col("sc")),
              (a, r) => abs(a - r)),
            lit(0.0), (acc, x) => greatest(acc, x)), 6).as("max_err"))
        .orderBy(asc_nulls_first("vec_id"))
    }),

    // X31 PII scrubbing through the gate: the fixture corpus has no
    // PII, so the gate synthesizes deterministic PII-bearing text by
    // pure arithmetic on the row index (the x17 pattern) and checks
    // the scrubbed output plus per-kind counts. The regex constants
    // are RE2-portable and shared verbatim with the oracle SQL —
    // single source of truth, engine-identical matches.
    "x31_pii_scrub" -> ((s, d) => {
      val raw = concat(
        lit("user"), col("i"), lit(" wrote from 10.0."),
        (col("i") % 256).cast(StringType), lit("."),
        ((col("i") * 7) % 256).cast(StringType),
        lit(" contact user"), col("i"),
        lit("@example.com or call 555-123-"),
        lpad(((col("i") * 37) % 10000).cast(StringType), 4, "0"),
        lit(" about the weather"))
      s.range(50).select(col("id").as("i"))
        .select(col("i"), raw.as("raw"))
        .select(col("i"),
          Text.scrubPii(col("raw")).as("clean"),
          Text.piiCounts(col("raw")).as("pc"))
        .select(col("i"), col("clean"),
          col("pc.emails").cast(LongType).as("emails"),
          col("pc.ips").cast(LongType).as("ips"),
          col("pc.phones").cast(LongType).as("phones"))
        .orderBy(asc_nulls_first("i"))
    }),

    // X33/X34 [A-family sketches] audit queries for the mergeable
    // sketch surface: the probabilistic guarantees (CMS never
    // undercounts, overcounts by ≤ eps·N; Bloom has no false
    // negatives, false positives within the designed rate) are
    // deterministic for fixed data and seed, so they gate exactly —
    // violation counts pin to 0 in the oracle.
    "x33_cms_audit" -> ((s, d) =>
      graft.operators.Sketches.cmsAudit(t(s, d, "events"), "event_type")),

    "x34_bloom_audit" -> ((s, d) =>
      graft.operators.Sketches.bloomAudit(t(s, d, "events"), "event_type",
        expectedItems = 100000, fpp = 0.03)),

    // X35 train/test decontamination: test-split documents whose
    // word 8-grams appear in any train-split document (the standard
    // pre-training overlap check). Split assignment and the n-gram
    // stream are both engine-replayable, so the oracle recomputes the
    // full overlap exactly.
    "x35_decontamination" -> ((s, d) => {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val docs = graft.operators.Splits.hashSplit(
        t(s, d, "documents"), "doc_id", splits, "v1")
      graft.operators.Decontaminate.ngramOverlap(
        docs, "split", "train", "test", n = 8)
        .select(col("doc_id"), col("n_hits").cast(LongType).as("n_hits"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X36 sequence packing: documents → fixed-2048-token training
    // sequences, packed contiguously per (split, hash-shard) in
    // doc_id order — the shard-parallel form, so the 80% train split
    // sorts on 16 tasks, not one, and seq_id ranges are disjoint per
    // shard. Oracle replays the identical two-level window + shard
    // CASE (same md5-hex buckets).
    "x36_seq_packing" -> ((s, d) => {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val docs = graft.operators.Splits.hashSplit(
        t(s, d, "documents"), "doc_id", splits, "v1")
        .select(col("doc_id"), col("split"),
          graft.functions.Text.tokenCount(col("text")).as("nt"))
      graft.operators.Packing.contiguousSharded(
          docs, "split", "doc_id", "nt", 2048L, nShards = 16, salt = "pack")
        .groupBy(col("split"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).cast(LongType).as("n_tokens"))
        .orderBy(asc_nulls_first("split"), asc_nulls_first("seq_id"))
    }),

    // X37 deterministic domain mixing: per-source sampling rates as a
    // pure function of (salt, doc_id) — the mixture-weights stage of a
    // training pipeline. Same md5-hex-bucket construction as x24, so
    // the oracle evaluates the identical predicate.
    "x37_domain_mix" -> ((s, d) => {
      val rates = Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)
      graft.operators.Mixing.weightedSample(t(s, d, "documents"),
          "source", "doc_id", rates, defaultRate = 0.02, salt = "mix1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).cast(LongType).as("min_id"),
          max(col("doc_id")).cast(LongType).as("max_id"))
        .orderBy(asc_nulls_first("source"))
    }),

    // X38 deterministic corpus shuffle: ORDER BY seeded md5(key) —
    // executed as range-partition + local sort, the scale-correct
    // global shuffle. The head-25 emission pins the ORDER itself
    // (the driver's compare is otherwise order-insensitive); the
    // operator drops its helper sort key, so the gate re-derives it
    // from (salt, key) to pin the key values too.
    "x38_corpus_shuffle" -> ((s, d) =>
      graft.operators.Mixing.shuffled(
          t(s, d, "documents").select(col("doc_id")), "doc_id", salt = "shuf1")
        .limit(25)
        .withColumn("shuffle_key",
          md5(concat(lit("shuf1"), col("doc_id").cast("string"))))),

    // X39 per-domain cap: at most 10 docs per source, selected as the
    // 10 smallest seeded hashes via the bounded-heap TopK UDAF (map
    // partitions forward ≤k candidates per domain — no per-domain
    // window sort of the corpus). sum(doc_id) pins exact membership.
    "x39_domain_cap" -> ((s, d) =>
      graft.operators.Mixing.capPerDomain(t(s, d, "documents"),
          "source", "doc_id", k = 10, salt = "cap1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast(LongType).as("id_sum"))
        .orderBy(asc_nulls_first("source"))),

    // X40 per-domain epoch repetition (the "domain d runs f_d epochs"
    // mixture spec; fractional last epoch at a deterministic hash
    // rate). Grouped by (source, epoch) so full copies AND the
    // fractional tail are each pinned exactly.
    "x40_domain_epochs" -> ((s, d) =>
      graft.operators.Mixing.epochs(t(s, d, "documents"),
          "source", "doc_id",
          Seq("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4),
          defaultFactor = 1.0, salt = "rep1")
        .groupBy(col("source"), col("epoch").cast(LongType).as("epoch"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast(LongType).as("id_sum"))
        .orderBy(asc_nulls_first("source"), asc_nulls_first("epoch"))),

    // X43 deterministic token-budget selection: greedy prefix of the
    // seeded-hash order per domain until the budget would be passed —
    // "take N tokens of domain d". Budgets chosen so the gate
    // exercises partial take (src0), near-empty take (src1), zero
    // budget (src2 absent from output), and the default (others).
    "x43_token_budget" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("nt", graft.functions.Text.tokenCount(col("text")))
      graft.operators.Mixing.tokenBudget(docs, "source", "doc_id", "nt",
          Seq("src0" -> 700L, "src1" -> 200L, "src2" -> 0L),
          defaultBudget = 600L, salt = "tb1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("nt")).cast(LongType).as("tok"))
        .orderBy(asc_nulls_first("source"))
    }),

    // X43b the same token-budget selection through the SHARDED
    // two-level cumsum (shard-local prefix sums + broadcast shard
    // offsets — no single task sorts a hot domain): output is
    // identical to x43 by construction, so it shares x43's oracle —
    // the gate proves the scale-shaped path, not just the property
    // test.
    "x43b_token_budget_sharded" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("nt", graft.functions.Text.tokenCount(col("text")))
      graft.operators.Mixing.tokenBudgetSharded(docs, "source", "doc_id", "nt",
          Seq("src0" -> 700L, "src1" -> 200L, "src2" -> 0L),
          defaultBudget = 600L, salt = "tb1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("nt")).cast(LongType).as("tok"))
        .orderBy(asc_nulls_first("source"))
    }),

    // X47 STREAM-STREAM interval join through the gate: views pair
    // with the same user's clicks within the following hour, both
    // sides watermarked so join state stays bounded. An inner
    // stream-stream join emits exactly the matching pairs, so the
    // batch join oracle applies regardless of micro-batch boundaries;
    // per-user id sums pin exact pair membership.
    "x47_stream_interval_join" -> ((s, d) => {
      val staged = stageEvents(s, d)
      withStreamPartitions(s, 4) {
        withCheckpoint { ckpt =>
          val events = s.readStream
            .schema(graft.streaming.EventStreams.schema).parquet(staged)
          val q = graft.streaming.EventStreams.viewClickJoin(events, 60)
            .writeStream.outputMode("append").format("memory")
            .queryName("x47_out").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          awaitGate(q)
        }
      }
      s.table("x47_out")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("view_id")).cast(LongType).as("view_id_sum"),
          sum(col("click_id")).cast(LongType).as("click_id_sum"))
        .orderBy(asc_nulls_first("user_id"))
    }),

    // X47B stream-stream LEFT OUTER interval join: unmatched views
    // must ALSO emit (with a NULL click) — which only happens when a
    // later batch's watermark proves them unmatched, hence the
    // sentinel staging (see stageEventsWithSentinel). The aggregated
    // result must hash-match the complete batch left join replayed by
    // the oracle: unmatched counts included, so dropped-or-spurious
    // nulls cannot hide.
    "x47b_stream_outer_join" -> ((s, d) => {
      val staged = stageEventsWithSentinel(s, d)
      withStreamPartitions(s, 4) {
        withCheckpoint { ckpt =>
          val events = s.readStream
            .schema(graft.streaming.EventStreams.schema)
            .option("maxFilesPerTrigger", "1").parquet(staged)
          val q = graft.streaming.EventStreams
            .viewClickJoin(events, 60, joinType = "left_outer")
            .writeStream.outputMode("append").format("memory")
            .queryName("x47b_out").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          awaitGate(q)
        }
      }
      s.table("x47b_out").where(col("user_id") >= 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("click_id").isNull, 1L).otherwise(0L))
            .cast(LongType).as("n_unmatched"),
          sum(col("view_id")).cast(LongType).as("view_id_sum"),
          coalesce(sum(col("click_id")), lit(0L))
            .cast(LongType).as("click_id_sum"))
        .orderBy(asc_nulls_first("user_id"))
    }),

    // X42 [ST5] the custom keyed state machine through the gate:
    // flatMapGroupsWithState running per-user totals in Update mode.
    // Each snapshot's n strictly grows per user, so max(struct(n,
    // total)) picks the FINAL state even when multiple micro-batches
    // emit intermediate snapshots — the batch GROUP BY oracle applies
    // regardless of batch boundaries.
    "x42_stream_totals" -> ((s, d) => {
      import s.implicits._
      val staged = stageEvents(s, d)
      withStreamPartitions(s, 4) {
        withCheckpoint { ckpt =>
          val events = s.readStream
            .schema(graft.streaming.EventStreams.schema).parquet(staged)
            .as[graft.streaming.EventStreams.Event]
          val q = graft.streaming.EventStreams.runningTotals(events)
            .toDF().writeStream.outputMode("update").format("memory")
            .queryName("x42_out").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          awaitGate(q)
        }
      }
      s.table("x42_out")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n"), col("total"))).as("last"))
        .select(col("user_id"), col("last.n").as("n"),
          round(col("last.total"), 2).as("total"))
        .orderBy(asc_nulls_first("user_id"))
    }),

    // X41 small-file compaction: fragment a copy of documents into 40
    // files, compact to ~1 MB targets, and prove the data survived the
    // atomic swap byte-for-byte (count + key/char sums against the
    // ORIGINAL table's oracle). files_shrank pins that compaction
    // actually reduced the file count, not just rewrote.
    "x41_compaction" -> ((s, d) => {
      import s.implicits._
      val fragRoot = java.nio.file.Files.createTempDirectory("graft_frag")
      try {
        val frag = fragRoot.toString + "/docs"
        // fragment ONLY the audited columns: compaction mechanics
        // (listing, distributed rewrite, atomic swap) are
        // column-width-independent, so dragging the heavy `text`
        // column through the 3-pass rewrite would buy the gate
        // nothing but wall-clock (~20x the bytes)
        t(s, d, "documents").select(col("doc_id"), col("n_chars"))
          .repartition(40).write.mode("overwrite").parquet(frag)
        // scale the compaction target with the measured table size so
        // files_shrank holds at EVERY sf (a fixed 1 MB target stops
        // shrinking once the table passes ~40 MB): target ≈ bytes/10
        // → ~10 output files, always fewer than the 40 fragments.
        val fragBytes = new java.io.File(frag).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.length()).sum
        val stats = graft.catalog.Catalog.compact(s, frag,
          targetFileBytes = math.max(1L << 20, fragBytes / 10 + 1))
        // materialize the 1-row audit eagerly so the staged copy can be
        // deleted here instead of leaking one fixture-sized dir per
        // invocation (the returned frame must not read the dir later)
        val r = s.read.parquet(frag)
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id")).cast(LongType).as("id_sum"),
            sum(col("n_chars")).cast(LongType).as("char_sum"))
          .head()
        Seq((r.getLong(0), r.getLong(1), r.getLong(2),
          stats.filesAfter < stats.filesBefore))
          .toDF("n", "id_sum", "char_sum", "files_shrank")
      } finally rmTree(fragRoot.toFile)
    }),

    // X41b compaction over a HIVE-PARTITIONED layout (the reference's
    // DAY-partitioned tables are the layout that fragments): fragment
    // a source=… partitioned copy of documents (~10 files per
    // partition), compact per-partition, and prove both the byte-for-
    // byte survival of the data INCLUDING the partition column (its
    // values live in dir names the per-partition swap must not touch)
    // and the file-count shrink.
    "x41b_compaction_partitioned" -> ((s, d) => {
      import s.implicits._
      val fragRoot = java.nio.file.Files.createTempDirectory("graft_fragp")
      try {
        val frag = fragRoot.toString + "/docs"
        // audited columns only (see x41): the per-leaf swap/audit
        // properties are independent of the dropped `text` bytes
        t(s, d, "documents").select(col("doc_id"), col("source"))
          .repartition(10)
          .write.partitionBy("source").mode("overwrite").parquet(frag)
        val fragBytes = {
          def walk(f: java.io.File): Long =
            if (f.isFile) (if (f.getName.endsWith(".parquet")) f.length else 0L)
            else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
          walk(new java.io.File(frag))
        }
        val stats = graft.catalog.Catalog.compactPartitioned(s, frag,
          targetFileBytes = math.max(1L << 20, fragBytes / 10 + 1))
        // per-SOURCE audit: reading through the root must still
        // discover the source=… values (they live in dir names the
        // swap must preserve), and per-source count/id_sum pin that
        // no row changed partitions during the rewrite. Materialized
        // eagerly so the staged copy can be deleted here.
        val rows = s.read.parquet(frag)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id")).cast(LongType).as("id_sum"))
          .orderBy(asc_nulls_first("source"))
          .collect()
        val shrank = stats.filesAfter < stats.filesBefore
        rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2), shrank))
          .toDF("source", "n", "id_sum", "files_shrank")
      } finally rmTree(fragRoot.toFile)
    }),

    // X24 deterministic train/val/test split (md5 hex buckets —
    // map-only, engine-portable, stable under corpus growth; the
    // oracle derives the identical assignment from the same
    // generated CASE expression)
    "x24_hash_split" -> ((s, d) => {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      graft.operators.Splits.hashSplit(t(s, d, "documents"), "doc_id", splits, "v1")
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).cast("long").as("min_id"),
          max(col("doc_id")).cast("long").as("max_id"))
        .orderBy(asc_nulls_first("split"))
    }),

    // X23 [A6 UDAF] mean-pooled embedding per label (class prototype)
    // through the VectorMean Aggregator — buffer is one vector+count,
    // so the shuffle carries one partial row per (partition, label)
    // instead of N·dim exploded rows. Elements pre-rounded with the
    // explicit half-up formula and fixed-formatted on both sides so
    // the array canonicalization is engine-exact.
    "x23_vector_mean" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val canon = (x: Column) =>
        format_string("%.4f", floor(x * 10000 + lit(0.5)) / 10000)
      emb.select(col("label"), Sim.asDouble(col("embedding")).as("v"))
        .groupBy("label")
        .agg(graft.functions.VectorAgg.meanVec(col("v")).as("mv"),
          count(lit(1)).cast("long").as("n"))
        .select(col("label").cast("long").as("label"),
          array_join(transform(col("mv"), canon), ",").as("mean_vec"),
          col("n"))
        .orderBy(asc_nulls_first("label"))
    }),

    // X21 [A6 UDAF] the same kNN ranking as x05, but through the
    // bounded-heap Aggregator UDAF instead of a row_number window —
    // map-side partial top-k, so only ≤k rows per (partition, query)
    // reach the shuffle. Checked against the identical window oracle.
    "x21_topk_udaf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(graft.expressions.NativeVector.cosineSim(col("qv"), col("cv")), 4)
            .as("sim"))
      val tk = graft.functions.TopKAgg.topK(5)
      scored.groupBy("query_id")
        .agg(tk(col("neighbor_id"), col("sim")).as("topk"))
        .select(col("query_id"), posexplode(col("topk")))
        .select(col("query_id"), col("col.id").as("neighbor_id"),
          col("col.score").as("sim"), (col("pos") + 1).cast("long").as("rnk"))
        .orderBy(asc_nulls_first("query_id"), asc_nulls_first("rnk"))
    })
  )

  /** DuckDB list literal from a Scala word list (single source of
    * truth: the oracle uses the same stopword constants as the Spark
    * expressions). */
  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared oracle CTE: lowercased whitespace tokens per document
    * (mirrors [[Text.tokens]]). */
  private val tokCte =
    """tok AS (
         SELECT doc_id, text,
                list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '') AS ts
         FROM documents)"""

  /** Shared oracle CTE chain: per-document code-point Shannon entropy,
    * rounded to 4 dp (mirrors [[Text.charEntropy]]: p·ln(p)/ln(2) in
    * double, summed over the code-point frequency table). */
  private val entCte =
    """ch AS (
         SELECT doc_id, length(text) AS total,
                unnest(list_transform(range(1, length(text) + 1),
                       i -> substr(text, CAST(i AS INT), 1))) AS c
         FROM documents WHERE length(text) > 0),
       cc AS (SELECT doc_id, total, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2, 3),
       ent AS (
         SELECT doc_id,
                ROUND(-SUM((CAST(cnt AS DOUBLE) / total) *
                           (ln(CAST(cnt AS DOUBLE) / total) / ln(2))), 4) AS entropy
         FROM cc GROUP BY doc_id)"""

  private val punctCte =
    """pr AS (
         SELECT doc_id,
                CASE WHEN length(text) > 0 THEN
                  ROUND(CAST(length(text) -
                             length(regexp_replace(text, '[.,!?;:''"()\[\]{}-]', '', 'g'))
                        AS DOUBLE) / length(text), 4)
                ELSE 0.0 END AS punct_ratio
         FROM documents)"""

  /** Brute-force cosine top-5 oracle — shared by x05 (window ranking)
    * and x21 (Aggregator-UDAF ranking), which must agree exactly. */
  private val knnOracleSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       pairs AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                ROUND(list_inner_product(q.e, c.e) /
                      (sqrt(list_inner_product(q.e, q.e)) *
                       sqrt(list_inner_product(c.e, c.e))), 4) AS sim
         FROM v q, v c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
       SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rnk FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id) AS rnk FROM pairs) t
       WHERE rnk <= 5
       ORDER BY query_id NULLS FIRST, rnk NULLS FIRST"""

  /** Shared oracle CTE chain: the Gopher-style curation signal and
    * rule evaluation (bigrams → repetition, duplicate lines, composite
    * `rs` with reason list). Used by x19 and the x25 pipeline. */
  private val curationRulesCte =
    """bg AS (
         SELECT doc_id, len(ts) AS total,
                unnest(list_transform(range(1, len(ts)),
                       i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1])) AS b
         FROM tok WHERE len(ts) >= 2),
       bc AS (SELECT doc_id, total, MAX(cnt) AS maxc
              FROM (SELECT doc_id, total, b, COUNT(*) AS cnt FROM bg GROUP BY 1, 2, 3)
              GROUP BY 1, 2),
       tb AS (SELECT doc_id,
                     ROUND(LEAST(1.0, CAST(maxc * 2 AS DOUBLE) / total), 4) AS top_bigram_frac
              FROM bc),
       dl AS (
         SELECT doc_id,
                CASE WHEN len(lines) > 0 THEN
                  ROUND(1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines), 4)
                ELSE 0.0 END AS dup_line_frac
         FROM (SELECT doc_id,
                      list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
               FROM documents)),
       sig AS (
         SELECT tok.doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
                COALESCE(ent.entropy, 0.0) AS entropy,
                COALESCE(tb.top_bigram_frac, 0.0) AS top_bigram_frac,
                dl.dup_line_frac, pr.punct_ratio
         FROM tok
         LEFT JOIN ent USING (doc_id) LEFT JOIN tb USING (doc_id)
         JOIN dl USING (doc_id) JOIN pr USING (doc_id)),
       rs AS (
         SELECT *,
                list_filter([
                  CASE WHEN n_tok < 10 THEN 'too_short' END,
                  CASE WHEN n_tok > 100000 THEN 'too_long' END,
                  CASE WHEN entropy < 1.5 THEN 'low_entropy' END,
                  CASE WHEN top_bigram_frac > 0.2 THEN 'repetitive_ngrams' END,
                  CASE WHEN dup_line_frac > 0.3 THEN 'duplicate_lines' END,
                  CASE WHEN punct_ratio > 0.25 THEN 'punct_noise' END],
                  x -> x IS NOT NULL) AS reasons
         FROM sig)"""

  /** Shared by x43 and x43b: the sharded two-level cumsum is
    * output-identical to the single-window form, so both gate against
    * the same SQL. */
  private val tokenBudgetOracleSql: String =
    """WITH tk AS (
         SELECT doc_id, source,
                CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '')) AS BIGINT) AS nt
         FROM documents),
       b AS (
         SELECT * FROM tk
         QUALIFY SUM(nt) OVER (PARTITION BY source
           ORDER BY substr(md5('tb1' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         <= CASE WHEN source = 'src0' THEN 700
                 WHEN source = 'src1' THEN 200
                 WHEN source = 'src2' THEN 0
                 ELSE 600 END)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(nt) AS BIGINT) AS tok
       FROM b GROUP BY source ORDER BY source NULLS FIRST"""

  private def extOracleSql: Map[String, String] = Map(
    "x01_dedup_exact" ->
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents
         GROUP BY text ORDER BY doc_id NULLS FIRST""",
    // fingerprint groups ≡ equality of the normalized token stream:
    // lowercase, collapse whitespace runs, trim (collision-free at
    // fixture scale by construction of the 64-bit hash chain)
    "x02_dedup_fingerprint" ->
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_dups
         FROM documents
         GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
         ORDER BY doc_id NULLS FIRST""",
    "x07_lang_id" -> {
      val scores = Text.stopwordSets.map { case (lang, ws) =>
        s"len(list_intersect(list_distinct(ts), ${sqlList(ws)})) AS s_$lang"
      }.mkString(",\n                ")
      val langsDesc = Text.stopwordSets.map(_._1).sorted.reverse
      val mx = Text.stopwordSets.map(s => "s_" + s._1).mkString("GREATEST(", ", ", ")")
      val pick = langsDesc.init.map(l => s"WHEN s_$l = $mx THEN '$l'")
        .mkString("\n                ") + s"\n                ELSE '${langsDesc.last}'"
      s"""WITH $tokCte,
         sc AS (SELECT doc_id, text,
                $scores
                FROM tok)
         SELECT doc_id,
           CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                WHEN $mx = 0 THEN 'und'
                $pick END AS lang_pred
         FROM sc ORDER BY doc_id NULLS FIRST"""
    },
    "x08_quality_score" ->
      s"""WITH $tokCte,
         $entCte,
         $punctCte,
         sr AS (
           SELECT doc_id, len(ts) AS n_tok,
                  CASE WHEN len(ts) > 0 THEN
                    ROUND(CAST(len(list_filter(ts,
                          t -> list_contains(${sqlList(Text.enStopwords)}, t)))
                      AS DOUBLE) / len(ts), 4)
                  ELSE 0.0 END AS stopword_ratio
           FROM tok)
         SELECT d.doc_id, pr.punct_ratio, sr.stopword_ratio,
                COALESCE(ent.entropy, 0.0) AS entropy,
                ROUND(
                  LEAST(CASE WHEN sr.n_tok BETWEEN 20 AND 5000 THEN 1.0
                             WHEN sr.n_tok > 0 THEN sr.n_tok / 20.0
                             ELSE 0.0 END, 1.0) * 0.4 +
                  (1.0 - LEAST(pr.punct_ratio * 5.0, 1.0)) * 0.3 +
                  LEAST(sr.stopword_ratio * 4.0, 1.0) * 0.3, 4) AS quality
         FROM documents d
         JOIN pr USING (doc_id) JOIN sr USING (doc_id)
         LEFT JOIN ent USING (doc_id)
         ORDER BY doc_id NULLS FIRST""",
    "x19_curation" ->
      s"""WITH $tokCte,
         $entCte,
         $punctCte,
         $curationRulesCte
         SELECT doc_id, n_tok, entropy, top_bigram_frac, dup_line_frac,
                CAST(to_json(reasons) AS VARCHAR) AS drop_reasons,
                len(reasons) = 0 AS keep
         FROM rs ORDER BY doc_id NULLS FIRST""",
    // the full training-data pipeline, one oracle: curation keepers →
    // all-pairs exact-Jaccard near-dup components (restricted to the
    // keepers) → survivors → hash split → chunk/token budget per split
    "x25_training_pipeline" -> {
      val splitExpr = graft.operators.Splits.splitSql(
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "v1")
      s"""WITH RECURSIVE $tokCte,
         $entCte,
         $punctCte,
         $curationRulesCte,
         keepers AS (SELECT doc_id FROM rs WHERE len(reasons) = 0),
         kd AS (SELECT d.doc_id, d.text FROM documents d JOIN keepers USING (doc_id)),
         sh AS (
           SELECT doc_id AS id,
                  list_distinct(list_transform(range(1, length(text) - 3),
                    i -> substr(lower(text), CAST(i AS INT), 5))) AS s
           FROM kd WHERE length(text) >= 5),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b
           FROM sh a, sh b WHERE a.id < b.id
             AND ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                       len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.5),
         e AS (SELECT id_a AS s, id_b AS r FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT s AS id, r FROM e
           UNION
           SELECT reach.id, e.r FROM reach JOIN e ON e.s = reach.r),
         comp AS (SELECT id, LEAST(id, MIN(r)) AS c FROM reach GROUP BY id),
         survivors AS (
           SELECT doc_id FROM kd
           WHERE doc_id NOT IN (SELECT id FROM comp WHERE c < id)),
         fin AS (
           SELECT $splitExpr AS split, len(ts) AS n,
                  CASE WHEN len(ts) = 0 THEN 0
                       WHEN len(ts) <= 80 THEN 1
                       ELSE 1 + CAST(ceil(CAST(len(ts) - 80 AS DOUBLE) / 60) AS INT)
                  END AS c
           FROM survivors JOIN tok USING (doc_id))
         SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(c) AS BIGINT) AS n_chunks,
                CAST(SUM(n) AS BIGINT) AS n_tokens
         FROM fin GROUP BY 1 ORDER BY split NULLS FIRST"""
    },
    // all-pairs exact char-5-gram Jaccard ≥ 0.5 → recursive-CTE
    // connected components → survivors = docs that are not a non-min
    // member of any component (LSH recall at the fixture's j≥0.9 dup
    // pairs is ~1, so candidate banding loses nothing — verified here)
    "x20_dedup_pipeline" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id AS id,
                  list_distinct(list_transform(range(1, length(text) - 3),
                    i -> substr(lower(text), CAST(i AS INT), 5))) AS s
           FROM documents WHERE length(text) >= 5),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b
           FROM sh a, sh b WHERE a.id < b.id
             AND ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                       len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.5),
         e AS (SELECT id_a AS s, id_b AS r FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT s AS id, r FROM e
           UNION
           SELECT reach.id, e.r FROM reach JOIN e ON e.s = reach.r),
         comp AS (SELECT id, LEAST(id, MIN(r)) AS c FROM reach GROUP BY id)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT id FROM comp WHERE c < id)
         ORDER BY doc_id NULLS FIRST""",
    "x05_knn_cosine" -> knnOracleSql,
    // same oracle by design: the UDAF must reproduce the window result
    "x21_topk_udaf" -> knnOracleSql,
    "x24_hash_split" -> {
      val splitExpr = graft.operators.Splits.splitSql(
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "v1")
      s"""SELECT $splitExpr AS split, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MIN(doc_id) AS BIGINT) AS min_id,
                 CAST(MAX(doc_id) AS BIGINT) AS max_id
          FROM documents GROUP BY 1 ORDER BY split NULLS FIRST"""
    },
    "x23_vector_mean" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         u AS (SELECT label,
                 unnest(list_transform(range(1, len(v) + 1),
                   i -> {'p': i, 'x': v[CAST(i AS INT)]})) AS s
               FROM e),
         a AS (SELECT label, s.p AS p, avg(s.x) AS m FROM u GROUP BY 1, 2),
         l AS (SELECT label,
                 list(printf('%.4f', floor(m * 10000 + 0.5) / 10000) ORDER BY p) AS mv
               FROM a GROUP BY 1),
         c AS (SELECT label, COUNT(*) AS n FROM e GROUP BY 1)
         SELECT CAST(l.label AS BIGINT) AS label,
                array_to_string(l.mv, ',') AS mean_vec,
                CAST(c.n AS BIGINT) AS n
         FROM l JOIN c USING (label)
         ORDER BY label NULLS FIRST""",
    // 80-token windows, step 60: chunk count = 1 if n<=80 else
    // 1+ceil((n-80)/60); chunk k covers tokens [k*60+1, min(k*60+80,n)]
    "x22_chunking" ->
      """WITH tk AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
           FROM documents),
         cc AS (
           SELECT doc_id, ts, len(ts) AS n,
                  CASE WHEN len(ts) = 0 THEN 0
                       WHEN len(ts) <= 80 THEN 1
                       ELSE 1 + CAST(ceil(CAST(len(ts) - 80 AS DOUBLE) / 60) AS INT)
                  END AS c
           FROM tk),
         ch AS (SELECT doc_id, unnest(range(c)) AS k, ts, n FROM cc WHERE c > 0),
         ck AS (
           SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
                  array_to_string(ts[CAST(k*60+1 AS INT) :
                                     CAST(least(k*60+80, n) AS INT)], ' ') AS chunk
           FROM ch)
         SELECT doc_id, chunk_id,
                CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tok, chunk
         FROM ck
         ORDER BY doc_id NULLS FIRST, chunk_id NULLS FIRST""",
    // replay of Multimodal.syntheticAssets(200): every decoded field
    // is pure arithmetic on the asset index i (width 64+(i%8)*16,
    // frames 24+i%10 for every third asset else 1, byte_len = 6-byte
    // stub header + 32-byte payload), and sampleFrames(stride=8)
    // yields floor((frames-1)/8)+1 samples per asset
    "x17_multimodal" ->
      """WITH a AS (
           SELECT i,
                  ['image','audio','video'][CAST(i % 3 AS INT) + 1] AS modality,
                  64 + (i % 8) * 16 AS width,
                  CASE WHEN i % 3 = 2 THEN 24 + i % 10 ELSE 1 END AS n_frames,
                  38 AS byte_len
           FROM (SELECT unnest(range(200)) AS i)),
         s AS (SELECT CAST(SUM(CAST(FLOOR((n_frames - 1) / 8.0) AS BIGINT) + 1)
                      AS BIGINT) AS sampled_frames FROM a)
         SELECT modality, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(byte_len) AS BIGINT) AS bytes,
                CAST(MAX(width) AS BIGINT) AS max_w,
                CAST(SUM(n_frames) AS BIGINT) AS frames,
                s.sampled_frames
         FROM a, s GROUP BY modality, s.sampled_frames
         ORDER BY modality NULLS FIRST""",
    // replay of Multimodal.syntheticImageAssets(64): the engine must
    // recover these dims by really parsing the PNG/JPEG/GIF/BMP
    // headers it encoded — the oracle re-derives them from the index arithmetic
    // (width 16+(i%8)*4, height 12+(i%5)*4, still images = 1 frame)
    "x44_image_decode" ->
      """SELECT i AS asset_id,
                CAST(16 + (i % 8) * 4 AS BIGINT) AS width,
                CAST(12 + (i % 5) * 4 AS BIGINT) AS height,
                CAST(1 AS BIGINT) AS n_frames
         FROM (SELECT unnest(range(64)) AS i)
         ORDER BY asset_id NULLS FIRST""",
    // Okapi BM25 replay: same tokenizer as x15/x43, same smoothed
    // Robertson idf and k1=1.2 / b=0.75 saturation; 2-decimal rounded
    // score as the selection key (coarse grid — engines sum the float
    // contributions in different orders)
    "x46_bm25_topk" ->
      """WITH tk AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '') AS ts
           FROM documents),
         stats AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  AVG(CAST(len(ts) AS DOUBLE)) AS avgdl FROM tk),
         f AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl,
                      unnest(ts) AS term FROM tk),
         tf AS (
           SELECT doc_id, term, dl, CAST(COUNT(*) AS BIGINT) AS tf
           FROM f WHERE term IN ('window', 'column', 'scan')
           GROUP BY doc_id, term, dl),
         df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                FROM tf GROUP BY term),
         sc AS (
           SELECT tf.doc_id,
                  SUM(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)))
                    AS score
           FROM tf JOIN df USING (term), stats s
           GROUP BY tf.doc_id)
         SELECT doc_id, ROUND(score, 2) AS score FROM sc
         ORDER BY ROUND(score, 2) DESC, doc_id NULLS FIRST LIMIT 10""",
    // replay of the x49 TransferRequest construction straight from
    // orders: the Kafka-shaped produce/poll/decode round trip must be
    // lossless and duplicate-free for the aggregate to hash-match
    "x49_kafka_transfer" ->
      """WITH o AS (SELECT * FROM orders ORDER BY o_orderkey LIMIT 200)
         SELECT substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) AS month,
                COUNT(*) AS n_files,
                CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_remove
         FROM o GROUP BY 1 ORDER BY month NULLS FIRST""",
    // same replay as x49 — the streaming consumer (readStream +
    // foreachBatch + commitPolled) must deliver the identical
    // lossless, duplicate-free aggregate
    "x49b_kafka_stream" ->
      """WITH o AS (SELECT * FROM orders ORDER BY o_orderkey LIMIT 200)
         SELECT substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7) AS month,
                COUNT(*) AS n_files,
                CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_remove
         FROM o GROUP BY 1 ORDER BY month NULLS FIRST""",
    // exact all-pairs replay of the incremental dedup: cross-drop vs
    // the corpus, then x20's recursive-CTE components over survivors
    "x50_incremental_dedup" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id AS id,
                  list_distinct(list_transform(range(1, length(text) - 3),
                    i -> substr(lower(text), CAST(i AS INT), 5))) AS s
           FROM documents WHERE length(text) >= 5),
         bsh AS (SELECT * FROM sh WHERE id >= 300 AND id < 800),
         csh AS (SELECT * FROM sh WHERE id < 300),
         cross_drop AS (
           SELECT DISTINCT b.id
           FROM bsh b, csh c
           WHERE ROUND(CAST(len(list_intersect(b.s, c.s)) AS DOUBLE) /
                       len(list_distinct(list_concat(b.s, c.s))), 4) >= 0.5),
         surv AS (SELECT * FROM bsh
                  WHERE id NOT IN (SELECT id FROM cross_drop)),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b
           FROM surv a, surv b WHERE a.id < b.id
             AND ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                       len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.5),
         e AS (SELECT id_a AS s, id_b AS r FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT s AS id, r FROM e
           UNION
           SELECT reach.id, e.r FROM reach JOIN e ON e.s = reach.r),
         comp AS (SELECT id, LEAST(id, MIN(r)) AS c FROM reach GROUP BY id)
         SELECT doc_id FROM documents
         WHERE doc_id >= 300 AND doc_id < 800
           AND doc_id NOT IN (SELECT id FROM cross_drop)
           AND doc_id NOT IN (SELECT id FROM comp WHERE c < id)
         ORDER BY doc_id NULLS FIRST""",
    // relational replay of the physical MERGE: full outer join on the
    // key, update-row-wins on every non-key column
    "x51_merge_upsert" ->
      """WITH rev AS (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS rev
                      FROM orders GROUP BY o_custkey),
         upd AS (SELECT o_custkey AS k,
                        'upd_' || CAST(o_custkey AS VARCHAR) AS nm, rev
                 FROM rev WHERE o_custkey % 3 = 0
                 UNION ALL
                 SELECT o_custkey + 1000000,
                        'new_' || CAST(o_custkey AS VARCHAR), rev
                 FROM rev WHERE o_custkey % 7 = 0)
         SELECT COALESCE(u.k, c.c_custkey) AS c_custkey,
                CASE WHEN u.k IS NOT NULL THEN u.nm ELSE c.c_name END AS c_name,
                CASE WHEN u.k IS NOT NULL THEN u.rev
                     ELSE ROUND(c.c_acctbal, 2) END AS c_acctbal
         FROM customer c FULL OUTER JOIN upd u ON c.c_custkey = u.k
         ORDER BY c_custkey NULLS FIRST""",
    // relational replay of the PARTITION-SCOPED merge: the partition
    // column joins as part of the merge identity, so a key only
    // matches within its own partition — exactly what rewriting only
    // touched leaves implements physically
    "x51b_merge_partitioned" ->
      """WITH rev AS (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS rev
                      FROM orders GROUP BY o_custkey),
         upd AS (SELECT c.c_custkey AS k,
                        'upd_' || CAST(r.o_custkey AS VARCHAR) AS nm,
                        r.rev, c.c_mktsegment AS seg
                 FROM rev r JOIN customer c ON c.c_custkey = r.o_custkey
                 WHERE r.o_custkey % 3 = 0
                 UNION ALL
                 SELECT o_custkey + 1000000,
                        'new_' || CAST(o_custkey AS VARCHAR), rev, 'SYNTHETIC'
                 FROM rev WHERE o_custkey % 7 = 0)
         SELECT COALESCE(u.k, c.c_custkey) AS c_custkey,
                CASE WHEN u.k IS NOT NULL THEN u.nm ELSE c.c_name END AS c_name,
                CASE WHEN u.k IS NOT NULL THEN u.rev
                     ELSE ROUND(c.c_acctbal, 2) END AS c_acctbal,
                COALESCE(u.seg, c.c_mktsegment) AS c_mktsegment
         FROM customer c
         FULL OUTER JOIN upd u ON c.c_custkey = u.k AND c.c_mktsegment = u.seg
         ORDER BY c_custkey NULLS FIRST""",
    // replay of Multimodal.syntheticVideoAssets(64): the engine must
    // recover these from really walking the AVI RIFF tree it encoded
    "x48_video_decode" ->
      """SELECT i AS asset_id,
                CAST(16 + (i % 6) * 4 AS BIGINT) AS width,
                CAST(12 + (i % 4) * 4 AS BIGINT) AS height,
                CAST(6 + (i % 5) * 3 AS BIGINT) AS n_frames
         FROM (SELECT unnest(range(64)) AS i)
         ORDER BY asset_id NULLS FIRST""",
    // replay of Multimodal.syntheticMjpegAssets(64): the container
    // advertises nothing, so matching proves the engine read the
    // JPEG SOF markers and counted '00dc' chunks in the stream
    "x48b_mjpeg_decode" ->
      """SELECT i AS asset_id,
                CAST(16 + (i % 6) * 4 AS BIGINT) AS width,
                CAST(12 + (i % 4) * 4 AS BIGINT) AS height,
                CAST(4 + (i % 3) * 2 AS BIGINT) AS n_frames
         FROM (SELECT unnest(range(64)) AS i)
         ORDER BY asset_id NULLS FIRST""",
    // replay of Multimodal.syntheticMp4Assets(64): matching proves the
    // engine walked the ISO-BMFF box tree it encoded — tkhd 16.16
    // dims, stsz sample count, stsd codec id, mvhd duration
    "x48c_mp4_metadata" ->
      """SELECT i AS asset_id,
                CAST(16 + (i % 6) * 4 AS BIGINT) AS width,
                CAST(12 + (i % 4) * 4 AS BIGINT) AS height,
                CAST(5 + (i % 4) * 3 AS BIGINT) AS n_frames,
                ['avc1', 'hev1', 'vp09', 'mp4v'][CAST(i % 4 AS INT) + 1] AS codec,
                CAST((5 + (i % 4) * 3) * 40 AS BIGINT) AS duration_ms
         FROM (SELECT unnest(range(64)) AS i)
         ORDER BY asset_id NULLS FIRST""",
    // replay of Multimodal.syntheticMp3Assets(64): matching proves
    // the engine skipped the ID3v2 tag and walked the MPEG frame
    // headers (1152 PCM samples per Layer III frame)
    "x45b_mp3_decode" ->
      """SELECT i AS asset_id,
                CAST([44100, 48000, 32000][CAST(i % 3 AS INT) + 1]
                     AS BIGINT) AS sample_rate,
                CAST(1 + (i % 2) AS BIGINT) AS channels,
                CAST((10 + (i % 5) * 4) * 1152 AS BIGINT) AS n_frames
         FROM (SELECT unnest(range(64)) AS i)
         ORDER BY asset_id NULLS FIRST""",
    // replay of Multimodal.syntheticFlacAssets(64): matching proves
    // the engine unpacked the STREAMINFO bit fields
    "x45c_flac_decode" ->
      """SELECT i AS asset_id,
                CAST([44100, 48000, 96000][CAST(i % 3 AS INT) + 1]
                     AS BIGINT) AS sample_rate,
                CAST(1 + (i % 2) AS BIGINT) AS channels,
                CAST(1000 + (i % 7) * 500 AS BIGINT) AS n_frames
         FROM (SELECT unnest(range(64)) AS i)
         ORDER BY asset_id NULLS FIRST""",
    // replay of Multimodal.syntheticWebmAssets(64): matching proves
    // the engine walked the EBML tree it encoded — PixelWidth/Height,
    // CodecID, Duration × TimecodeScale, SimpleBlock count
    "x48d_webm_metadata" ->
      """SELECT i AS asset_id,
                CAST(16 + (i % 6) * 4 AS BIGINT) AS width,
                CAST(12 + (i % 4) * 4 AS BIGINT) AS height,
                CAST(3 + (i % 5) * 2 AS BIGINT) AS n_frames,
                ['V_VP8', 'V_VP9', 'V_AV1'][CAST(i % 3 AS INT) + 1] AS codec,
                CAST((3 + (i % 5) * 2) * 40 AS BIGINT) AS duration_ms
         FROM (SELECT unnest(range(64)) AS i)
         ORDER BY asset_id NULLS FIRST""",
    // replay of Multimodal.syntheticAudioAssets(64): the engine must
    // recover these from really parsing the WAV headers it encoded
    "x45_audio_decode" ->
      """SELECT i AS asset_id,
                CAST([8000, 11025, 16000, 22050][CAST(i % 4 AS INT) + 1]
                     AS BIGINT) AS sample_rate,
                CAST(1 + (i % 2) AS BIGINT) AS channels,
                CAST(500 + (i % 7) * 250 AS BIGINT) AS n_frames
         FROM (SELECT unnest(range(64)) AS i)
         ORDER BY asset_id NULLS FIRST""",
    // full-equality audit over synthetic signatures: DuckDB recomputes
    // the same deterministic sigs and the exact Hamming pair set
    "x04_simhash_pairs" ->
      """WITH g AS (SELECT unnest(range(64)) AS id),
         s AS (SELECT id,
           xor(xor(xor(
             xor((id // 4) * 2654435761, ((id // 4) * 40503) << 20),
             CASE WHEN id % 4 > 0 THEN 1::BIGINT << CAST(((id // 4) * 7 + 5) % 62 + 1 AS INT) ELSE 0 END),
             CASE WHEN id % 4 > 1 THEN 1::BIGINT << CAST(((id // 4) * 7 + 22) % 62 + 1 AS INT) ELSE 0 END),
             CASE WHEN id % 4 > 2 THEN 1::BIGINT << CAST(((id // 4) * 7 + 39) % 62 + 1 AS INT) ELSE 0 END) AS sig
          FROM g)
         SELECT a.id AS id_a, b.id AS id_b,
                CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         FROM s a, s b
         WHERE a.id < b.id AND bit_count(xor(a.sig, b.sig)) <= 3
         ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""",
    // recall audit vs the exact top-k the x05 oracle already verifies:
    // oracle recomputes the exact pair count and pins the recall bound
    "x14_ivf_knn" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         pairs AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_inner_product(q.e, c.e) /
                        (sqrt(list_inner_product(q.e, q.e)) *
                         sqrt(list_inner_product(c.e, c.e))), 4) AS sim
           FROM v q, v c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
         topk AS (
           SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rnk FROM pairs) t
           WHERE rnk <= 5)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
         FROM topk""",
    "x14b_ivf_clustered_recall" ->
      """WITH g AS (SELECT unnest(range(96)) AS id),
         v AS (SELECT id, list_transform(range(16), j ->
                 CAST((id // 8) * 31 + j * 7 AS BIGINT) % 13 - 6 +
                 (CAST(id * 13 + j * 5 AS BIGINT) % 7 - 3) / 1024.0) AS e
               FROM g),
         pairs AS (
           SELECT q.id AS query_id, c.id AS neighbor_id,
                  ROUND(list_inner_product(q.e, c.e) /
                        (sqrt(list_inner_product(q.e, q.e)) *
                         sqrt(list_inner_product(c.e, c.e))), 4) AS sim
           FROM v q, v c WHERE q.id < 10 AND c.id <> q.id),
         topk AS (
           SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rnk FROM pairs) t
           WHERE rnk <= 5)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
         FROM topk""",
    // containment audits: the oracle recomputes the exact pair count
    // (the approximate operators' design target) and pins missed = 0
    "x26_lsh_recall" ->
      """WITH sh AS (
           SELECT doc_id AS id,
                  list_distinct(list_transform(range(1, length(text) - 3),
                    i -> substr(lower(text), CAST(i AS INT), 5))) AS s
           FROM documents WHERE doc_id < 200 AND length(text) >= 5),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b,
                  ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                        len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
           FROM sh a, sh b WHERE a.id < b.id)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
                CAST(0 AS BIGINT) AS missed_pairs
         FROM pairs WHERE jaccard >= 0.9""",
    "x27_srp_recall" ->
      """WITH g AS (SELECT unnest(range(60)) AS id),
         v AS (SELECT id, list_transform(range(16), j ->
                 CAST((id // 4) * 31 + j * 7 AS BIGINT) % 13 - 6 +
                 (CAST(id * 13 + j * 5 AS BIGINT) % 7 - 3) / 1024.0) AS e
               FROM g),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b,
                  ROUND(list_inner_product(a.e, b.e) /
                        (sqrt(list_inner_product(a.e, a.e)) *
                         sqrt(list_inner_product(b.e, b.e))), 6) AS sim
           FROM v a, v b WHERE a.id < b.id)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
                CAST(0 AS BIGINT) AS missed_pairs
         FROM pairs WHERE sim >= 0.999""",
    "x09_token_count" ->
      """SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok,
         CAST(list_sum(list_transform(
                list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
                x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword,
         CAST(length(text) AS BIGINT) AS n_chars_calc
         FROM documents ORDER BY doc_id NULLS FIRST""",
    "x11_asof_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, CAST(MAX(o_orderkey) AS BIGINT) AS o_orderkey
                    FROM orders GROUP BY o_custkey, o_orderdate)
         SELECT e.event_id, o.o_orderkey, o.o_orderdate
         FROM events e ASOF LEFT JOIN o
           ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
         ORDER BY e.event_id NULLS FIRST""",
    "x11b_asof_forward" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, CAST(MAX(o_orderkey) AS BIGINT) AS o_orderkey
                    FROM orders GROUP BY o_custkey, o_orderdate)
         SELECT e.event_id, o.o_orderkey, o.o_orderdate
         FROM events e ASOF LEFT JOIN o
           ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
         ORDER BY e.event_id NULLS FIRST""",
    "x18_stream_sessions" ->
      """WITH e AS (
           SELECT user_id, ts, value, event_id,
                  CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                       WHEN ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE THEN 1
                       ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid FROM e),
         sess AS (
           SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_last,
                  CAST(COUNT(*) AS BIGINT) AS n_events, ROUND(SUM(value), 2) AS v
           FROM s GROUP BY user_id, sid)
         SELECT user_id, session_start, n_events, v FROM sess
         WHERE session_last + INTERVAL 10 MINUTE <
               (SELECT MAX(ts) - INTERVAL 10 MINUTE FROM events)
         ORDER BY user_id NULLS FIRST, session_start NULLS FIRST""",
    "x28_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""",
    "x32_stream_enrich" ->
      """SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(e.value), 2) AS v
         FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
         GROUP BY n.n_name ORDER BY n.n_name NULLS FIRST""",
    "x31_pii_scrub" -> {
      val em = graft.functions.Text.emailRe
      val ip = graft.functions.Text.ipv4Re
      val ph = graft.functions.Text.phoneRe
      s"""WITH g AS (SELECT unnest(range(50)) AS i),
         r AS (SELECT i,
                 'user' || i || ' wrote from 10.0.' || (i % 256) || '.' ||
                 ((i * 7) % 256) || ' contact user' || i ||
                 '@example.com or call 555-123-' ||
                 lpad(CAST((i * 37) % 10000 AS VARCHAR), 4, '0') ||
                 ' about the weather' AS raw
               FROM g)
         SELECT i,
           regexp_replace(regexp_replace(regexp_replace(raw,
             '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g')
             AS clean,
           CAST(len(regexp_extract_all(raw, '$em')) AS BIGINT) AS emails,
           CAST(len(regexp_extract_all(regexp_replace(raw, '$em', '', 'g'),
             '$ip')) AS BIGINT) AS ips,
           CAST(len(regexp_extract_all(regexp_replace(regexp_replace(raw,
             '$em', '', 'g'), '$ip', '', 'g'), '$ph')) AS BIGINT) AS phones
         FROM r ORDER BY i NULLS FIRST"""
    },
    "x37_domain_mix" -> {
      val pred = graft.operators.Mixing.sampleSql("source", "doc_id",
        Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
        defaultRate = 0.02, salt = "mix1")
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MIN(doc_id) AS BIGINT) AS min_id,
                 CAST(MAX(doc_id) AS BIGINT) AS max_id
          FROM documents WHERE $pred
          GROUP BY source ORDER BY source NULLS FIRST"""
    },
    "x38_corpus_shuffle" ->
      """SELECT doc_id,
                md5('shuf1' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         FROM documents ORDER BY shuffle_key LIMIT 25""",
    "x43_token_budget" -> tokenBudgetOracleSql,
    // the sharded two-level form is output-identical by construction,
    // so it gates against the very same single-window oracle
    "x43b_token_budget_sharded" -> tokenBudgetOracleSql,
    "x42_stream_totals" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(SUM(value), 2) AS total
         FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""",
    // batch replay of the stream-stream interval join: inner joins
    // emit exactly the matching pairs, independent of batching
    "x47_stream_interval_join" ->
      """WITH p AS (
           SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
           FROM events v JOIN events c
             ON v.user_id = c.user_id
            AND v.event_type = 'view' AND c.event_type = 'click'
            AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 60 MINUTE)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                CAST(SUM(view_id) AS BIGINT) AS view_id_sum,
                CAST(SUM(click_id) AS BIGINT) AS click_id_sum
         FROM p GROUP BY user_id ORDER BY user_id NULLS FIRST""",
    "x47b_stream_outer_join" ->
      """WITH p AS (
           SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
           FROM (SELECT * FROM events WHERE event_type = 'view') v
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             ON v.user_id = c.user_id
            AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 60 MINUTE)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(SUM(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unmatched,
                CAST(SUM(view_id) AS BIGINT) AS view_id_sum,
                CAST(COALESCE(SUM(click_id), 0) AS BIGINT) AS click_id_sum
         FROM p GROUP BY user_id ORDER BY user_id NULLS FIRST""",
    "x41_compaction" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum,
                CAST(SUM(n_chars) AS BIGINT) AS char_sum,
                TRUE AS files_shrank
         FROM documents""",
    "x41b_compaction_partitioned" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum,
                TRUE AS files_shrank
         FROM documents GROUP BY source ORDER BY source NULLS FIRST""",
    "x39_domain_cap" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM (SELECT * FROM documents
               QUALIFY row_number() OVER (PARTITION BY source
                 ORDER BY substr(md5('cap1' || CAST(doc_id AS VARCHAR)), 1, 8),
                          doc_id) <= 10)
         GROUP BY source ORDER BY source NULLS FIRST""",
    "x40_domain_epochs" -> {
      val (maxEpochs, pred) = graft.operators.Mixing.epochsSql(
        "source", "doc_id",
        Seq("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4),
        defaultFactor = 1.0, salt = "rep1")
      s"""SELECT source, CAST(epoch AS BIGINT) AS epoch,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(doc_id) AS BIGINT) AS id_sum
          FROM documents
          CROSS JOIN (SELECT unnest(range(0, $maxEpochs)) AS epoch) e
          WHERE $pred
          GROUP BY source, epoch
          ORDER BY source NULLS FIRST, epoch NULLS FIRST"""
    },
    "x36_seq_packing" -> {
      val splitExpr = graft.operators.Splits.splitSql(
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "v1")
      val shardExpr = graft.operators.Packing.shardSql("doc_id", 16, "pack")
      s"""WITH tk AS (
           SELECT doc_id, $splitExpr AS split, $shardExpr AS shard,
                  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                       x -> x <> '')) AS BIGINT) AS nt
           FROM documents),
         o AS (
           SELECT split, shard, doc_id, nt,
                  COALESCE(SUM(nt) OVER (PARTITION BY split, shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM tk)
         SELECT split, CAST(FLOOR(off / 2048) * 16 + shard AS BIGINT) AS seq_id,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS n_tokens
         FROM o GROUP BY 1, 2
         ORDER BY split NULLS FIRST, seq_id NULLS FIRST"""
    },
    "x35_decontamination" -> {
      val splitExpr = graft.operators.Splits.splitSql(
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "v1")
      s"""WITH tk AS (
           SELECT doc_id, $splitExpr AS split,
                  list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '') AS ts
           FROM documents),
         g AS (
           SELECT doc_id, split,
                  unnest(list_distinct(list_transform(range(1, len(ts) - 6),
                    i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' ' || ts[CAST(i AS INT) + 2] || ' ' || ts[CAST(i AS INT) + 3] || ' ' || ts[CAST(i AS INT) + 4] || ' ' || ts[CAST(i AS INT) + 5] || ' ' || ts[CAST(i AS INT) + 6] || ' ' || ts[CAST(i AS INT) + 7]))) AS gram
           FROM tk WHERE len(ts) >= 8),
         tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train')
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         FROM g WHERE split = 'test' AND gram IN (SELECT gram FROM tr)
         GROUP BY doc_id ORDER BY doc_id NULLS FIRST"""
    },
    "x33_cms_audit" ->
      """SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_keys,
         CAST(0 AS BIGINT) AS undercount_violations,
         CAST(0 AS BIGINT) AS overcount_violations
         FROM events""",
    "x34_bloom_audit" ->
      """SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_keys,
         CAST(0 AS BIGINT) AS false_negatives,
         true AS fp_ok
         FROM events""",
    "x29_salted_agg" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
         ROUND(SUM(value), 2) AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""",
    "x30_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         s AS (SELECT vec_id, e,
                      list_max(list_transform(e, x -> abs(x))) / 127.0 AS sc
               FROM v),
         q AS (SELECT vec_id, e, sc,
                      list_transform(e, x -> CASE WHEN sc > 0
                        THEN floor(x / sc + 0.5) ELSE 0.0 END) AS qv
               FROM s)
         SELECT vec_id, ROUND(sc, 6) AS scale,
                ROUND(list_max(list_transform(range(1, len(e) + 1),
                  i -> abs(e[CAST(i AS INT)] - qv[CAST(i AS INT)] * sc))), 6) AS max_err
         FROM q ORDER BY vec_id NULLS FIRST""",
    "x13_stream_hourly" ->
      """SELECT DATE_TRUNC('HOUR', ts) AS h, event_type,
         CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS v
         FROM events GROUP BY 1, 2
         ORDER BY h NULLS FIRST, event_type NULLS FIRST""",
    "x12_sessionize" ->
      """WITH e AS (
           SELECT user_id, ts, value, event_id,
                  CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                       WHEN ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE THEN 1
                       ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid FROM e)
         SELECT user_id, MIN(ts) AS session_start,
                CAST(COUNT(*) AS BIGINT) AS n_events, ROUND(SUM(value), 2) AS v
         FROM s GROUP BY user_id, sid
         ORDER BY user_id NULLS FIRST, session_start NULLS FIRST"""
  )

  // -------------------------------------------------------------- oracle

  private def coreOracleSql: Map[String, String] = Map(
    "q01_scan_sort" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey NULLS FIRST",
    "q02_sentinel_null" ->
      """SELECT c_custkey,
         CASE WHEN c_mktsegment IN ('AUTOMOBILE') THEN NULL ELSE c_mktsegment END AS seg
         FROM customer ORDER BY c_custkey NULLS FIRST""",
    "q03_sentinel_cast" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus IN ('P') THEN NULL ELSE o_orderstatus END AS st,
         CAST(o_orderkey AS BIGINT) * 2 AS k2
         FROM orders ORDER BY o_orderkey NULLS FIRST""",
    "q04_dim_decode" ->
      """SELECT DISTINCT n_regionkey,
         CASE WHEN n_regionkey = 0 THEN 'AFRICA'
              WHEN n_regionkey = 1 THEN 'AMERICA'
              WHEN n_regionkey = 2 THEN 'ASIA'
              WHEN n_regionkey = 3 THEN 'EUROPE'
              WHEN n_regionkey = 4 THEN 'MIDDLE EAST' END AS region_name
         FROM nation WHERE n_regionkey IS NOT NULL
         ORDER BY n_regionkey NULLS FIRST""",
    "q05_join_star" ->
      """SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n
         FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY r.r_name NULLS FIRST""",
    "q06_left_join" ->
      """SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_cust
         FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
         GROUP BY n.n_name ORDER BY n.n_name NULLS FIRST""",
    "q07a_semi" ->
      """SELECT s_suppkey FROM supplier s
         WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
         ORDER BY s_suppkey NULLS FIRST""",
    "q07b_anti" ->
      """SELECT p_partkey FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
         ORDER BY p_partkey NULLS FIRST""",
    "q08_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2)                         AS sum_qty,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         ROUND(AVG(l_quantity), 2)                         AS avg_qty,
         CAST(COUNT(*) AS BIGINT)                          AS cnt
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q09_count_distinct" ->
      "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n FROM orders",
    // the estimate is engine-specific; the 3·rsd error bound is the
    // contract — oracle recomputes the exact count and pins the bound
    "q09b_approx_distinct" ->
      """SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
                TRUE AS within_bound FROM orders""",
    "q10_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q10b_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q10c_cond_agg" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS BIGINT) AS n_big
         FROM orders GROUP BY o_orderpriority
         ORDER BY o_orderpriority NULLS FIRST""",
    "q11_rank_window" ->
      """SELECT c_custkey, c_nationkey, CAST(rnk AS BIGINT) AS rnk FROM (
           SELECT c_custkey, c_nationkey,
                  ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) AS rnk
           FROM customer) t
         WHERE rnk <= 3 ORDER BY c_nationkey NULLS FIRST, rnk NULLS FIRST""",
    "q12_running_sum" ->
      """SELECT o_custkey, o_orderkey,
         ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run
         FROM orders ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""",
    "q12b_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
         LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
         LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price
         FROM orders ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""",
    "q13_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q14a_intersect" ->
      """SELECT c_nationkey AS k FROM customer
         INTERSECT SELECT s_nationkey FROM supplier ORDER BY k NULLS FIRST""",
    "q14b_except" ->
      """SELECT n_nationkey AS k FROM nation
         EXCEPT SELECT c_nationkey FROM customer ORDER BY k NULLS FIRST""",
    "q14c_union" ->
      """SELECT c_nationkey AS k FROM customer
         UNION SELECT s_nationkey FROM supplier ORDER BY k NULLS FIRST""",
    "q15_string_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS b, LOWER(p_type) AS t,
         SUBSTR(p_name, 1, 5) AS pfx, CAST(LENGTH(p_name) AS BIGINT) AS len,
         REPLACE(p_brand, '#', '-') AS rep, TRIM(p_name) AS trimmed,
         CONCAT(p_brand, '|', p_type) AS joined
         FROM part ORDER BY p_partkey NULLS FIRST""",
    "q16_date_funcs" ->
      """SELECT o_orderkey,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
         CAST(o_orderdate AS DATE) AS d
         FROM orders ORDER BY o_orderkey NULLS FIRST""",
    "q17_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
         ROUND(ABS(l_extendedprice - l_tax), 2) AS a,
         CAST(FLOOR(l_quantity) AS BIGINT) AS f,
         CAST(CEIL(l_discount * 100) AS BIGINT) AS c,
         l_orderkey % 7 AS m,
         ROUND(SQRT(l_extendedprice), 2) AS sq
         FROM lineitem ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""",
    "q18_hourly_window" ->
      """SELECT DATE_TRUNC('HOUR', ts) AS h, event_type,
         CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS v
         FROM events GROUP BY 1, 2
         ORDER BY h NULLS FIRST, event_type NULLS FIRST""",
    "q19_quality_zone" ->
      """SELECT event_id,
         CASE WHEN event_type IN ('error') THEN NULL ELSE event_type END AS etype,
         CASE WHEN value < 0 THEN NULL
              ELSE ROUND(FLOOR(value * 100 + 0.5) / 100, 2) END AS val
         FROM events ORDER BY event_id NULLS FIRST""",
    "q20_array_access" ->
      """SELECT vec_id, ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e0,
         CAST(len(embedding) AS BIGINT) AS dim
         FROM embeddings ORDER BY vec_id NULLS FIRST""",
    "q21_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id NULLS FIRST""",
    "q22_date_parse" ->
      """SELECT o_orderkey,
         CAST(strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS DATE) AS d
         FROM orders ORDER BY o_orderkey NULLS FIRST""",
    "q23_range_join" ->
      """SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           AND l.l_shipdate >= o.o_orderdate
           AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
         GROUP BY o.o_orderpriority
         ORDER BY o.o_orderpriority NULLS FIRST""",
    "q24_cross_join" ->
      """SELECT r.r_regionkey, CAST(COUNT(*) AS BIGINT) AS n
         FROM (SELECT r_regionkey FROM region) r
         CROSS JOIN (SELECT n_nationkey FROM nation) n
         GROUP BY r.r_regionkey
         ORDER BY r.r_regionkey NULLS FIRST""",
    "q28_percentiles" ->
      """SELECT o_orderpriority,
         ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
         ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY o_orderpriority
         ORDER BY o_orderpriority NULLS FIRST""",
    "q28b_width_bucket" ->
      """SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                          WHEN o_totalprice >= 500000 THEN 11
                          ELSE FLOOR(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY 1 ORDER BY bucket NULLS FIRST""",
    "q30_collect" ->
      """SELECT n_regionkey,
         CAST(to_json(list_sort(list(n_name))) AS VARCHAR) AS names,
         array_to_string(list_sort(list(DISTINCT n_name)), ',') AS name_csv,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM nation GROUP BY n_regionkey
         ORDER BY n_regionkey NULLS FIRST""",
    "q31_stats" ->
      """SELECT l_returnflag,
         ROUND(stddev_samp(l_quantity), 4) AS sd,
         ROUND(var_samp(l_quantity), 4) AS vr,
         ROUND(corr(l_quantity, l_extendedprice), 4) AS cr,
         ROUND(covar_samp(l_quantity, l_discount), 6) AS cv
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag NULLS FIRST""",
    "q15b_regex_extract" ->
      """SELECT p_partkey,
         COALESCE(regexp_extract(p_brand, '#(\d+)', 1), '') AS brand_num,
         COALESCE(regexp_extract(p_type, '^(\w+)', 1), '') AS type_head
         FROM part ORDER BY p_partkey NULLS FIRST""",
    "q16b_date_arith" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days,
         CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS week_later,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""",
    "q29_pivot" ->
      """SELECT o_orderpriority,
         CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
         CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
         CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority
         ORDER BY o_orderpriority NULLS FIRST""",
    "q29b_unpivot" ->
      """WITH wide AS (
           SELECT o_orderpriority,
                  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, 'n_f' AS status_col, n_f AS n FROM wide
         UNION ALL
         SELECT o_orderpriority, 'n_o' AS status_col, n_o AS n FROM wide
         ORDER BY o_orderpriority NULLS FIRST, status_col NULLS FIRST""",
    "x16_ngram_jaccard" ->
      """WITH sh AS (
           SELECT doc_id AS id,
                  list_distinct(list_transform(range(1, length(text) - 2),
                    i -> substr(lower(text), CAST(i AS INT), 4))) AS s
           FROM documents WHERE doc_id < 40 AND length(text) >= 4),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b,
                  ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                        len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
           FROM sh a, sh b WHERE a.id < b.id)
         SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.2
         ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""",
    "x15_word_counts" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
           SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '')) AS word
           FROM documents) t
         GROUP BY word ORDER BY n DESC, word NULLS FIRST LIMIT 20""",
    "q25_sql_subquery" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p
         FROM orders o
         WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
           AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
         ORDER BY o_orderkey NULLS FIRST""",
    "q26_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q27_full_outer" ->
      """SELECT COALESCE(n.n_nationkey, s.s_nationkey) AS k, n.n_name,
         CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
         FROM nation n
         FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp
                          FROM supplier GROUP BY s_nationkey) s
           ON n.n_nationkey = s.s_nationkey
         ORDER BY k NULLS FIRST"""
  )
}
