package graft.gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ivf, Sim, Text}
import graft.operators.{AsOfJoin, Dedup, Sessionize}
import graft.ops.{Dims, Quality}
import graft.sources.Tables

/** Scalar-function gates (SURVEY.md §2 F-family): string/regex, date
  * parse+arithmetic, math, array/json access, pivot/unpivot,
  * collect/stats.
  *
  * Split out of SparkEntry (one gate map per operator family); the
  * driver contract is still the combined SparkEntry.queries /
  * SparkEntry.oracleSql. Helpers and shared oracle CTEs live in
  * [[GateSupport]].
  */
private[graft] object FunctionGates {
  import GateSupport._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Q22 [F3] date parse round-trip — paired-dialect; runs the
    // engine's own native format/parse pair (ops/Quality F3), which
    // the DuckDB strftime/strptime oracle must reproduce exactly
    "q22_date_parse" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          graft.ops.Quality.parseDateMdy(
            graft.ops.Quality.formatDateMdy(col("o_orderdate"))).as("d"))
        .orderBy(asc_nulls_first("o_orderkey"))),


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
  )

  def oracleSql: Map[String, String] = Map(
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
  )
}
