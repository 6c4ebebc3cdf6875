package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling — the data-quality monitor every
  * production pipeline runs against every ingest batch (row counts,
  * null counts, cardinalities, ranges; drift in any of them is the
  * first sign of an upstream breakage). One row per column:
  *
  *   (column, n_rows, n_null, n_distinct,
  *    min_num, max_num, min_str, max_str)
  *
  * Numeric columns (and only they) fill `min_num`/`max_num` as
  * DOUBLE; string columns fill `min_str`/`max_str`. Keeping numeric
  * extrema numeric avoids cross-engine float-formatting drift;
  * other types (timestamps, arrays, …) profile counts only.
  *
  * Plan shape: the WHOLE profile is ONE aggregation over ONE scan —
  * every statistic is an agg expression, the per-column rows are an
  * explode of the single result row (driver-side width, not a second
  * job). With `exact = true` the distinct counts are exact, which
  * Catalyst plans as an Expand ×(distinct-agg count) before the
  * shuffle — the right call for audit gates. At 100 TB the default
  * `exact = false` uses HLL++ (`approx_count_distinct`), keeping the
  * profile a single map-side-combined pass with a constant-size
  * sketch per column, no Expand.
  */
object Profile {

  /** Backtick-quote a column name for `col()` — a dot in a name (the
    * JSON-ingest norm this profiler exists to monitor) would otherwise
    * parse as struct-field access; backticks in the name itself escape
    * by doubling. */
  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  def profile(df: DataFrame, exact: Boolean = false,
              rsd: Double = 0.01): DataFrame = {
    val fields = df.schema.fields.toSeq
    def isNum(t: DataType): Boolean = t match {
      case _: NumericType => true
      case _ => false
    }
    val aggs = fields.flatMap { f =>
      val c = col(q(f.name))
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        (if (exact) countDistinct(c)
         else approx_count_distinct(c, rsd)).as(s"__nd_${f.name}")) ++
        (if (isNum(f.dataType)) Seq(
          min(c).cast(DoubleType).as(s"__min_${f.name}"),
          max(c).cast(DoubleType).as(s"__max_${f.name}"))
        else if (f.dataType == StringType) Seq(
          min(c).as(s"__min_${f.name}"),
          max(c).as(s"__max_${f.name}"))
        else Seq.empty)
    } :+ count(lit(1)).as("__n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)

    val nullD = lit(null).cast(DoubleType)
    val nullS = lit(null).cast(StringType)
    val perCol = fields.map { f =>
      val (mn, mx, ms, xs) =
        if (isNum(f.dataType))
          (col(q(s"__min_${f.name}")), col(q(s"__max_${f.name}")), nullS, nullS)
        else if (f.dataType == StringType)
          (nullD, nullD, col(q(s"__min_${f.name}")), col(q(s"__max_${f.name}")))
        else (nullD, nullD, nullS, nullS)
      struct(
        lit(f.name).as("column"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(q(s"__cnt_${f.name}"))).as("n_null"),
        col(q(s"__nd_${f.name}")).as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"),
        ms.as("min_str"), xs.as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}
