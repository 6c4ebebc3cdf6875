package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Fixture-table access (SURVEY.md §2.1 S4/S13).
  *
  * The reference scans named warehouse tables
  * (`export_svg.py:245,260,291`); here the harness fixtures are one
  * Parquet file per table under a scale-factor directory
  * (TESTDATA.md). Parquet scans give Catalyst predicate pushdown,
  * column pruning, and (for `k=v` layouts) hive partition discovery
  * for free — nothing custom to write.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one fixture table.
    *
    * The `events` fixture stores `ts` as Parquet TIMESTAMP(NANOS),
    * which Spark rejects unless `spark.sql.legacy.parquet.nanosAsLong`
    * is on (sessions created by Session/Verify/Bench set it). With the
    * flag the column arrives as a LONG of nanoseconds; convert to a
    * proper µs TimestampType here. Integer `div` (not `/`, which is
    * double division and loses precision above 2^53 ns) floors to µs —
    * the same truncation DuckDB applies when reading ns Parquet.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
        case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case None    => df
      }
    })

  // Re-resolving a fixture path re-lists files and re-reads footers on
  // every query; the fixtures are immutable, so reuse the resolved
  // plan per (session, dir, table). Plans are tiny; entries die with
  // the session.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Register every fixture table as a temp view (for `spark.sql`). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
