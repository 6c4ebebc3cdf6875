package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gates._

/** Driver contract — one `queries` entry + matching DuckDB `oracleSql`
  * per implemented operator from SURVEY.md §2. Column names/aliases are
  * kept identical between the DataFrame code and the oracle SQL (the
  * driver's compare sorts columns by name before hashing).
  *
  * Determinism rules (SURVEY.md §2.10): total ORDER BY with explicit
  * NULLS FIRST and unique tie-break keys; ROUND(·,2) on floating
  * aggregates; integer-kind outputs cast to BIGINT on both sides
  * (DuckDB widens COUNT/LENGTH/EXTRACT to BIGINT where Spark uses INT).
  *
  * The gate definitions live in one file per operator family under
  * `graft.gates` (CoreGates, FunctionGates, DedupAnnGates, TextGates, MixingGates,
  * StreamingGates, MultimodalGates, CatalogGates), with shared
  * plumbing in GateSupport; this object is the stable driver-facing
  * surface that concatenates them. Keys are unique across families
  * (asserted), so concatenation order is irrelevant.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_join_star")(spark, "/root/testdata/sf0.001")

  private val families = Seq(
    ("core", CoreGates.queries, CoreGates.oracleSql),
    ("functions", FunctionGates.queries, FunctionGates.oracleSql),
    ("dedup-ann", DedupAnnGates.queries, DedupAnnGates.oracleSql),
    ("text", TextGates.queries, TextGates.oracleSql),
    ("mixing", MixingGates.queries, MixingGates.oracleSql),
    ("streaming", StreamingGates.queries, StreamingGates.oracleSql),
    ("multimodal", MultimodalGates.queries, MultimodalGates.oracleSql),
    ("catalog", CatalogGates.queries, CatalogGates.oracleSql))

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val maps = families.map(f => (f._1, f._2))
    val total = maps.map(_._2.size).sum
    val merged = maps.map(_._2).reduce(_ ++ _)
    require(merged.size == total,
      "duplicate gate keys across family files: " +
        maps.flatMap(_._2.keys).groupBy(identity).collect {
          case (k, v) if v.size > 1 => k
        }.mkString(", "))
    merged
  }

  val oracleSql: Map[String, String] = families.map(_._3).reduce(_ ++ _)
}
