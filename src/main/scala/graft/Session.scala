package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Tuned for the harness environment (single-JVM local mode standing in
  * for a multi-executor cluster): AQE on so runtime re-planning (skew
  * join, coalesce partitions, broadcast demotion) behaves like it would
  * on a 1000-executor cluster; shuffle partitions sized to the core
  * count instead of the 200 default; UTC session time zone for oracle
  * parity.
  */
object Session {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def local(appName: String = "graft", cores: Int = cpus,
            warehouseDir: Option[String] = None): SparkSession = {
    val builder0 = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
    val spark = warehouseDir.foldLeft(builder0)(
      (b, dir) => b.config("spark.sql.warehouse.dir", dir))
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // 10MB (the default) forces sort-merge for dimension sides of
      // ~1M keys (e.g. the x99 ref anti join probes orders' 1.5M-key
      // side at sf1, 12MB estimated). With 8GB+ executor memory a
      // 64MB hashed relation is cheap, and AQE still demotes a
      // broadcast whose RUNTIME size disagrees with the estimate.
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerLateRules(spark)
    spark
  }

  /** The extension-injected copy of SemiAntiRightDedup runs in the
    * operator-optimization batches and so never sees the semi/anti
    * joins that SQL EXISTS/NOT EXISTS/IN predicates become in the
    * late RewriteSubquery batch — the "User Provided Optimizers"
    * batch (experimental.extraOptimizations) runs after it and does.
    * Idempotent across both registrations (the rule skips existing
    * aggregates), and across repeat calls on a reused session. */
  def registerLateRules(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.SemiAntiRightDedup))
      spark.experimental.extraOptimizations ++= Seq(graft.plans.SemiAntiRightDedup)
}
