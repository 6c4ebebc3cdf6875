package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest-neighbor search (SURVEY.md north-star
  * extension; the coarse-quantizer + inverted-lists design from the
  * FAISS/IVF literature, re-expressed as DataFrame ops).
  *
  * Build: k-means (Lloyd's) over a sample → centroid table (small,
  * broadcast). Assign: one corpus pass computing argmin-distance
  * cluster id. Search: each query probes its `nprobe` nearest
  * centroids and scans only those inverted lists — an equi-join on
  * cluster id instead of a corpus cross product.
  *
  * Scale shape: centroids are O(√N)-ish and always broadcast; the
  * assign pass is map-only; search shuffles only (query × nprobe)
  * rows against cluster-partitioned lists. Lloyd's iterations are
  * groupBy-avg aggregations — partial-agg friendly, no driver-side
  * math beyond collecting the (small) centroid table.
  */
object Ivf {

  /** Train `k` centroids with `iters` Lloyd iterations over (a sample
    * of) the corpus. Returns (centroid_id, centroid: array<double>). */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int = 5,
                     vecCol: String = "embedding",
                     sampleFraction: Double = 1.0): DataFrame = {
    val spark = corpus.sparkSession
    val vecs = (if (sampleFraction < 1.0)
      corpus.sample(withReplacement = false, sampleFraction, seed = 42)
    else corpus)
      .select(Sim.asDouble(col(vecCol)).as("v"))
      .withColumn("_rid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // init: k deterministic samples
    var centroids = vecs.orderBy(xxhash64(hash(col("v")))).limit(k)
      .withColumn("centroid_id", monotonically_increasing_id())
      .select(col("centroid_id"), col("v").as("centroid"))

    // Materialize the (tiny: k rows) centroid table after every
    // iteration — otherwise each Lloyd round is a lazy plan referencing
    // the previous one, and every later reference re-executes the
    // whole training chain. This is the index artifact a production
    // deployment would persist to a table.
    def materialize(df: org.apache.spark.sql.DataFrame) = {
      val rows = df.collect().toSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), df.schema)
    }
    (0 until iters).foreach { _ =>
      val assigned = assign(vecs, centroids, "v", "_rid")
      centroids = materialize(assigned
        .select(col("centroid_id"), posexplode(col("v")))
        .groupBy("centroid_id", "pos").agg(avg("col").as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), x => x.getField("m")).as("centroid")))
    }
    vecs.unpersist()
    centroids
  }

  /** Cluster assignment: per row, argmin squared-distance over the
    * broadcast centroid table (map-side cross with k centroids, then
    * a per-row-id argmin — no shuffle of the corpus payload). */
  def assign(df: DataFrame, centroids: DataFrame,
             vecCol: String, idCol: String): DataFrame = {
    val withAll = df.crossJoin(
      broadcast(centroids.select(col("centroid_id"), col("centroid"))))
    val dist = aggregate(
      zip_with(col(vecCol), col("centroid"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col(idCol)).orderBy(col("_d").asc, col("centroid_id").asc)
    withAll
      .withColumn("_d", dist)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_d", "_rn", "centroid")
  }

  /** IVF search: top-`k` cosine neighbors per query, scanning only the
    * `nprobe` nearest inverted lists per query. */
  def search(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
             k: Int, nprobe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lists = assign(
      corpus.select(col(idCol).as("neighbor_id"), Sim.asDouble(col(vecCol)).as("cv")),
      centroids, "cv", "neighbor_id")
    val q = queries.select(col(idCol).as("query_id"), Sim.asDouble(col(vecCol)).as("qv"))
    // per query: nprobe nearest centroids
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("_d").asc, col("centroid_id").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("_d", aggregate(
        zip_with(col("qv"), col("centroid"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("_rn", row_number().over(probeW))
      .where(col("_rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    // scan only the probed lists
    val scored = probes.join(lists, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Sim.cosine(col("qv"), col("cv")), 4).as("sim"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(rankW).cast("long"))
      .where(col("rnk") <= k)
  }
}
