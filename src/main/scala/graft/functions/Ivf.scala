package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.NativeVector

/** Trained IVF coarse quantizer: the index artifact. k×dim doubles —
  * small by construction (k ≈ √N even at 100 TB keeps this in
  * driver/broadcast territory), so it ships to executors as a codegen
  * reference object inside [[NativeVector.NearestCentroidExpr]] and
  * every assignment/probe is map-only. */
final case class IvfIndex(centroids: Array[Array[Double]]) {
  def numLists: Int = centroids.length
  def dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
}

/** IVF-style approximate nearest-neighbor search (SURVEY.md north-star
  * extension; the coarse-quantizer + inverted-lists design from the
  * FAISS/IVF literature, re-expressed as DataFrame ops).
  *
  * Build: k-means (Lloyd's) over a bounded sample → [[IvfIndex]].
  * Assign: one map-only corpus pass (native argmin expression — no
  * crossJoin, no window, no shuffle before the list join). Search:
  * each query probes its `nprobe` nearest centroids (map-only
  * expression) and scans only those inverted lists — an equi-join on
  * cluster id instead of a corpus cross product.
  *
  * Scale shape: the only shuffle in the entire search is the
  * probes⋈lists equi-join on cluster id plus the final per-query
  * top-k; Lloyd's iterations are map-side-combined aggregations whose
  * shuffle is k·dim rows regardless of corpus size.
  */
object Ivf {

  /** Train `k` centroids with `iters` Lloyd iterations over (a sample
    * of) the corpus. The k seed vectors come from a small hash-ordered
    * sample (deterministic, no global sort of the corpus); empty
    * clusters retain their previous centroid. */
  def train(corpus: DataFrame, k: Int, iters: Int = 5,
            vecCol: String = "embedding",
            sampleFraction: Double = 1.0): IvfIndex = {
    require(k > 0, "k must be positive")
    val vecs = (if (sampleFraction < 1.0)
      corpus.sample(withReplacement = false, sampleFraction, seed = 42)
    else corpus)
      .select(col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vecs.count() // materializes the cache too
      require(n > 0, "cannot train on an empty corpus")
      // init: k DISTINCT seeds from a ~50k-vector sample, hash-ordered
      // for determinism — sorting the SAMPLE, never the corpus.
      // distinct() first: duplicate seed vectors would leave their
      // lists permanently empty (ties in the argmin always resolve to
      // the lower centroid id).
      def takeSeeds(pool: DataFrame): Array[Array[Double]] = pool
        .distinct()
        .orderBy(xxhash64(hash(col("v"))))
        .limit(k)
        .collect()
        .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
      val seedFrac = math.min(1.0, (50.0 * k) / n)
      var cents: Array[Array[Double]] =
        takeSeeds(if (seedFrac < 1.0) vecs.sample(withReplacement = false, seedFrac, 7) else vecs)
      // sampling variance (or corpus < k distinct vectors) can
      // undershoot; retry against the full corpus before accepting a
      // smaller quantizer, and say so when even that falls short
      if (cents.length < k && seedFrac < 1.0) cents = takeSeeds(vecs)
      if (cents.length < k)
        System.err.println(
          s"[graft.Ivf] corpus has only ${cents.length} distinct vectors; " +
            s"training a ${cents.length}-list index instead of the requested $k")
      (0 until iters).foreach { _ =>
        // map-only assignment, then element-wise means: posexplode is
        // map-side, the groupBy partial-aggregates before the shuffle,
        // so only numLists·dim rows move (and land on the driver —
        // that IS the index build output).
        // The assignment is eagerly materialized BEFORE the explode:
        // `select(cid_expr, posexplode(v))` plans the argmin in a
        // projection above the Generate, re-evaluating it per element
        // row (dim× the work, and k·dim ops each when realistic seed
        // spacing defeats the distance early-exit — measured 14 s/iter
        // vs 1.5 s at sf1 k=141). localCheckpoint pins one argmin per
        // vector; the frame is (cid, v) — small by the train-sample
        // contract.
        val assigned = vecs
          .select(NativeVector.nearestCentroid(col("v"), cents).as("cid"),
            col("v"))
          .localCheckpoint()
        val upd = assigned
          .select(col("cid"), posexplode(col("v")))
          .groupBy("cid", "pos").agg(avg(col("col").cast("double")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            val arr = new Array[Double](rows.length)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            cid -> arr
          }
        cents = Array.tabulate(cents.length)(i => upd.getOrElse(i, cents(i)))
      }
      IvfIndex(cents)
    } finally { vecs.unpersist(); () }
  }

  /** Session-lifetime index cache: the trained quantizer is an
    * artifact, not something to recompute per query. Keyed by a
    * caller-chosen identity (e.g. the dataset path). */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfIndex]()

  def indexFor(key: String, corpus: => DataFrame, k: Int, iters: Int = 5,
               vecCol: String = "embedding",
               sampleFraction: Double = 1.0): IvfIndex =
    indexCache.computeIfAbsent(key, _ => train(corpus, k, iters, vecCol, sampleFraction))

  /** Map-only cluster assignment: adds `centroid_id` (int). */
  def assignCol(vec: Column, index: IvfIndex): Column =
    NativeVector.nearestCentroid(vec, index.centroids)

  def assign(df: DataFrame, index: IvfIndex,
             vecCol: String = "embedding"): DataFrame =
    df.withColumn("centroid_id", assignCol(col(vecCol), index))

  /** Materialize the inverted lists as the second half of the index
    * artifact: the assigned corpus written hive-partitioned by
    * `centroid_id`. At scale this is written once per corpus build;
    * searches then touch only the probed lists' files (dynamic
    * partition pruning — the probe side is broadcast and its
    * centroid ids prune the parquet partitions before any scan). */
  def writeLists(corpus: DataFrame, index: IvfIndex, path: String,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("centroid_id", assignCol(col("cv"), index))
      .write.partitionBy("centroid_id").mode("overwrite").parquet(path)

  /** Search against materialized lists (see [[writeLists]]): same
    * semantics as [[search]], but the corpus side is the persisted
    * partitioned artifact, so only probed partitions are read. */
  def searchIndexed(queries: DataFrame, listsPath: String, index: IvfIndex,
                    k: Int, nprobe: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val lists = spark.read.parquet(listsPath)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(NativeVector.nearestCentroids(col("qv"), index.centroids, nprobe))
          .as("centroid_id"))
    val scored = lists.join(broadcast(probes), Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(NativeVector.cosineSim(col("qv"), col("cv")), 4).as("sim"))
    Sim.topKPerGroup(scored, "query_id", "neighbor_id", "sim", k)
  }

  /** IVF search: top-`k` cosine neighbors per query, scanning only the
    * `nprobe` nearest inverted lists per query. Works directly on
    * array<float> or array<double> embeddings (no cast pass). */
  def search(queries: DataFrame, corpus: DataFrame, index: IvfIndex,
             k: Int, nprobe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lists = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("centroid_id", assignCol(col("cv"), index))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(NativeVector.nearestCentroids(col("qv"), index.centroids, nprobe))
          .as("centroid_id"))
    val scored = probes.join(lists, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(NativeVector.cosineSim(col("qv"), col("cv")), 4).as("sim"))
    // bounded-heap UDAF: partial top-k before the shuffle (the window
    // form would shuffle every probed candidate row)
    Sim.topKPerGroup(scored, "query_id", "neighbor_id", "sim", k)
  }
}
