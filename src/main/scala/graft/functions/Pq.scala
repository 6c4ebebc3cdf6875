package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{NativePq, NativeVector}

/** Trained product-quantization codebooks: `m` subspaces × `ksub`
  * entries × `dim/m` doubles. Like [[IvfIndex]], broadcast-small by
  * construction (m·ksub·subDim doubles — 16·16·4 = 1 KB at the
  * fixture's shape, a few MB at production m=64/ksub=256/dim=1024),
  * shipped to executors as a codegen reference object. */
final case class PqCodebooks(books: Array[Array[Array[Double]]]) {
  def m: Int = books.length
  def ksub: Int = if (books.isEmpty) 0 else books(0).length
  def subDim: Int =
    if (books.isEmpty || books(0).isEmpty) 0 else books(0)(0).length
}

/** Product quantization for vector search at memory scale (Jégou et
  * al. 2011; the FAISS IVF-PQ composition re-expressed as DataFrame
  * ops). The 100 TB story is PAYLOAD: a candidate row in the probed
  * lists carries `m` bytes of codes + one stored norm instead of
  * `dim` doubles — 32× smaller at the fixture shape (16 doubles →
  * 4 bytes), 128× at production dim=1024/m=64 — so the inverted-list
  * artifact, the probe join's shuffle, and executor cache all shrink
  * by that factor while the query side stays exact (asymmetric
  * scoring).
  *
  * Training mirrors [[Ivf.train]]'s shape: per-subspace Lloyd
  * iterations where assignment is one map-only native pass over the
  * corpus ([[NativePq.PqEncodeExpr]]) and the centroid update is a
  * map-side-combined aggregation whose shuffle is m·ksub·subDim rows
  * regardless of corpus size — ALL subspaces train in the same
  * single job per iteration.
  */
object Pq {

  /** Train `m` codebooks of `ksub` entries each over (a sample of)
    * the corpus. Requires dim divisible by m. Seeds per subspace are
    * hash-ordered distinct subvectors from a bounded sample (never a
    * corpus sort); empty codes retain their previous entry. */
  def train(corpus: DataFrame, m: Int, ksub: Int = 16, iters: Int = 5,
            vecCol: String = "embedding",
            sampleFraction: Double = 1.0): PqCodebooks = {
    require(m > 0 && ksub > 0 && ksub <= 256,
      "need 0 < m and 0 < ksub <= 256 (codes are single bytes)")
    val vecs = (if (sampleFraction < 1.0)
      corpus.sample(withReplacement = false, sampleFraction, seed = 42)
    else corpus)
      .select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vecs.count()
      require(n > 0, "cannot train on an empty corpus")
      val dim = vecs.select(size(col("v"))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val sd = dim / m
      // seeds: one bounded hash-ordered sample feeds every subspace,
      // then per-subspace FARTHEST-POINT greedy (k-center; start at
      // the first sample subvector, repeatedly add the subvector
      // maximizing its min distance to the chosen set). Hash-ordered
      // take(ksub) is NOT enough here: with per-vector jitter almost
      // every subvector is distinct, so an arbitrary prefix can seed
      // several codes inside one natural cluster and leave another
      // cluster with no code — Lloyd cannot recover an unrepresented
      // cluster (the empty-cell problem). Farthest-point spreads the
      // seeds across the sample's extent deterministically.
      val seedFrac = math.min(1.0, (8.0 * ksub) / n)
      val sample = (if (seedFrac < 1.0)
        vecs.sample(withReplacement = false, seedFrac, 7) else vecs)
        .distinct()
        .orderBy(xxhash64(hash(col("v"))))
        .limit(8 * ksub)
        .collect()
        .map(_.getSeq[Double](0).toArray)
      def d2(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var i = 0
        while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
        d
      }
      var books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
        // content-based dedup: Array#distinct compares element arrays
        // by REFERENCE and never collapses anything — round-trip
        // through Vector for value equality
        val subs = sample.map(_.slice(s * sd, (s + 1) * sd).toVector)
          .distinct.map(_.toArray)
        if (subs.length <= ksub) {
          if (subs.length < ksub)
            System.err.println(s"[graft.Pq] subspace $s has only " +
              s"${subs.length} distinct seed subvectors; smaller book")
          subs
        } else {
          val chosen = scala.collection.mutable.ArrayBuffer(subs(0))
          val minD = subs.map(d2(_, subs(0)))
          while (chosen.length < ksub) {
            var best = 0
            for (i <- subs.indices if minD(i) > minD(best)) best = i
            chosen += subs(best)
            for (i <- subs.indices)
              minD(i) = math.min(minD(i), d2(subs(i), subs(best)))
          }
          chosen.toArray
        }
      }
      (0 until iters).foreach { _ =>
        // one job updates every subspace: codes once per vector
        // (localCheckpoint pins them — same re-evaluation hazard as
        // Ivf.train's argmin), then (subspace, code, sub-pos) means
        val assigned = vecs
          .select(NativePq.encode(col("v"), books)
            .getField("codes").as("codes"), col("v"))
          .localCheckpoint()
        val upd = assigned
          .select(col("codes"), posexplode(col("v")))
          .select((col("pos") / sd).cast(IntegerType).as("s"),
            // bytes are SIGNED: code 236 reads as −20 — pmod restores
            // the unsigned code id for ksub > 128
            pmod(element_at(col("codes"), (col("pos") / sd).cast(IntegerType) + 1)
              .cast(IntegerType), lit(256)).as("cid"),
            (col("pos") % sd).as("sp"), col("col").as("x"))
          .groupBy("s", "cid", "sp").agg(avg(col("x")).as("mu"))
          .collect()
        val next = books.map(_.map(_.clone()))
        upd.groupBy(r => (r.getInt(0), r.getInt(1))).foreach {
          case ((s, cid), rows) =>
            if (s < m && cid >= 0 && cid < next(s).length)
              rows.foreach(r => next(s)(cid)(r.getInt(2)) = r.getDouble(3))
        }
        books = next
      }
      PqCodebooks(books)
    } finally { vecs.unpersist(); () }
  }

  /** Session-lifetime codebook cache (artifact, like Ivf.indexFor). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, PqCodebooks]()

  def codebooksFor(key: String, corpus: => DataFrame, m: Int,
                   ksub: Int = 16, iters: Int = 5,
                   vecCol: String = "embedding",
                   sampleFraction: Double = 1.0): PqCodebooks =
    cache.computeIfAbsent(key,
      _ => train(corpus, m, ksub, iters, vecCol, sampleFraction))

  /** Map-only corpus encode for IVF-PQ: (idCol → neighbor_id, codes,
    * norm, centroid_id) with the raw vector DROPPED — the coded lists
    * are the artifact that replaces the full-vector inverted lists at
    * scale. One pass computes coarse cell + codes + norm. */
  def encodeLists(corpus: DataFrame, ivf: IvfIndex, books: PqCodebooks,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    corpus
      .select(col(idCol).as("neighbor_id"),
        NativePq.encode(col(vecCol), books.books).as("e"),
        Ivf.assignCol(col(vecCol), ivf).as("centroid_id"))
      .select(col("neighbor_id"), col("e.codes").as("codes"),
        col("e.norm").as("norm"), col("centroid_id"))

  def adcSim(q: Column, codes: Column, norm: Column,
             books: PqCodebooks): Column =
    NativePq.adcSim(q, codes, norm, books.books)

  /** IVF-PQ search: same probe shape as [[Ivf.search]] (each query
    * probes its nprobe nearest cells; equi-join on the cell id, never
    * a cross product) but candidates are scored asymmetrically from
    * their codes — the full corpus vectors are never read. */
  def search(queries: DataFrame, codedLists: DataFrame, ivf: IvfIndex,
             books: PqCodebooks, k: Int, nprobe: Int = 2,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(NativeVector.nearestCentroids(col("qv"), ivf.centroids, nprobe))
          .as("centroid_id"))
    val scored = codedLists.join(broadcast(probes), Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(adcSim(col("qv"), col("codes"), col("norm"), books), 4).as("sim"))
    Sim.topKPerGroup(scored, "query_id", "neighbor_id", "sim", k)
  }

  /** PQ shortlist + exact rerank — the production refinement: ADC
    * over the coded lists picks `shortlist` candidates per query
    * (cheap, codes only), then ONLY those |queries|·shortlist rows
    * fetch their true vectors for an exact cosine top-`k`. At scale
    * the full-precision corpus is touched for the shortlist alone —
    * an id-keyed equi join with the (broadcast-small) candidate set —
    * so quantization error affects candidate selection but never the
    * final ranking. */
  def searchRefined(queries: DataFrame, codedLists: DataFrame,
                    corpus: DataFrame, ivf: IvfIndex, books: PqCodebooks,
                    k: Int, shortlist: Int, nprobe: Int = 2,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val cand = search(queries, codedLists, ivf, books, shortlist, nprobe,
      idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(queries
        .select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(NativeVector.cosineSim(col("qv"), col("cv")), 4).as("sim"))
    Sim.topKPerGroup(scored, "query_id", "neighbor_id", "sim", k)
  }
}
