package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deduplication operators for training-data pipelines (SURVEY.md
  * north-star extensions): exact, fingerprint, MinHash+LSH,
  * SimHash-bucketed, and n-gram-Jaccard near-dup.
  *
  * Scale design: every variant reduces to hash → groupBy/equi-join —
  * one shuffle keyed on something with bounded fan-in, never an
  * all-pairs product. Partial aggregation (map-side combine) collapses
  * duplicate mass before the exchange, so skew from a viral duplicate
  * is bounded by the distinct-key count per partition.
  */
object Dedup {

  /** Ensure CPU-bound signature work gets the cluster's parallelism:
    * a byte-small but compute-heavy input (one parquet row group of
    * dense text → one scan split) otherwise serializes the per-doc
    * shingle/hash work on a single core. No-op when the scan already
    * yields enough splits — the 100 TB case, where this repartition
    * would be a harmful corpus shuffle; here it moves only the
    * kilobyte-scale text once to unlock every core.
    *
    * CAVEAT: inspecting the partition count forces PHYSICAL PLANNING
    * of `df` on every call (the plan is then re-derived by whatever
    * the caller builds on top — Catalyst caches nothing across
    * frames). `toRdd` keeps that cost to planning alone (`df.rdd`
    * would additionally attach a Row-deserializing map stage);
    * measured ~ms on the gate inputs, and at cluster scale the
    * partition check short-circuits to the identity branch anyway. */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }

  /** Session-lifetime staged signature tables, keyed by a
    * caller-chosen corpus identity. Signatures are a dedup BUILD
    * ARTIFACT of a corpus snapshot (like the IVF quantizer + inverted
    * lists): at warehouse scale you write the signature table once
    * and reuse it across dedup runs, so repeat invocations against
    * the same corpus must not re-shingle and re-hash it.
    *
    * HARD PRECONDITION: a `cacheKey` asserts corpus identity — the
    * caller promises the underlying data for that key never changes
    * within the session. There is no data fingerprint behind it;
    * reusing a key after mutating the corpus returns stale
    * signatures. When a corpus snapshot is replaced, call
    * [[clearSignatureCache]] (optionally with the key prefix) to
    * unpersist and drop the stale artifacts. Cached frames otherwise
    * pin memory/disk for the session lifetime by design — that is
    * the artifact contract, not a leak. */
  private val sigCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Unpersist and drop staged signature tables whose cache key
    * starts with `prefix` (empty prefix = everything). Call when a
    * corpus snapshot a key referred to is replaced or no longer
    * needed. */
  def clearSignatureCache(prefix: String = ""): Unit = {
    import scala.jdk.CollectionConverters._
    sigCache.keySet().asScala.filter(_.startsWith(prefix)).toList.foreach { k =>
      Option(sigCache.remove(k)).foreach { df => df.unpersist(); () }
    }
  }

  /** MinHash signature table (id, sig) for `df`. With a `cacheKey`
    * the table is staged (persisted + materialized) once per key and
    * reused for the session lifetime; without one the caller owns
    * persist/unpersist of the returned lazy frame. */
  def signatureTable(df: DataFrame, numHashes: Int, shingleSize: Int,
                     idCol: String = "doc_id", textCol: String = "text",
                     cacheKey: Option[String] = None): DataFrame = {
    // fused shingle+minhash: hashes each char window in place instead
    // of materializing the distinct shingle array first (MinHash is
    // duplicate-invariant, so the signatures are bit-identical —
    // NativeEquivalenceSpec pins it); the signature build was the
    // dominant cost of every LSH dedup entry point (≈17 s of x20's
    // sf1 wall-clock before, ≈3 s after). `fp` is the raw-text
    // xxhash64: equal fp ⇒ identical text ⇒ Jaccard exactly 1, the
    // exact-duplicate short-circuit hybridVerify uses to skip the
    // shingle re-join for the dominant pair class of replica-heavy
    // corpora (P[false accept] = 2⁻⁶⁴ per pair, far below the
    // estimator's documented 2e-10 divergence bound).
    def build(): DataFrame = fanOut(df)
      .where(length(col(textCol)) >= shingleSize)
      .select(col(idCol).as("id"),
        graft.expressions.NativeSignatures
          .minhashText(col(textCol), shingleSize, numHashes)
          .as("sig"),
        xxhash64(col(textCol)).as("fp"))
    cacheKey match {
      case Some(k) =>
        sigCache.computeIfAbsent(s"$k|$numHashes|$shingleSize|$idCol|$textCol", _ => {
          val t = build().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          t.count() // materialize the artifact eagerly
          t
        })
      case None => build()
    }
  }

  /** Exact dedup: keep the lowest id per identical key column.
    * groupBy+min (not window row_number) — partial aggregation makes
    * this a single cheap shuffle of (key, id) pairs. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(min(col(idCol)).as(idCol))

  /** Exact-ish dedup via 64-bit token-stream fingerprint
    * ([[Text.fingerprint]]): whitespace/case-insensitive identity,
    * and the shuffle carries an 8-byte key instead of full documents —
    * the difference between shuffling 100 TB of text and 800 GB of
    * hashes. */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** MinHash signature as an array column: one base hash per shingle
    * + `numHashes` affine rehashes, in a native Catalyst expression
    * (the k×|shingles| interpreted-HOF formulation measured 42 s at
    * sf0.1; this is sub-second). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.expressions.NativeSignatures.minhashSignature(shingles, numHashes)

  /** MinHash+LSH near-dup candidate pairs, verified by the MinHash
    * Jaccard estimator.
    *
    * shingle → minhash(numHashes) → band (rows-per-band slices, each
    * hashed to a bucket key) → equi-join on (band, bucket) → estimated
    * Jaccard ≥ threshold. Probability a pair with Jaccard j collides:
    * 1-(1-j^r)^b — with 16 bands × 8 rows, j=0.8 is caught w.p. ~0.96.
    * The estimator (fraction of agreeing signature components, std ≈
    * √(j(1-j)/k) ≈ 0.04 at k=128) replaces exact shingle-set Jaccard
    * in the verify stage so candidates are checked from the already-
    * staged 1 KB signatures instead of re-shingling the corpus; use
    * [[ngramJaccardPairs]] when exact scores are required.
    *
    * The signature table (id + k longs — ~100× smaller than the
    * corpus) is persisted: it feeds both sides of the band join and
    * both verify lookups, and without staging Catalyst would recompute
    * the shingle scan for each of the four references. At warehouse
    * scale this staging is a signature table you'd write once and
    * reuse across dedup runs.
    */
  def minhashLsh(df: DataFrame, threshold: Double,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 8,
                 cacheKey: Option[String] = None): DataFrame = {
    val numHashes = bands * rowsPerBand
    val cached = cacheKey.isDefined
    val sig0 = signatureTable(df, numHashes, shingleSize, idCol, textCol, cacheKey)
    val sig = if (cached) sig0
      else sig0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cand = bandCandidates(sig, bands, rowsPerBand)
      cand
        .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.expressions.NativeSignatures.sigAgree(col("sig_a"), col("sig_b"))
            .cast("double") / numHashes, 4)
            .as("jaccard"))
        .where(col("jaccard") >= threshold)
        // eager: materialize before the staged signatures are released
        .localCheckpoint()
    } finally { if (!cached) sig.unpersist(); () }
  }

  /** (id, band, bucket) view of a signature table: each signature
    * sliced into `bands` row groups, each hashed to a bucket key. */
  private[graft] def bandedView(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

  /** Bipartite LSH band join between two signature tables (the
    * batch × corpus candidate stage of [[dedupIncremental]]): ids-only
    * pairs from any shared (band, bucket) key — no id_a < id_b filter,
    * the sides are distinct tables. Package-private so PlanSpec can
    * pin its equi-join shape. */
  private[graft] def crossBandCandidates(sigA: DataFrame, sigB: DataFrame,
                                         bands: Int, rowsPerBand: Int): DataFrame =
    bandedView(sigA, bands, rowsPerBand).as("l")
      .join(bandedView(sigB, bands, rowsPerBand).as("r"), Seq("band", "bucket"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

  /** LSH band join over a (id, sig) signature table: ids-only candidate
    * pairs from any shared (band, bucket) key. */
  private def bandCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = bandedView(sig, bands, rowsPerBand)
    banded.as("l").join(banded.as("r"), Seq("band", "bucket"))
      .where(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Ids-only MinHash-LSH candidate pairs (the band join before any
    * verification) — public so recall audits can check containment:
    * every exact-Jaccard pair above the banding's design threshold
    * must appear here. */
  def lshCandidates(df: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 8,
                    cacheKey: Option[String] = None): DataFrame = {
    val sig = signatureTable(df, bands * rowsPerBand, shingleSize, idCol, textCol, cacheKey)
    bandCandidates(sig, bands, rowsPerBand)
  }

  /** Near-dup pairs with EXACT shingle-set Jaccard verification:
    * candidates come from the same MinHash-LSH band join (ids only, no
    * cross product), but the verify stage joins the candidate pairs
    * back to their distinct-shingle sets and computes exact Jaccard —
    * deterministic scores, so downstream dedup is oracle-checkable
    * against an all-pairs exact-Jaccard reference at test scale. At
    * production scale the shingle-set re-join touches only candidate
    * rows (≪ corpus), so the extra cost over the estimator is bounded
    * by the candidate count. */
  def lshExactPairs(df: DataFrame, threshold: Double,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 8): DataFrame = {
    val base = fanOut(df).where(length(col(textCol)) >= shingleSize)
      .select(col(idCol).as("id"), Text.charShingles(col(textCol), shingleSize).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sig = base.select(col("id"),
        minhashSignature(col("sh"), bands * rowsPerBand).as("sig"))
      bandCandidates(sig, bands, rowsPerBand)
        .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), Text.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .where(col("jaccard") >= threshold)
        // eager: materialize before the staged shingles are released
        // (repeat invocations otherwise accumulate cached blocks for
        // the session lifetime)
        .localCheckpoint()
    } finally { base.unpersist(); () }
  }

  /** Near-dup pairs with HYBRID verification: candidates from the LSH
    * band join are first scored with the MinHash Jaccard estimator
    * (computed from the already-staged signatures — no re-shingling);
    * only candidates whose estimate falls within `margin` of the
    * threshold get the exact shingle-set Jaccard re-join.
    *
    * Divergence bound: a clear-margin candidate disagrees with exact
    * Jaccard only when the estimator errs by ≥ margin, which by
    * Hoeffding (k = bands·rowsPerBand components, each in {0,1}) has
    * P ≤ 2·exp(−2·k·margin²) per pair — at k = 128 that is ≈ 2e−10
    * for margin 0.3 (the default) but only ≈ 7e−5 for margin 0.2;
    * equivalently the worst-case normal tail (σ = √(j(1−j)/k) ≤ 0.044
    * at j = 0.5) puts margin 0.3 at ≈ 6.8σ vs 4.5σ for 0.2. Expected
    * divergences over a run are candidate_count × that bound, so the
    * default stays negligible (≪ 1) up to ~10^9 candidate pairs where
    * a 0.2 margin would already expect divergences at ~10^4. The
    * near-threshold band (where the estimator could err) is always
    * resolved exactly, so survivors match [[lshExactPairs]] up to the
    * stated per-pair bound while the expensive shingle-set re-join
    * touches only the near-threshold sliver of candidates. (For high
    * thresholds, `threshold + margin > 1` means no estimator
    * fast-accepts at all — every surviving pair is exact-verified,
    * the safe direction.) */
  def lshHybridPairs(df: DataFrame, threshold: Double,
                     idCol: String = "doc_id", textCol: String = "text",
                     shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 8,
                     margin: Double = 0.3,
                     cacheKey: Option[String] = None): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Stage SIGNATURES only (id + k longs, ~100× smaller than the
    // corpus and ~1000× smaller than staged shingle sets — persisting
    // the shingle arrays was the dominant cost of the all-exact
    // variant). Shingles are recomputed lazily below, and only for
    // the near-threshold sliver of candidates.
    val cached = cacheKey.isDefined
    val sig0 = signatureTable(df, numHashes, shingleSize, idCol, textCol, cacheKey)
    val sig = if (cached) sig0
      else sig0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try hybridVerify(bandCandidates(sig, bands, rowsPerBand), sig, sig, df, df,
      threshold, margin, numHashes, shingleSize, idCol, textCol)
    finally { if (!cached) sig.unpersist(); () }
  }

  /** Hybrid verification of candidate (id_a, id_b) pairs — the verify
    * core of [[lshHybridPairs]], generalized to a bipartite pair set:
    * `sigA`/`srcA` back the id_a side, `sigB`/`srcB` the id_b side.
    * The MinHash Jaccard estimator (read from the staged signatures)
    * resolves clear-margin candidates; only the near-threshold sliver
    * gets the exact shingle-set re-join against the source frame(s).
    * When both sides are the SAME frame (self-join dedup) the
    * near-threshold re-shingle scans the corpus once, not twice.
    * Divergence bound vs all-exact: see [[lshHybridPairs]]. The
    * result is eagerly materialized (localCheckpoint), so callers may
    * unpersist the signature tables as soon as this returns. */
  /** Near-threshold re-shingle fetches at most this many doc ids via
    * an inlined IN-list (parquet row-group pruning on the id column —
    * the id-fetch shape of a production document store); above the cap
    * the fetch falls back to the broadcast semi-join. The near set is
    * bounded by the candidate count by construction, so the cap only
    * picks the fetch mechanism, never the semantics. */
  private val NearFetchPushdownCap = 1000

  private[graft] def hybridVerify(cand: DataFrame, sigA: DataFrame, sigB: DataFrame,
                           srcA: DataFrame, srcB: DataFrame,
                           threshold: Double, margin: Double,
                           numHashes: Int, shingleSize: Int,
                           idCol: String, textCol: String,
                           eager: Boolean = true): DataFrame = {
    // `same_fp` = identical raw text (64-bit fingerprint equality) —
    // Jaccard is exactly 1 for those pairs, so they fast-accept at
    // any threshold without touching the shingle re-join. Replica-
    // heavy corpora (the realistic web-scale profile) are dominated
    // by this pair class, and at high thresholds (threshold + margin
    // > 1, where no estimator fast-accept exists) it is the ONLY
    // fast path.
    val scored = cand
      .join(sigA.select(col("id").as("id_a"), col("sig").as("sig_a"),
        col("fp").as("fp_a")), Seq("id_a"))
      .join(sigB.select(col("id").as("id_b"), col("sig").as("sig_b"),
        col("fp").as("fp_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (graft.expressions.NativeSignatures.sigAgree(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes)
          .as("est"),
        (col("fp_a") === col("fp_b")).as("same_fp"))
      // eager: both branches below read this (ids+estimate+flag only,
      // candidates ≪ corpus)
      .localCheckpoint()
    val clear = scored
      .where(col("same_fp") || col("est") >= threshold + margin)
      .select(col("id_a"), col("id_b"))
    val near = scored
      .where(!col("same_fp") &&
        col("est") >= threshold - margin && col("est") < threshold + margin)
    // driver-side branch on checkpointed metadata: when no candidate
    // lands near the threshold (the common case — near-dups are
    // either clearly dup or clearly not), the corpus is never
    // re-shingled at all
    if (near.isEmpty) clear
    else {
      // prune FIRST, shingle after: the near ids (bounded by the
      // candidate count) are inlined as an IN-list under the cap, so
      // the parquet scan prunes row groups on the id column's min/max
      // stats instead of reading the whole text column — the id-fetch
      // a production doc store would serve. Above the cap, the
      // broadcast semi-join does the same pruning post-scan.
      def shingled(src: DataFrame, ids: DataFrame): DataFrame = {
        val inline = ids.limit(NearFetchPushdownCap + 1).collect().map(_.get(0))
        val pruned =
          if (inline.length <= NearFetchPushdownCap)
            src.where(col(idCol).isin(inline.toSeq: _*))
          else src.join(broadcast(ids), src(idCol) === ids("id"), "left_semi")
        pruned
          .where(length(col(textCol)) >= shingleSize)
          .select(col(idCol).as("id"), Text.charShingles(col(textCol), shingleSize).as("sh"))
          .localCheckpoint()
      }
      val (shA, shB) =
        if (srcA eq srcB) {
          val both = shingled(srcA, near.select(col("id_a").as("id"))
            .union(near.select(col("id_b").as("id"))).distinct())
          (both, both)
        } else
          (shingled(srcA, near.select(col("id_a").as("id")).distinct()),
            shingled(srcB, near.select(col("id_b").as("id")).distinct()))
      val verified = near
        .join(shA.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(shB.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .where(Text.jaccard(col("sh_a"), col("sh_b")) >= threshold)
        .select(col("id_a"), col("id_b"))
      val out = clear.union(verified)
      // every input the union references is already materialized
      // (scored/shA/shB checkpoints), so a caller that immediately
      // re-materializes (distinct + checkpoint) can skip this one
      if (eager) out.localCheckpoint() else out
    }
  }

  /** SimHash near-dup pairs: bucket by the signature split into
    * `chunks` pieces — two docs within Hamming distance < chunks must
    * share at least one piece (pigeonhole), so candidate generation is
    * again an equi-join; verify with exact Hamming ≤ maxHamming. */
  def simhashPairs(df: DataFrame, maxHamming: Int,
                   idCol: String = "doc_id", textCol: String = "text",
                   chunks: Int = 4): DataFrame = {
    val sig = fanOut(df).select(col(idCol).as("id"), Text.simhash64(col(textCol)).as("sig"))
    hammingPairs(sig, maxHamming, chunks = chunks)
  }

  /** Pigeonhole near-dup pairs over an arbitrary (id, 64-bit sig)
    * frame — the banding+verify core of [[simhashPairs]], exposed so
    * the pairing operator works over any 64-bit signature (and so the
    * gate can audit it on engine-replayable synthetic signatures with
    * an exact `bit_count(xor)` oracle). Exhaustive for
    * `maxHamming < chunks`: two sigs within that distance must share
    * an identical chunk, so the candidate equi-join misses nothing. */
  def hammingPairs(sigs: DataFrame, maxHamming: Int,
                   idCol: String = "id", sigCol: String = "sig",
                   chunks: Int = 4): DataFrame = {
    require(chunks > maxHamming, "need chunks > maxHamming for pigeonhole recall")
    val bits = 64 / chunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val sig = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("sig"), c * bits).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "piece")
    // signatures are single longs — cheap to carry through the band join
    val l = banded.select(col("chunk"), col("piece"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("chunk"), col("piece"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "piece"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        Text.hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-dup pair set by iterative
    * min-label propagation: label(v) ← min(label(v), min label of
    * neighbors) until fixpoint. Near-dup clusters have tiny diameter,
    * so this converges in a handful of join+aggregate rounds; min-label
    * propagation needs O(diameter) rounds, so if `maxIter` rounds pass
    * without reaching the fixpoint (a chain-shaped graph — common in
    * shingled text, where A~B~C without A~C), the call ESCALATES to
    * [[connectedComponentsStar]] (O(log²n) rounds on any shape) rather
    * than ever returning non-converged labels.
    * Returns (id, component) where component = min id in the cluster.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // each round references the previous one TWICE (labels ⋈ f(edges,
    // labels)), so a lazy/persisted chain doubles the logical plan per
    // iteration — localCheckpoint (eager) truncates lineage so round
    // N's plan is O(1), not O(2^N).
    // Init folds the first propagation in: label(v) = min(v, Γ(v))
    // directly from the symmetric edge set — for the clique-heavy
    // near-dup graphs this IS the fixpoint, so the loop usually runs
    // exactly one confirming round instead of two.
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("component"))
      .select(col("src").as("id"), col("component"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("component")).as("ncomp"))
      // the eager checkpoint is the one real job per round; the
      // convergence flag is carried as a column so reading it back is
      // a short scan of checkpointed partitions, not a recompute
      val updated = labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("ncomp"), col("component")))
            .as("component"),
          (coalesce(col("ncomp"), col("component")) < col("component")).as("_chg"))
        .localCheckpoint()
      val changed = updated
        .agg(coalesce(sum(when(col("_chg"), 1L).otherwise(0L)), lit(0L)))
        .first().getLong(0)
      labels = updated.drop("_chg")
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    // Never hand back partial labels: past maxIter the graph has a
    // component with diameter > maxIter, exactly the shape the star
    // algorithm solves in O(log²n) rounds regardless of diameter.
    if (converged) labels else connectedComponentsStar(pairs)
  }

  /** Adaptive connected components: a pair set under `driverCap` rows
    * (the common case — near-dup pairs are bounded by the band join's
    * collision count, orders of magnitude below the corpus, and a
    * per-batch admission graph is smaller still) is solved with one
    * bounded collect + union-find, skipping the iterative join
    * rounds whose per-job latency dominates at small pair counts; a
    * larger set falls through to the distributed
    * [[connectedComponentsStar]] — O(log²n) rounds on ANY graph
    * shape, so chain-structured dup graphs (the shingled-text norm)
    * converge exactly where O(diameter) min-label propagation would
    * not. The cap picks the MECHANISM only — both paths return
    * (id, component = min id in cluster) for exactly the ids that
    * appear in `pairs`, and the driver path additionally comes back
    * as a local relation, so downstream anti-joins broadcast instead
    * of shuffling. */
  def connectedComponentsAdaptive(pairs: DataFrame,
                                  driverCap: Int = 100000): DataFrame = {
    val capped = pairs.select(col("id_a"), col("id_b")).limit(driverCap + 1).collect()
    if (capped.length > driverCap) connectedComponentsStar(pairs)
    else {
      val spark = pairs.sparkSession
      val idType = pairs.schema("id_a").dataType
      // the interpreted ordering compares Catalyst-internal values
      // (e.g. UTF8String), but collect() hands back external ones
      // (java.lang.String) — convert at the comparison boundary.
      // Memoized per distinct id: compare runs once per union, and
      // re-converting the same root each time would allocate a fresh
      // UTF8String per comparison. (External compareTo is NOT a
      // substitute: String orders by UTF-16 code unit, UTF8String by
      // UTF-8 byte — they disagree above the BMP, and the min-id
      // labels must match the distributed path's `min()` exactly.)
      val ordInternal = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(idType)
      val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(idType)
      val catalystOf = new java.util.HashMap[Any, Any]()
      def conv(x: Any): Any = {
        var c = catalystOf.get(x)
        if (c == null) { c = toCatalyst(x); catalystOf.put(x, c) }
        c
      }
      val ord = new Ordering[Any] {
        def compare(a: Any, b: Any): Int =
          ordInternal.compare(conv(a), conv(b))
      }
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      capped.foreach { p =>
        val (a, b) = (p.get(0), p.get(1))
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ord.lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      import scala.jdk.CollectionConverters._
      val rows = parent.keySet().asScala.toSeq
        .map(id => org.apache.spark.sql.Row(id, find(id)))
      spark.createDataFrame(rows.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("component", idType))))
    }
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): converges in O(log² n) rounds on ANY graph shape,
    * where plain min-label propagation needs O(diameter) rounds — the
    * upgrade path when dup chains get long at corpus scale.
    *
    *  - large-star: every node's neighbors larger than the node's
    *    current minimum attach directly to that minimum;
    *  - small-star: each node's ≤-neighbors attach to the minimum.
    *
    * Implemented as the standard edge-rewriting fixpoint: keep edge
    * set E as (u,v) with u > v invariant; each round computes per-node
    * min neighbor m(u) and rewrites (u,v) → (v, m(u)); fixpoint when
    * no edge changes. Same interface/result contract as
    * [[connectedComponents]]: (id, component = min id in cluster). */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // Edge invariant: u > v (the component representative is the
    // smallest id). localCheckpoint (eager) per round: each star op
    // references the previous edge set twice, so an unbroken lineage
    // would double the logical plan every iteration.

    // large-star: per node x over the SYMMETRIC adjacency, attach
    // every strictly-larger neighbor w to m(x) = min(Γ(x) ∪ {x}).
    // Output (w, m) already satisfies w > m since w > x ≥ m.
    def largeStar(edges: DataFrame): DataFrame = {
      val adj = edges.select(col("u").as("x"), col("v").as("y"))
        .union(edges.select(col("v").as("x"), col("u").as("y")))
      val m = adj.groupBy("x").agg(min(col("y")).as("mn"))
        .select(col("x"), least(col("mn"), col("x")).as("m"))
      adj.join(m, Seq("x"))
        .where(col("y") > col("x"))
        .select(col("y").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: per node u, attach its ≤-neighbors (all v of (u,v)
    // under the invariant) AND u itself to m(u) = min of those.
    def smallStar(edges: DataFrame): DataFrame = {
      val m = edges.groupBy("u").agg(min(col("v")).as("m"))
      val attachV = edges.join(m, Seq("u"))
        .select(col("v").as("a"), col("m").as("b"))
      val attachU = m.select(col("u").as("a"), col("m").as("b"))
      attachV.union(attachU)
        .select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    var edges = pairs.select(
      greatest(col("id_a"), col("id_b")).as("u"),
      least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var edgeCount = edges.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // converged when a full L+S round leaves the edge set unchanged:
      // no new edges AND same cardinality (a shrinking set also has an
      // empty anti-join). Both checks are short jobs over checkpointed
      // sets — no recompute lineage.
      val diff = next.join(edges, Seq("u", "v"), "left_anti").count()
      val nextCount = next.count()
      edges = next
      converged = diff == 0 && nextCount == edgeCount
      edgeCount = nextCount
      i += 1
    }
    // O(log²n) rounds means 25 covers any physically realizable graph;
    // fail loudly rather than ever emit under-merged components.
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds " +
        s"($edgeCount edges remaining) — raise maxIter")
    val labels = edges.select(col("u").as("id"), col("v").as("component"))
      .groupBy("id").agg(min("component").as("component"))
    val roots = labels.select(col("component")).distinct()
      .select(col("component").as("id"), col("component"))
    labels.unionByName(roots)
  }

  /** Full near-dup dedup: LSH candidates → hybrid-verified pairs
    * (estimator for clear-margin candidates, exact Jaccard near the
    * threshold — see [[lshHybridPairs]]) → components → keep the
    * min-id representative of each cluster (plus every unpaired
    * document). The survivor set matches the all-exact formulation
    * ([[lshExactPairs]]) up to the hybrid's ≈2e−10-per-pair
    * divergence bound (see [[lshHybridPairs]]), and is a
    * deterministic function of the data either way. */
  def dedupNearDups(df: DataFrame, threshold: Double,
                    idCol: String = "doc_id", textCol: String = "text",
                    cacheKey: Option[String] = None,
                    ccDriverCap: Int = 100000,
                    shingleSize: Int = 5): DataFrame = {
    // EXACT-COPY PRE-COLLAPSE: replica-heavy corpora (the realistic
    // web profile; the sf1/sf5 scale fixtures are 10-50× exact
    // replicas) would otherwise pay signatures, banding, and CC once
    // per copy. Equal raw-text fingerprint ⇒ Jaccard exactly 1 ⇒ in
    // the all-exact formulation every exact group clusters with its
    // min-id member — so running LSH + CC over ONE representative
    // per distinct text (the group min) and dropping every
    // non-representative is OUTPUT-IDENTICAL: a component's min over
    // reps equals its min over all members (each rep IS its group's
    // min), and texts shorter than `shingleSize` never pair in
    // either formulation (they bypass the collapse and survive;
    // the SAME size is passed to lshHybridPairs below, so the two
    // eligibility cutoffs cannot drift). Same 2^-64 fp-collision
    // assumption hybridVerify documents.
    //
    // Shuffle shape: text NEVER rides an exchange here. (_id, _fp) is
    // one projected text scan (ids-only thereafter, 16 bytes/doc,
    // checkpointed because two branches read it); the group-min agg
    // and losers join are ids-only; rep ROWS come from a second
    // corpus scan semi-joined to the rep ids (scanning again is
    // strictly cheaper than shipping one document per distinct
    // fingerprint through the aggregation exchange, and when the rep
    // set is small — the replica-heavy case — AQE broadcasts it and
    // the fetch is map-only).
    // no fanOut here: one xxhash64 per row is scan-cheap, and the
    // fan-out repartition would shuffle the full text rows it exists
    // to avoid (the heavy signature math fans out inside
    // signatureTable, over the already-collapsed reps)
    val idFp = df
      .where(length(col(textCol)) >= shingleSize)
      .select(col(idCol).as("_id"), xxhash64(col(textCol)).as("_fp"))
    // idFp is deliberately NOT checkpointed: its two readers cost one
    // extra projected scan each, cheaper than an eager ids
    // materialization at fixture scale and scan-bandwidth-bound at
    // 100 TB. groups IS checkpointed — two longs per distinct text,
    // read by both the rep fetch and the losers join.
    // groups is deliberately lazy: its two readers re-run an ids-only
    // aggregation, cheaper than an eager checkpoint job at any scale
    // where the input is bounded (and it is — see the scan note)
    val groups = idFp.groupBy(col("_fp")).agg(min(col("_id")).as("_rep"))
    val reps = df
      .join(groups.select(col("_rep").as(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol), col(textCol))
    val exactLosers = idFp.join(groups, Seq("_fp"))
      .where(col("_id") =!= col("_rep"))
      .select(col("_id").as(idCol))
    // distinct-text reps get their own staged-signature key — the
    // unsuffixed key may already hold the full-corpus artifact for
    // other operators sharing it (dedupIncremental, StreamNearDup)
    val pairs = lshHybridPairs(reps, threshold, idCol, textCol,
      shingleSize = shingleSize, cacheKey = cacheKey.map(_ + "#reps"))
    val comps = connectedComponentsAdaptive(pairs, ccDriverCap)
    val repLosers = comps.where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(repLosers.union(exactLosers), Seq(idCol), "left_anti")
  }

  /** INCREMENTAL near-dup dedup: admit the rows of `batch` that are
    * near-dups of neither the already-admitted `corpus` nor the
    * canonical representative of their own intra-batch cluster — the
    * production shape for continuously-ingested training data, where
    * re-deduping the full corpus per arriving batch is unaffordable.
    *
    * Semantics (oracle-checkable, deterministic): (1) drop every
    * batch row whose exact shingle Jaccard with ANY corpus row is ≥
    * `threshold` (verified hybrid — estimator at clear margin, exact
    * near the threshold, see [[lshHybridPairs]] for the divergence
    * bound); (2) cluster the SURVIVORS by their intra-batch near-dup
    * pairs and keep the min-id representative per cluster.
    * Clustering runs over corpus-survivors, not the whole batch, so a
    * cluster whose representative was itself a corpus-dup does not
    * silently lose its remaining members.
    *
    * Scale shape: the corpus is touched ONLY through its signature
    * table (id + k longs, ~100× smaller than the corpus text) — with
    * `corpusCacheKey` that artifact is staged once per session, and
    * at warehouse scale it is the signature table you'd maintain as a
    * persistent side output of admission (append each batch's
    * admitted signatures). Candidate generation on both paths is an
    * equi-join on (band, bucket); per-batch work scales with
    * |batch| · collision rate, never with |corpus|. Corpus text is
    * re-read only for the near-threshold sliver of cross candidates
    * (broadcast-semi-pruned id fetch). */
  def dedupIncremental(batch: DataFrame, corpus: DataFrame, threshold: Double,
                       idCol: String = "doc_id", textCol: String = "text",
                       shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 8,
                       margin: Double = 0.3,
                       corpusCacheKey: Option[String] = None,
                       ccDriverCap: Int = 100000): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // Batch-side EXACT-COPY PRE-COLLAPSE — the dedupNearDups argument
    // carried over to the bipartite shape (re-crawled batches are the
    // replica-heavy profile this operator exists for). A non-rep
    // member m with rep r (its group's min id) always drops: if r is
    // a corpus dup then m is too (identical text ⇒ identical Jaccard
    // vs every corpus doc — group verdicts are atomic), else m
    // clusters with r intra-batch at Jaccard exactly 1 and can never
    // be its component's canonical (m > r ≥ component min). So the
    // full pipeline runs over one representative per distinct text,
    // and dropping every non-representative is OUTPUT-IDENTICAL.
    // Sub-shingle-length texts bypass on both sides (no signature ⇒
    // never pair ⇒ always admitted, pre and post).
    val idFp = batch
      .where(length(col(textCol)) >= shingleSize)
      .select(col(idCol).as("_id"), xxhash64(col(textCol)).as("_fp"))
    // lazy for the same reason as dedupNearDups' groups: two ids-only
    // re-aggregations beat one eager checkpoint job
    val fpGroups = idFp.groupBy(col("_fp")).agg(min(col("_id")).as("_rep"))
    val batchReps = batch
      .join(fpGroups.select(col("_rep").as(idCol)), Seq(idCol), "left_semi")
    val exactLosers = idFp.join(fpGroups, Seq("_fp"))
      .where(col("_id") =!= col("_rep"))
      .select(col("_id").as(idCol))
    val numHashes = bands * rowsPerBand
    val corpusCached = corpusCacheKey.isDefined
    val cSig0 = signatureTable(corpus, numHashes, shingleSize, idCol, textCol, corpusCacheKey)
    val cSig = if (corpusCached) cSig0 else cSig0.persist(StorageLevel.MEMORY_AND_DISK)
    // the batch signature table feeds the cross band join, both sides
    // of the intra-batch band join, and both verify stages
    val bSig = signatureTable(batchReps, numHashes, shingleSize, idCol, textCol, None)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      bSig.count() // materialize once before concurrent readers
      // The cross (batch×corpus) and intra (batch×batch) verify
      // pipelines are INDEPENDENT: intra pairs are verified over the
      // whole batch, and pairs touching a corpus-dup are dropped
      // relationally afterwards — the surviving pair set is identical
      // to verifying only corpus-survivors (per-pair verification
      // doesn't depend on other pairs), and the handful of extra
      // verified pairs is bounded by the batch's own candidate count.
      // Removing that sequential dependency lets both pipelines'
      // jobs overlap in the scheduler (same bounded-pool pattern as
      // Catalog.compactPartitioned).
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val corpusDupsF = Future {
          hybridVerify(crossBandCandidates(bSig, cSig, bands, rowsPerBand),
            bSig, cSig, batchReps, corpus,
            threshold, margin, numHashes, shingleSize, idCol, textCol,
            eager = false)
            .select(col("id_a").as("id")).distinct()
            .localCheckpoint() // read 3×: intra filter, final anti-join
        }
        val intraAllF = Future {
          hybridVerify(bandCandidates(bSig, bands, rowsPerBand),
            bSig, bSig, batchReps, batchReps,
            threshold, margin, numHashes, shingleSize, idCol, textCol)
        }
        val corpusDups = Await.result(corpusDupsF,
          scala.concurrent.duration.Duration.Inf)
        val intraPairs = Await.result(intraAllF,
          scala.concurrent.duration.Duration.Inf)
          .join(corpusDups.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
          .join(corpusDups.select(col("id").as("id_b")), Seq("id_b"), "left_anti")
        val nonCanonical = connectedComponentsAdaptive(intraPairs, ccDriverCap)
          .where(col("component") < col("id")).select(col("id"))
        val dropIds = corpusDups.union(nonCanonical).select(col("id").as(idCol))
          .union(exactLosers)
        batch.join(dropIds, Seq(idCol), "left_anti")
      } finally { pool.shutdown(); () }
    } finally { bSig.unpersist(); if (!corpusCached) cSig.unpersist(); () }
  }

  /** Exact n-gram Jaccard over a bounded pair set (for oracle-sized
    * verification and as the verify stage other variants reuse). The
    * all-pairs form exists for completeness/testing only — production
    * paths go through [[minhashLsh]]/[[simhashPairs]]. */
  def ngramJaccardPairs(df: DataFrame, threshold: Double, shingleSize: Int,
                        idCol: String = "doc_id", textCol: String = "text",
                        shingler: (Column, Int) => Column = Text.wordShingles): DataFrame = {
    val sh = fanOut(df).select(col(idCol).as("id"),
      shingler(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
    val l = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    l.crossJoin(r)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Text.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
