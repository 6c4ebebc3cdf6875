package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sim
import graft.operators.Dedup

class DedupSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val loremA = "the quick brown fox jumps over the lazy dog while " +
    "the sun sets slowly behind the distant mountains of the west"
  private val loremA2 = loremA.replace("slowly", "quickly") // near-dup of A
  private val loremB = "functional programming with immutable data structures " +
    "enables safe parallel computation across many machines in a cluster"

  private lazy val docs = Seq(
    (0L, loremA), (1L, loremA2), (2L, loremB), (3L, loremA))
    .toDF("doc_id", "text")

  test("exact dedup keeps min id per identical text") {
    val kept = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L)) // doc 3 == doc 0
  }

  test("fingerprint dedup counts duplicates") {
    val r = Dedup.byFingerprint(docs, "text", "doc_id")
      .where($"n_dups" === 2).select("doc_id").as[Long].collect().toSeq
    assert(r == Seq(0L))
  }

  test("minhash LSH finds the planted near-dup pair and the exact dup") {
    val pairs = Dedup.minhashLsh(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L))) // near dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // B unrelated
  }

  test("simhash pairs finds near-dups within hamming 3") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // identical → hamming 0
  }

  test("ngram jaccard all-pairs agrees with minhash verify stage") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5, shingleSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)) && pairs.contains((0L, 1L)))
  }

  test("connectedComponents: chain a-b, b-c merges into one cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("connectedComponentsStar equals label propagation on adversarial graph shapes") {
    val rnd = new scala.util.Random(13)
    // a 60-node chain (worst case for O(diameter) propagation), a
    // 40-leaf star rooted at the max id, and a random sparse graph
    val chain = (0L until 59L).map(i => (i, i + 1))
    val star = (100L until 140L).map(i => (i, 999L))
    val random = Seq.fill(80)((200L + rnd.nextInt(60), 200L + rnd.nextInt(60)))
      .filter(p => p._1 != p._2)
    val pairs = (chain ++ star ++ random).toDF("id_a", "id_b")
    val viaProp = Dedup.connectedComponents(pairs, maxIter = 100)
      .as[(Long, Long)].collect().toMap
    val viaStar = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaStar == viaProp)
    assert(viaStar(59L) == 0L) // chain fully collapsed to its min
    assert(viaStar(999L) == 100L)
  }

  test("connectedComponentsAdaptive: driver path equals distributed on both sides of the cap") {
    val rnd = new scala.util.Random(29)
    val chain = (0L until 40L).map(i => (i, i + 1))
    val random = Seq.fill(60)((100L + rnd.nextInt(50), 100L + rnd.nextInt(50)))
      .filter(p => p._1 != p._2)
    val pairs = (chain ++ random).toDF("id_a", "id_b")
    val viaProp = Dedup.connectedComponents(pairs, maxIter = 100)
      .as[(Long, Long)].collect().toMap
    // under the cap: driver union-find
    val viaDriver = Dedup.connectedComponentsAdaptive(pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaProp)
    // cap forced to 0: must fall through to the distributed path and
    // still agree
    val viaFallthrough = Dedup.connectedComponentsAdaptive(pairs, driverCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(viaFallthrough == viaProp)
    // non-numeric ids: min is Spark's own ordering (lexicographic)
    val strPairs = Seq(("b", "a"), ("b", "c"), ("z", "y")).toDF("id_a", "id_b")
    val strComps = Dedup.connectedComponentsAdaptive(strPairs)
      .as[(String, String)].collect().toMap
    assert(strComps == Map("a" -> "a", "b" -> "a", "c" -> "a", "y" -> "y", "z" -> "y"))
    // empty pair set: empty labels, correct schema
    val empty = Dedup.connectedComponentsAdaptive(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(empty.columns.toSeq == Seq("id", "component") && empty.count() == 0)
  }

  test("connectedComponents escalates past maxIter: 40-hop chain fully merges") {
    // diameter 40 > maxIter 20 — propagation alone would return
    // under-merged labels; the escalation to the star algorithm must
    // deliver the exact fixpoint anyway.
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain, maxIter = 5)
      .as[(Long, Long)].collect().toMap
    assert(comps.size == 41 && comps.values.forall(_ == 0L))
  }

  test("production dedup entry points: 100+-hop chain, distributed CC branch") {
    // 120 sliding-window docs: consecutive docs share 20 of 21
    // shingles (jaccard ≈ 0.91 ≥ 0.85), two-step share 19 of 23
    // (≈ 0.83 < 0.85) — so the verified pair graph is a 119-hop
    // chain, the worst case for O(diameter) propagation. ccDriverCap
    // = 0 forces the distributed branch that production hits at
    // corpus scale; exact components ⇒ a single survivor (min id).
    val words = (0 until 145).map(i => s"w$i")
    val chainDocs = (0 until 120)
      .map(i => (i.toLong, words.slice(i, i + 25).mkString(" ")))
      .toDF("doc_id", "text")
    val survivors = Dedup.dedupNearDups(chainDocs, threshold = 0.85,
        ccDriverCap = 0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(0L))
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val admitted = Dedup.dedupIncremental(chainDocs, emptyCorpus,
        threshold = 0.85, ccDriverCap = 0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(admitted == Seq(0L))
  }

  test("dedupNearDups keeps one representative per cluster + unpaired docs") {
    val survivors = Dedup.dedupNearDups(docs, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // cluster {0,1,3} (near-dups + exact dup) collapses to 0; 2 unpaired
    assert(survivors == Seq(0L, 2L))
  }

  test("dedupIncremental: corpus dups dropped, survivors clustered, short docs admitted") {
    val loremD = "observability dashboards aggregate latency percentiles " +
      "error rates and saturation metrics across distributed services for the oncall engineer"
    val loremD2 = loremD.replace("oncall", "platform") // near-dup of D
    val corpus = Seq((100L, loremA), (101L, loremB)).toDF("doc_id", "text")
    val batch = Seq(
      (200L, loremA2), // near-dup of corpus 100 → dropped
      (201L, loremD),  // novel → admitted (cluster representative)
      (202L, loremD2), // intra-batch near-dup of 201 → dropped
      (203L, "tiny")   // below shingle size → no signature → admitted
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupIncremental(batch, corpus, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(201L, 203L))
  }

  test("dedupIncremental with an empty corpus equals dedupNearDups") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val inc = Dedup.dedupIncremental(docs, empty, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val full = Dedup.dedupNearDups(docs, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(inc == full)
  }

  test("cosine: identical vectors → 1, orthogonal → 0") {
    val df = Seq(
      (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)))
      .toDF("a", "b")
      .select(round(Sim.cosine(Sim.asDouble($"a"), Sim.asDouble($"b")), 6).as("c"))
      .as[Double].collect().toSeq
    assert(df == Seq(1.0, 0.0))
  }

  test("knnBrute returns k nearest by cosine, excluding self") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0f, 1f)), (3L, Seq(1f, 0.05f)))
      .toDF("vec_id", "embedding")
    val r = Sim.knnBrute(vecs.where($"vec_id" === 0), vecs, k = 2)
      .select("neighbor_id", "rnk").as[(Long, Long)].collect().toSeq
    assert(r == Seq((3L, 1L), (1L, 2L))) // 3 is closer to [1,0] than 1
  }

  test("IVF search achieves good recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 25).flatMap { c =>
      val base = Array.fill(32)(rnd.nextGaussian().toFloat * 3f)
      (0 until 8).map { i =>
        val v = base.map(x => x + 0.1f * rnd.nextGaussian().toFloat)
        ((c * 8 + i).toLong, v.toSeq)
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" % 8 === 0) // one query per cluster
    val truth = graft.functions.Sim.knnBrute(queries, df, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val index = graft.functions.Ivf.train(df, k = 10, iters = 4)
    val got = graft.functions.Ivf.search(queries, df, index, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.85, s"recall $recall")

    // the persisted-lists artifact returns the identical result set
    val listsPath = java.nio.file.Files.createTempDirectory("ivf_lists").toString
    graft.functions.Ivf.writeLists(df, index, listsPath)
    val viaArtifact = graft.functions.Ivf
      .searchIndexed(queries, listsPath, index, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(viaArtifact == got)
  }

  test("SRP near-dup achieves good recall vs brute force on clustered vectors") {
    // 20 clusters of 3 near-identical 64-dim vectors
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20).flatMap { c =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 3).map { i =>
        val v = base.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
        ((c * 3 + i).toLong, v.toSeq)
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Sim.nearDupPairs(df, threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth: within-cluster pairs have cosine ~0.999
    val truth = (0 until 20).flatMap { c =>
      val ids = (0 until 3).map(i => (c * 3 + i).toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall")
    assert(got.forall(truth.contains), "no false positives at 0.98")
  }

  test("lshHybridPairs matches lshExactPairs including near-threshold pairs") {
    val common = "shared middle segment with plenty of overlapping text content " +
      "that keeps the five gram sets partially aligned between the documents"
    val corpus = Seq(
      (0L, loremA), (1L, loremA2), (2L, loremB), (3L, loremA), // clear dups + unrelated
      (4L, "unique prefix alpha beta gamma " + common),        // borderline pair vs 5
      (5L, common + " unique suffix delta epsilon zeta"),
      (6L, "completely different content about distributed query engines and columnar storage")
    ).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = ids(Dedup.lshExactPairs(corpus, threshold = 0.5))
    // default margin: estimator for clear pairs, exact re-join near 0.5
    assert(ids(Dedup.lshHybridPairs(corpus, threshold = 0.5)) == exact)
    // degenerate margins: all-exact (margin 1) and all-estimator (margin 0)
    // must also agree on this corpus (clear pairs are clear by construction)
    assert(ids(Dedup.lshHybridPairs(corpus, threshold = 0.5, margin = 1.0)) == exact)
    // high threshold: threshold + margin > 1 leaves no estimator
    // fast-accept, so identical texts ride the fingerprint
    // short-circuit — (0,3) must pair, near-dups must not, and the
    // result still matches the all-exact formulation
    val exactHi = ids(Dedup.lshExactPairs(corpus, threshold = 0.9))
    assert(exactHi.contains((0L, 3L)) && !exactHi.contains((0L, 1L)))
    assert(ids(Dedup.lshHybridPairs(corpus, threshold = 0.9)) == exactHi)
  }

  test("signatureTable: same cache key returns the same staged artifact") {
    val a = Dedup.signatureTable(docs, numHashes = 128, shingleSize = 5,
      cacheKey = Some("spec-sig-key"))
    val b = Dedup.signatureTable(docs, numHashes = 128, shingleSize = 5,
      cacheKey = Some("spec-sig-key"))
    assert(a eq b) // staged once, reused — the build-artifact contract
  }

  test("cosine similarity of a zero-norm vector is 0.0, never NaN") {
    val r = Seq((Seq(0f, 0f, 0f), Seq(1f, 2f, 3f))).toDF("a", "b")
      .select(graft.expressions.NativeVector.cosineSim($"a", $"b").as("c"))
      .as[Double].head()
    assert(r == 0.0)
  }

  test("Ivf.train survives a corpus with fewer distinct vectors than k") {
    val vecs = Seq.fill(5)(Seq(1f, 0f)) ++ Seq.fill(4)(Seq(0f, 1f)) ++
      Seq.fill(3)(Seq(1f, 1f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val idx = graft.functions.Ivf.train(df, k = 8, iters = 1)
    assert(idx.numLists == 3) // 3 distinct vectors -> 3 lists, no dup seeds
  }

  test("int8-quantized kNN preserves neighbor ranking (recall vs exact)") {
    // clustered corpus: each query's true neighbors are its
    // cluster-mates at cosine ~0.999, far above the ~0 background —
    // the regime where ANN/quantization recall is meaningful (random
    // gaussian corpora have near-tied rankings where any epsilon
    // reorders neighbors)
    val rnd2 = new scala.util.Random(11)
    val vecs = (0 until 15).flatMap { c =>
      val base = Array.fill(32)(rnd2.nextGaussian())
      (0 until 4).map { i =>
        ((c * 4 + i).toLong,
          base.map(x => (x + 0.01 * rnd2.nextGaussian()).toFloat).toSeq)
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    val deq = df.select($"vec_id", Sim.asDouble($"embedding").as("e"))
      .withColumn("sc", Sim.quantScale($"e"))
      .select($"vec_id", Sim.dequantize(Sim.quantize($"e", $"sc"), $"sc").as("embedding"))
    def topk(corpus: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      Sim.knnBrute(corpus.where($"vec_id" < 5), corpus, k = 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(df)
    val quant = topk(deq)
    // keys is a Set — map through an iterator so equal per-query
    // overlaps don't collapse before averaging
    val overlap = exact.keys.iterator.map(q =>
      (exact(q) & quant(q)).size.toDouble / exact(q).size).sum / exact.size
    assert(overlap >= 0.85, s"quantized recall $overlap")
  }
}
