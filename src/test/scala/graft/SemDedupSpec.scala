package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.NativeVector
import graft.functions.Ivf
import graft.operators.SemDedup

/** Semantic dedup (SemDeDup) over the deterministic clustered fixture
  * shared with the x14b/x52 gates: 96 vectors, 12 planted clusters of
  * 8, mate cosine ≈ 1, cross-cluster cosine far below threshold. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val synth = spark.range(96)
    .select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), j =>
        (((col("id") / 8).cast(LongType) * 31 + j * 7) % 13 - 6).cast(DoubleType)
          + ((col("id") * 13 + j * 5) % 7 - 3).cast(DoubleType) / 1024.0)
        .as("embedding"))

  private lazy val index = Ivf.indexFor("semdedup-spec-synth12", synth, k = 12, iters = 3)

  test("fixture sanity: mates above threshold, cross-cluster far below") {
    val v = synth.select(col("vec_id").as("id"), col("embedding").as("v"))
    val pairs = v.select(col("id").as("id_a"), col("v").as("v_a"))
      .crossJoin(v.select(col("id").as("id_b"), col("v").as("v_b")))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(NativeVector.cosineSim(col("v_a"), col("v_b")), 4).as("sim"),
        ((col("id_a") / 8).cast(LongType) === (col("id_b") / 8).cast(LongType))
          .as("mates"))
      .collect()
    val mateSims = pairs.filter(_.getBoolean(3)).map(_.getDouble(2))
    val crossSims = pairs.filterNot(_.getBoolean(3)).map(_.getDouble(2))
    assert(mateSims.length == 12 * 28 && mateSims.min >= 0.999)
    assert(crossSims.max < 0.999,
      s"cross-cluster max cosine ${crossSims.max} breaches the threshold")
  }

  test("semanticPairs finds every mate pair (12 cliques of 8)") {
    val got = SemDedup.semanticPairs(synth, index, threshold = 0.999, probes = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      c <- 0 until 12; a <- 0 until 8; b <- (a + 1) until 8
    } yield (c * 8L + a, c * 8L + b)).toSet
    assert(got == want)
  }

  test("semDedup keeps the min-id member of each planted cluster") {
    val kept = SemDedup.semDedup(synth, k = 12, threshold = 0.999, probes = 2,
        indexKey = Some("semdedup-spec-synth12"))
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == (0 until 12).map(_ * 8L))
  }

  test("keepFarthest keeps the member least similar to its centroid") {
    val kept = SemDedup.semDedup(synth, k = 12, threshold = 0.999, probes = 2,
        keepFarthest = true, indexKey = Some("semdedup-spec-synth12"))
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept.length == 12, s"one survivor per planted cluster, got $kept")
    // exactly one survivor per planted cluster, and each is that
    // cluster's argmin (cent_sim, id) — replay the policy directly
    val v = synth.select(col("vec_id").as("id"),
      col("embedding").as("v"),
      NativeVector.nearestCentroid(col("embedding"), index.centroids).as("cell"))
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cent")
    val want = v.join(cents, Seq("cell"))
      .select((col("id") / 8).cast("long").as("cluster"),
        round(NativeVector.cosineSim(col("v"), col("cent")), 6).as("cs"), col("id"))
      .groupBy("cluster").agg(min(struct(col("cs"), col("id"))).as("m"))
      .select(col("m.id")).as[Long].collect().sorted.toSeq
    assert(kept == want)
  }

  test("exact vector copies collapse: survivors unchanged by replication") {
    // copies under fresh ids (the replica-corpus profile): the
    // collapse stage must route them to their original's group, so
    // survivors are the same 12 min ids as the unreplicated corpus
    val copies = synth.select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val replicated = synth.unionByName(copies).unionByName(
      synth.select((col("vec_id") + 2000).as("vec_id"), col("embedding")))
    val kept = SemDedup.semDedup(replicated, k = 12, threshold = 0.999, probes = 2,
        indexKey = Some("semdedup-spec-synth12"))
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == (0 until 12).map(_ * 8L))
  }

  test("copies of an isolated vector still dedup; nulls and unreachable thresholds survive") {
    // one lonely vector replicated 3x: no near-dup neighbor, but the
    // copies are cosine-1 duplicates of each other -> min id survives
    val lone = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (7L, Seq(1.0, 0.0, 0.0)),
      (9L, Seq(1.0, 0.0, 0.0)), (4L, Seq(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val kept = SemDedup.semDedup(lone, k = 2, threshold = 0.99)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
    // null embedding rows never pair and always survive
    val withNull = lone.unionByName(
      Seq((99L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "embedding"))
    val keptN = SemDedup.semDedup(withNull, k = 2, threshold = 0.99)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(keptN == Seq(1L, 4L, 99L))
    // threshold past cosine's range: identical copies are NOT dups
    assert(SemDedup.semDedup(lone, k = 2, threshold = 1.01).count() == 4)
  }

  test("corpus with no high-cosine pairs survives intact") {
    // the real embeddings fixture's property (max pairwise cosine ≈
    // 0.46) modeled by thresholding the synth far above mate cosine:
    // nothing pairs, everything survives
    val kept = SemDedup.semDedup(synth, k = 12, threshold = 1.1, probes = 2,
        indexKey = Some("semdedup-spec-synth12"))
      .count()
    assert(kept == 96)
  }
}
