package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{NativePq, NativeVector}
import graft.functions.{Ivf, Pq}

/** Product quantization over the deterministic clustered fixture
  * shared with x14b/x52/x54: 96 vectors, 12 planted clusters of 8,
  * within-cluster jitter ≈ 1/1024 — so per-subspace codebooks of 16
  * entries can capture the ≤13 distinct base patterns per subspace
  * and reconstruction error must land near the jitter floor. */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val synth = spark.range(96)
    .select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), j =>
        (((col("id") / 8).cast(LongType) * 31 + j * 7) % 13 - 6).cast(DoubleType)
          + ((col("id") * 13 + j * 5) % 7 - 3).cast(DoubleType) / 1024.0)
        .as("embedding"))

  private lazy val books =
    Pq.codebooksFor("pqspec-synth12", synth, m = 4, ksub = 16, iters = 3)
  private lazy val ivf =
    Ivf.indexFor("pqspec-ivf-synth12", synth, k = 12, iters = 3)

  test("codebook shape: m x ksub x subDim, cache returns the artifact") {
    assert(books.m == 4 && books.subDim == 4)
    assert(books.books.forall(_.forall(_.length == 4)))
    assert(books.ksub <= 16 && books.ksub >= 12,
      s"expected ~13 distinct patterns per subspace, got ksub=${books.ksub}")
    assert(Pq.codebooksFor("pqspec-synth12", sys.error("must not retrain"),
      m = 4) eq books)
  }

  test("reconstruction: decoded direction within jitter of the original") {
    // decode = per-subspace codebook lookup; compare cosine of the
    // original against its own decoded form — quantizing direction
    // only, this must sit at ~1 for every vector
    val coded = synth.select(col("vec_id"),
      col("embedding").as("v"),
      NativePq.encode(col("embedding"), books.books).as("e"))
    val sims = coded.select(
      Pq.adcSim(col("v"), col("e.codes"), col("e.norm"), books).as("selfSim"))
      .as[Double].collect()
    assert(sims.length == 96 && sims.min > 0.999,
      s"worst self-similarity ${sims.min} — codebooks missed a cluster pattern")
  }

  test("adcSim tracks exact cosine on mate and non-mate pairs") {
    val v = synth.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val c = synth.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      NativePq.encode(col("embedding"), books.books).as("e"))
    val diffs = v.crossJoin(c).where(col("id_a") < col("id_b"))
      .select(abs(NativeVector.cosineSim(col("va"), col("vb")) -
        Pq.adcSim(col("va"), col("e.codes"), col("e.norm"), books)).as("d"))
      .agg(max(col("d"))).as[Double].head()
    assert(diffs < 0.005, s"max |exact - adc| = $diffs")
  }

  test("IVF-PQ search: 5 results per query, every one a cluster mate") {
    // every query's 7 mates sit at cosine ≈ 1 within ~0.001 of each
    // other, so WHICH 5 of the 7 rank on top is a near-tie that
    // quantization legitimately reorders — the design-case property
    // is membership: all k results come from the query's cluster and
    // nothing cross-cluster (separation ≫ quantization error) sneaks in
    val coded = Pq.encodeLists(synth, ivf, books)
    val queries = synth.where(col("vec_id") < 10)
    val pq = Pq.search(queries, coded, ivf, books, k = 5, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
    assert(pq.length == 50, s"expected 10 queries x 5, got ${pq.length}")
    val nonMates = pq.filterNot { case (q, n) => q / 8 == n / 8 }
    assert(nonMates.isEmpty, s"cross-cluster results: ${nonMates.toSeq}")
  }

  test("ksub > 128: codes above Byte.MaxValue survive training and scoring") {
    // regression: signed-byte code ids (236 reads as −20) crashed the
    // Lloyd update before the pmod fix — train a 256-entry book over
    // the real embeddings fixture and require round-trip sanity
    val emb = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "embeddings")
    val big = Pq.codebooksFor("pqspec-256", emb, m = 16, ksub = 256, iters = 2)
    assert(big.m == 16 && big.subDim == 4)
    val coded = emb.select(col("vec_id"), col("embedding").as("v"),
      NativePq.encode(col("embedding"), big.books).as("e"))
    // at least one code id must actually exceed 127 for the test to bite
    val maxCode = coded.select(explode(col("e.codes")).as("c"))
      .select(pmod(col("c").cast("int"), lit(256)).as("u"))
      .agg(max(col("u"))).head().getInt(0)
    assert(maxCode > 127, s"fixture too small to exercise high codes ($maxCode)")
    val worst = coded.select(
      Pq.adcSim(col("v"), col("e.codes"), col("e.norm"), big).as("s"))
      .agg(min(col("s"))).as[Double].head()
    assert(worst > 0.9, s"self-similarity $worst — high codes decode wrong")
  }

  test("searchRefined: rerank output is the exact cosine top-k of its shortlist") {
    val coded = Pq.encodeLists(synth, ivf, books)
    val queries = synth.where(col("vec_id") < 10)
    val refined = Pq.searchRefined(queries, coded, synth, ivf, books,
      k = 5, shortlist = 20, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
    assert(refined.length == 50)
    // the clustered case again: every refined neighbor is a mate
    assert(refined.forall { case (q, n) => q / 8 == n / 8 })
  }

  test("zero-norm guard: degenerate vectors score 0, never NaN") {
    val z = Seq((1L, Seq.fill(16)(0.0)), (2L, Seq.tabulate(16)(_.toDouble)))
      .toDF("vec_id", "embedding")
    val coded = z.select(col("vec_id"),
      NativePq.encode(col("embedding"), books.books).as("e"))
    val s = z.where(col("vec_id") === 1L).crossJoin(coded)
      .select(Pq.adcSim(col("embedding"), col("e.codes"), col("e.norm"),
        books).as("s")).as[Double].collect()
    assert(s.forall(x => !x.isNaN) && s.forall(_ == 0.0))
  }
}
