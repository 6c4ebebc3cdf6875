package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Train/test decontamination (SURVEY.md north-star extension): find
  * evaluation documents whose word n-grams also appear in the training
  * split — the standard overlap check run before training so test
  * metrics aren't inflated by memorized spans.
  *
  * Scale design: one exploded n-gram stream per document (distinct
  * within the document by construction of the native expression), a
  * map-side-deduplicated distinct over the train side, then a semi
  * join keyed on the n-gram — hash shuffle with bounded fan-in, no
  * cross product, same class as the dedup band joins. At 100 TB the
  * train-gram set is the big side and shuffles once; hashing grams to
  * 64-bit keys before the join (xxhash64) would shrink the shuffle a
  * further ~10× when gram text is long.
  */
object Decontaminate {

  /** Per-test-document count of distinct word n-grams that appear in
    * ANY train document. Only contaminated documents (≥1 hit) are
    * returned: (idCol, n_hits). */
  def ngramOverlap(docs: DataFrame, splitCol: String,
                   trainVal: String, testVal: String, n: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = Dedup.fanOut(docs).select(col(idCol), col(splitCol),
      explode(graft.expressions.NativeText.wordNgrams(
        Text.tokens(col(textCol)), n)).as("gram"))
    val train = grams.where(col(splitCol) === trainVal)
      .select(col("gram")).distinct()
    grams.where(col(splitCol) === testVal)
      .join(train, Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits")) // grams are distinct per doc
  }

  /** Graded decontamination (the Lee et al. 2022 / GPT-3-appendix
    * refinement of the binary [[ngramOverlap]] check): per test
    * document, the FRACTION of its distinct word n-grams that appear
    * in any train document — binary overlap over-flags documents
    * sharing one idiomatic phrase; thresholding on the fraction is
    * what production decontamination actually does. Returns EVERY
    * test document with ≥ n tokens: `(idCol, n_grams, n_hits,
    * frac_e4)` with the fraction half-up-quantized to 1e-4 (the
    * integer-exactness convention). Documents shorter than n tokens
    * have no grams and are not judged.
    *
    * Same scale shape as [[ngramOverlap]] — one distinct-gram stream
    * per side, one hash join on the gram key (LEFT, so misses count
    * the denominator), one per-doc aggregation. */
  def overlapFraction(docs: DataFrame, splitCol: String,
                      trainVal: String, testVal: String, n: Int,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val grams = Dedup.fanOut(docs).select(col(idCol), col(splitCol),
      explode(graft.expressions.NativeText.wordNgrams(
        Text.tokens(col(textCol)), n)).as("gram"))
    val train = grams.where(col(splitCol) === trainVal)
      .select(col("gram")).distinct()
      .withColumn("__hit", lit(1L))
    grams.where(col(splitCol) === testVal)
      .join(train, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), // distinct per doc by construction
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col(idCol), col("n_grams"), col("n_hits"),
        floor(col("n_hits") * 10000.0 / col("n_grams") + 0.5)
          .cast("long").as("frac_e4"))
  }

  /** SEMANTIC decontamination: corpus rows whose embedding lands
    * within `threshold` cosine of ANY benchmark embedding — the
    * embedding-space complement of [[ngramOverlap]] (n-grams miss
    * paraphrased leaks; cosine catches them). Returns one row per
    * contaminated corpus doc: (idCol, bench_id, sim) with its BEST
    * benchmark match (sim desc, bench_id asc — deterministic).
    *
    * Scale design: benchmark/eval sets are small by definition, so
    * the bench side is BROADCAST and the corpus streams through a
    * single nested-loop scan (the x05 brute-kNN shape, but with the
    * BIG side streaming); the threshold filter runs before any
    * aggregation, so only contaminated rows — a tiny fraction — ever
    * reach the top-1 shuffle, and that aggregation is the bounded-heap
    * [[graft.functions.TopKAgg]] with map-side partials. No corpus
    * shuffle at any point: at 100 TB this is one scan. */
  def semantic(corpus: DataFrame, bench: DataFrame, threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = Dedup.fanOut(corpus)
      .select(col(idCol), col(vecCol).as("_cv"))
    val b = bench.select(col(idCol).as("bench_id"), col(vecCol).as("_bv"))
    val scored = c.crossJoin(broadcast(b))
      .select(col(idCol), col("bench_id"),
        round(graft.expressions.NativeVector.cosineSim(col("_cv"), col("_bv")), 4)
          .as("sim"))
      .where(col("sim") >= threshold)
    graft.functions.Sim.topKPerGroup(scored, idCol, "bench_id", "sim", 1)
      .drop("rnk")
  }
}
