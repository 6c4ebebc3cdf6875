package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.NativeSignatures
import graft.operators.Dedup

/** STREAMING near-duplicate detection against a static corpus — the
  * ingest-time version of [[Dedup.dedupIncremental]]'s batch×corpus
  * stage: documents arriving on a stream are checked for near-dups
  * in an existing corpus (contamination/boilerplate admission
  * control) without any stream-side state store.
  *
  * Shape: the stream side computes its fused MinHash signature in a
  * map-only native pass, explodes to LSH band keys, and equi-joins
  * the STATIC corpus band table on (band, bucket) — a stream-static
  * inner join, which Structured Streaming executes statelessly per
  * micro-batch (the static side is just re-read/broadcast; nothing
  * accumulates). Candidates then join the static corpus text (second
  * stream-static join) and verify with EXACT char-shingle Jaccard —
  * deterministic scores, so the whole pipeline is oracle-checkable
  * against an all-pairs exact-Jaccard reference. No stream state, no
  * watermark needed: each arriving document is decided entirely
  * within its own micro-batch.
  *
  * At 100 TB-corpus scale the corpus signature/band tables are the
  * staged artifacts [[Dedup.signatureTable]] already maintains (the
  * same cache key as the batch incremental path — one artifact,
  * both execution modes), and the per-batch work is proportional to
  * the batch's candidates, never the corpus.
  *
  * A pair that shares several bands is emitted once per shared band
  * (collapsing duplicates across micro-batch boundaries would demand
  * a state store); callers dedup the pair stream batch-side after
  * the sink, which the x56 gate does.
  */
object StreamNearDup {

  /** (doc_id, corpus_id, jaccard) candidate matches of a STREAMING
    * docs frame against the static corpus, exact-verified at
    * `threshold`. */
  def vsCorpus(streamDocs: DataFrame, corpusDocs: DataFrame,
               threshold: Double, shingleSize: Int = 5,
               bands: Int = 16, rowsPerBand: Int = 8,
               idCol: String = "doc_id", textCol: String = "text",
               corpusCacheKey: Option[String] = None): DataFrame = {
    require(streamDocs.isStreaming, "streamDocs must be a streaming DataFrame")
    val nh = bands * rowsPerBand
    // the static side of a stream-static join is re-evaluated per
    // micro-batch — an unpersisted signature table would re-shingle
    // and re-MinHash the whole corpus on every batch. The cached path
    // persists inside signatureTable; the uncached path persists here
    // (lifetime = the streaming query's; long-lived streams should
    // pass a cache key so the artifact is shared and releasable).
    val corpusSig = corpusCacheKey match {
      case Some(_) => Dedup.signatureTable(corpusDocs, nh, shingleSize,
        idCol, textCol, corpusCacheKey)
      case None =>
        val sig = Dedup.signatureTable(corpusDocs, nh, shingleSize,
          idCol, textCol, None)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sig.count() // materialize once, before the first batch
        sig
    }
    val corpusBands = Dedup.bandedView(corpusSig, bands, rowsPerBand)
      .withColumnRenamed("id", "corpus_id")
    val corpusText = corpusDocs
      .select(col(idCol).as("corpus_id"), col(textCol).as("corpus_text"))
    // stream side of the band view: same slicing/hashing arithmetic
    // as Dedup.bandedView, carrying the text through for the verify
    // stage (the corpus view is ids-only; the stream row needs its
    // text exactly once more downstream)
    val streamBands = streamDocs
      .where(length(col(textCol)) >= shingleSize)
      .select(col(idCol).as("doc_id"), col(textCol).as("stream_text"),
        NativeSignatures.minhashText(col(textCol), shingleSize, nh).as("sig"))
      .select(col("doc_id"), col("stream_text"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = streamBands
      .join(corpusBands, Seq("band", "bucket"))
      .select(col("doc_id"), col("stream_text"), col("corpus_id"))
    // FUSED exact-Jaccard verify: the threshold filter gets pushed
    // into the corpus-text join condition, where expression trees
    // evaluate WITHOUT whole-stage-codegen subexpression elimination
    // — the composed jaccard(charShingles(a), charShingles(b)) form
    // re-shingled both texts for each of its ~7 sub-references there
    // (154 s → 5 s on the sf1 x56 verify). jaccard_text_native
    // appears ONCE per reference and shingles internally.
    cand.join(corpusText, Seq("corpus_id"))
      .select(col("doc_id"), col("corpus_id"),
        round(NativeSignatures.jaccardText(
          col("stream_text"), col("corpus_text"), shingleSize), 4)
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
