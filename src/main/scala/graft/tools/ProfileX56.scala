package graft.tools

import org.apache.spark.sql.functions._

import graft.expressions.NativeSignatures
import graft.functions.Text

/** Scratch profiler for the x56 streaming near-dup path at scale:
  * times each stage of the equivalent BATCH formulation over the
  * same staged stream docs, to attribute the streaming gate's
  * wall-clock between signature math, the band join, exact verify,
  * and streaming machinery. */
object ProfileX56 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Session.local("profile-x56")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save()

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val stream = docs.where(col("doc_id") >= 300)
    val corpus = docs.where(col("doc_id") < 300)
    val (bands, rowsPerBand) = (16, 8)
    val nh = bands * rowsPerBand
    println(s"stream=${stream.count()} corpus=${corpus.count()}")

    locally {

      val corpusSig = time("corpus signatureTable")(
        graft.operators.Dedup.signatureTable(corpus, nh, 5, "doc_id", "text",
          Some(s"profile56:$dir")))
      val corpusBands = graft.operators.Dedup.bandedView(corpusSig, bands, rowsPerBand)
        .withColumnRenamed("id", "corpus_id")
      val streamSigs = time("stream minhash only")(
        stream.select(col("doc_id"),
          NativeSignatures.minhashText(col("text"), 5, nh).as("sig")))
      time("stream minhash noop")(
        streamSigs.write.format("noop").mode("overwrite").save())
      val streamBands = stream
        .where(length(col("text")) >= 5)
        .select(col("doc_id"), col("text").as("stream_text"),
          NativeSignatures.minhashText(col("text"), 5, nh).as("sig"))
        .select(col("doc_id"), col("stream_text"),
          posexplode(array((0 until bands).map(b =>
            xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val cand = streamBands.join(corpusBands, Seq("band", "bucket"))
        .select(col("doc_id"), col("stream_text"), col("corpus_id"))
      val nCand = time("band join count")(cand.count())
      println(s"  candidates=$nCand")
      val corpusText = corpus
        .select(col("doc_id").as("corpus_id"), col("text").as("corpus_text"))
      val sa = NativeSignatures.charShingles(col("stream_text"), 5)
      val sb = NativeSignatures.charShingles(col("corpus_text"), 5)
      val matches = cand.join(corpusText, Seq("corpus_id"))
        .select(col("doc_id"), col("corpus_id"),
          Text.jaccard(sa, sb).as("jaccard"))
        .where(col("jaccard") >= 0.5)
      val nm = time("exact verify count")(matches.count())
      println(s"  matches=$nm")
      // attribution experiment: same verify over a MATERIALIZED cand
      val candCk = time("cand localCheckpoint")(cand.localCheckpoint())
      val matches2 = candCk.join(corpusText, Seq("corpus_id"))
        .select(col("doc_id"), col("corpus_id"),
          Text.jaccard(sa, sb).as("jaccard"))
        .where(col("jaccard") >= 0.5)
      val nm2 = time("verify on ckpt cand")(matches2.count())
      println(s"  matches2=$nm2")
      println(matches2.queryExecution.executedPlan.toString.take(4000))
      // parallelism attribution: same verify, cand spread over cores
      val matches3 = candCk.repartition(32).join(corpusText, Seq("corpus_id"))
        .select(col("doc_id"), col("corpus_id"),
          Text.jaccard(sa, sb).as("jaccard"))
        .where(col("jaccard") >= 0.5)
      println(s"  matches3=" + time("verify repartitioned 32")(matches3.count()))
    }
    spark.stop()
  }
}
