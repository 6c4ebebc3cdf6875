package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.Dedup

/** Scratch profiler for the x20 dedup pipeline stages (not part of the
  * driver surface; run manually while tuning). */
object ProfileX20 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.local("profile-x20")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm scan

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val numHashes = 128
      val sig = docs.where(length(col("text")) >= 5)
        .select(col("doc_id").as("id"),
          Dedup.minhashSignature(Text.charShingles(col("text"), 5), numHashes).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("sig persist+count")(sig.count())
      val cand = time("bandCandidates noop") {
        val c = Dedup.lshCandidates(docs)
        c.write.format("noop").mode("overwrite").save()
        c
      }
      val agree = zip_with(col("sig_a"), col("sig_b"),
        (a, b) => when(a === b, 1).otherwise(0))
      val scoredLazy = cand
        .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (aggregate(agree, lit(0), (acc, x) => acc + x).cast("double") / numHashes)
            .as("est"))
      time("scored noop (no ckpt)")(
        scoredLazy.write.format("noop").mode("overwrite").save())
      val scored = time("scored localCheckpoint")(scoredLazy.localCheckpoint())
      time("near isEmpty probe")(
        scored.where(col("est") >= 0.3 && col("est") < 0.7).isEmpty)
      sig.unpersist()
      time("full lshHybridPairs")(
        Dedup.lshHybridPairs(docs, threshold = 0.5).count())
    }
    spark.stop()
  }
}
