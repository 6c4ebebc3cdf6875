package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the x36 sharded-packing gate (not part of the
  * driver surface; run manually while tuning). */
object ProfileX36 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.local("profile-x36")
    val docs0 = graft.sources.Tables.load(spark, dir, "documents")
    docs0.write.format("noop").mode("overwrite").save() // warm scan

    def time(label: String)(body: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        println(f"[profile] $label%-32s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def base = graft.operators.Splits
      .hashSplit(docs0, "doc_id", splits, "v1")
      .select(col("split"), col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).as("nt"))

    time("split+tokenCount only")(base)
    time("+ shardCol project") {
      base.withColumn("_s",
        graft.operators.Packing.shardCol(col("doc_id"), 16, "pack"))
    }
    time("unsharded contiguous") {
      graft.operators.Packing.contiguous(base, "split", "doc_id", "nt", 2048L)
    }
    time("sharded nShards=16") {
      graft.operators.Packing.contiguousSharded(
        base, "split", "doc_id", "nt", 2048L, nShards = 16, salt = "pack")
    }
    time("full x36 gate") {
      graft.SparkEntry.queries("x36_seq_packing")(spark, dir)
    }
    spark.stop()
  }
}
