package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: session-window stream cost vs state-store partition count
  * at a given SF (sizing evidence for GateSupport.streamPartitionsFor). */
object TimeX18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Session.local("time-x18")
    spark.sparkContext.setLogLevel("ERROR")
    val staged = java.nio.file.Files.createTempDirectory("x18_events").toString
    graft.sources.Tables.load(spark, dir, "events")
      .write.mode("overwrite").parquet(staged)
    Seq(4, 8, 16, 32).foreach { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      (1 to 2).foreach { pass =>
        val ckpt = java.nio.file.Files.createTempDirectory("x18_ckpt").toString
        val t0 = System.nanoTime()
        val agg = spark.readStream.schema(graft.streaming.EventStreams.schema)
          .parquet(staged)
          .withWatermark("ts", "10 minutes")
          .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("v"))
        val q = agg.writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination(180000)
        println(f"[x18] partitions=$n pass=$pass ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
