package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Splits}

/** Scratch profiler for the x25 pipeline stages. */
object ProfileX25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.local("profile-x25")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save()

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      spark.conf.set("spark.sql.shuffle.partitions", if (round == 2) "8" else "32")
      println(s"  shuffle.partitions=" + spark.conf.get("spark.sql.shuffle.partitions"))
      val curated = time("curated ckpt")(
        Curation.annotate(docs).where(col("keep")).select("doc_id", "text")
          .localCheckpoint())
      val pairs = time("lshHybridPairs")(
        Dedup.lshHybridPairs(curated, threshold = 0.5))
      val comps = time("connectedComponents")(Dedup.connectedComponents(pairs))
      val deduped = time("anti-join noop") {
        val losers = comps.where(col("id") =!= col("component"))
          .select(col("id").as("doc_id"))
        val d = curated.join(losers, Seq("doc_id"), "left_anti")
        d.write.format("noop").mode("overwrite").save()
        d
      }
      time("split+tokens+agg noop") {
        val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        Splits.hashSplit(deduped, "doc_id", splits, "v1")
          .select(col("split"), graft.functions.Text.tokenCount(col("text")).as("nt"))
          .withColumn("nc",
            when(col("nt") === 0, 0L).when(col("nt") <= 80, 1L)
              .otherwise(lit(1L) + ceil((col("nt") - 80).cast("double") / 60).cast("long")))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum("nc").cast("long").as("n_chunks"),
            sum("nt").cast("long").as("n_tokens"))
          .orderBy(asc_nulls_first("split"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
