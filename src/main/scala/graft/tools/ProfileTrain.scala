package graft.tools

import org.apache.spark.sql.functions._

import graft.expressions.NativeVector

/** Scratch profiler: where does Ivf.train's wall-clock go at k~sqrt(N)?
  * Mirrors the train body with per-stage timers. */
object ProfileTrain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val k = args.lift(1).map(_.toInt).getOrElse(141)
    val spark = graft.Session.local("profile-train")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val vecs = emb.select(col("embedding").as("v")).where(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = time("count+persist")(vecs.count())
    val seedFrac = math.min(1.0, (50.0 * k) / n)
    val seeds = time("takeSeeds") {
      (if (seedFrac < 1.0) vecs.sample(withReplacement = false, seedFrac, 7) else vecs)
        .distinct()
        .orderBy(xxhash64(hash(col("v"))))
        .limit(k)
        .collect()
        .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
    }
    var cents = seeds
    (1 to 3).foreach { it =>
      // the shipped shape: assignment materialized before the explode
      val assigned = time(s"lloyd iter $it assign ckpt") {
        vecs
          .select(NativeVector.nearestCentroid(col("v"), cents).as("cid"),
            col("v"))
          .localCheckpoint()
      }
      val upd = time(s"lloyd iter $it agg") {
        assigned
          .select(col("cid"), posexplode(col("v")))
          .groupBy("cid", "pos").agg(avg(col("col").cast("double")).as("m"))
          .collect()
      }
      val byCid = upd.groupBy(_.getInt(0)).map { case (cid, rows) =>
        val arr = new Array[Double](rows.length)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        cid -> arr
      }
      cents = Array.tabulate(cents.length)(i => byCid.getOrElse(i, cents(i)))
    }
    vecs.unpersist()
    time("Ivf.train end-to-end (shipped)") {
      graft.functions.Ivf.train(emb, k, iters = 3)
    }
    spark.stop()
  }
}
