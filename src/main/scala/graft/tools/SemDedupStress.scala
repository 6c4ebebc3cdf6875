package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.SemDedup

/** SemDedup at-scale stress over the replica datasets
  * (tools/gen_scale.py): embeddings are replicated as EXACT copies
  * under fresh vec_ids, so every original vector becomes an
  * R-clique of cosine-1.0 semantic duplicates. Exact copies always
  * receive identical cell assignments (argmin over identical input),
  * so the within-cell operator must recover every clique regardless
  * of k-means quality — survivors == original vector count, an exact
  * invariant at any scale. At R=50 the pair graph (C(50,2)·originals)
  * exceeds the 100k driver cap and the star CC branch engages.
  *
  * Not part of the driver surface; run manually:
  *   sbt "runMain graft.tools.SemDedupStress /tmp/sf1"
  */
object SemDedupStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Session.local("semdedup-stress")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    emb.write.format("noop").mode("overwrite").save() // warm scan
    val n = emb.count()
    val distinctVecs = emb.select(col("embedding")).distinct().count()
    val k = math.max(4, math.sqrt(n.toDouble).toInt)
    println(s"[stress] vectors=$n distinct=$distinctVecs k=$k")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[stress] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val idx = time("Ivf.train (k-means quantizer)") {
      graft.functions.Ivf.train(emb, k, iters = 3)
    }
    val pairs = time("semanticPairs build+persist") {
      val p = SemDedup.semanticPairs(emb, idx, threshold = 0.99, probes = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
    val nPairs = pairs.count()
    println(s"[stress] pairs=$nPairs (driver cap 100000; distributed branch " +
      s"${if (nPairs > 100000) "ENGAGES" else "DOES NOT ENGAGE"})")
    val comps = time("connectedComponentsAdaptive") {
      val c = graft.operators.Dedup.connectedComponentsAdaptive(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }
    val nComponents = comps.select(col("component")).distinct().count()
    pairs.unpersist(); comps.unpersist()
    val survivors = time("semDedup end-to-end") {
      SemDedup.semDedup(emb, k, threshold = 0.99, probes = 2,
        indexKey = Some(s"semdedup-stress:$dir")).count()
    }
    println(s"[stress] components=$nComponents survivors=$survivors " +
      s"(invariant: survivors == distinct originals == $distinctVecs)")
    if (survivors != distinctVecs)
      throw new IllegalStateException(
        s"SemDedup invariant violated: $survivors survivors, expected $distinctVecs")
    println("[stress] OK")
    spark.stop()
  }
}
