package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Adversarial-shape stress for distributed connected components: a
  * PATH graph (0-1-2-…-n), the worst case for iterative CC. The
  * replica-clique stress (DedupStarStress) collapses in one round —
  * every node sees the component minimum directly; a path of length n
  * instead forces the Kiveris large-star/small-star alternation to
  * halve the diameter each round, i.e. the full O(log n) round
  * structure with nothing shortcutting it. Measures rounds implied by
  * wall-clock and pins exact labels (component = 0 for the single
  * chain; per-segment minima for the segmented variant).
  *
  * Not part of the driver surface; run manually:
  *   sbt "runMain graft.tools.ChainCcStress 1000000"
  */
object ChainCcStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val segments = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = graft.Session.local("chain-cc-stress")
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[chain] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 1. single path 0-1-…-(n-1): diameter n-1, one component
    val path = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val labels = time(s"star CC on path n=$n") {
      val l = Dedup.connectedComponentsStar(path)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l.count()
      l
    }
    val nLabels = labels.count()
    val bad = labels.where(col("component") =!= 0L).count()
    println(s"[chain] path: labels=$nLabels (want $n) wrong-component=$bad")
    require(nLabels == n && bad == 0L, "path labels wrong")
    labels.unpersist()

    // 2. segmented: `segments` disjoint chains (diameter n/segments) —
    //    component must be each segment's minimum id
    val segLen = n / segments
    val seg = spark.range(n - 1)
      .where((col("id") + 1) % segLen =!= 0)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val segLabels = time(s"star CC on $segments chains of $segLen") {
      val l = Dedup.connectedComponentsStar(seg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l.count()
      l
    }
    val segBad = segLabels
      .where(col("component") =!= (col("id") - (col("id") % segLen))).count()
    val nComp = segLabels.select("component").distinct().count()
    println(s"[chain] segmented: components=$nComp (want ~$segments) " +
      s"wrong-component=$segBad")
    require(segBad == 0L, "segment labels wrong")
    spark.stop()
  }
}
