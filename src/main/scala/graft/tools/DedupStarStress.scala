package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Beyond-driver-cap dedup stress (round-9 verdict #2): measure the
  * distributed star connected-components path on a pair graph LARGER
  * than the 100k driver cap, end-to-end through the production entry
  * points, and cross-check its labels against the driver union-find
  * on the same pairs.
  *
  * The sf1 replica dataset (tools/gen_scale.py: sf0.1 documents
  * replicated 10× as exact duplicates under fresh doc_ids) is exactly
  * the shape that breaks the cap: every original document becomes a
  * 10-clique in the near-dup graph (C(10,2)=45 pairs each, plus the
  * original sf0.1 near-dup pairs replicated across replicas), so the
  * verified pair count lands well past 100k and
  * `connectedComponentsAdaptive` must take the star branch.
  *
  * Not part of the driver surface; run manually:
  *   sbt "runMain graft.tools.DedupStarStress /tmp/sf1"
  */
object DedupStarStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Session.local("dedup-star-stress")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm scan
    val nDocs = docs.count()

    def time[T](label: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $label%-44s $sec%8.2f s")
      (r, sec)
    }

    // 1. the verified near-dup pair graph (the thing the cap gates on)
    val (pairs, _) = time("lshHybridPairs build+persist") {
      val p = Dedup.lshHybridPairs(docs, 0.8, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
    val nPairs = pairs.count()
    println(s"[stress] docs=$nDocs pairs=$nPairs (driver cap 100000; " +
      s"distributed branch ${if (nPairs > 100000) "ENGAGES" else "DOES NOT ENGAGE"})")

    // 2. distributed star on the full graph (what production runs
    //    past the cap) vs the driver union-find on the same pairs
    //    (correct by construction at moderate size) — labels must
    //    agree. Past ~2M pairs the driver collect becomes the thing
    //    this tool exists to avoid, so the cross-check switches to
    //    the replica-construction invariant: gen_scale replicas only
    //    merge copies of the same original document, so the COMPONENT
    //    COUNT is replica-count-invariant (4,756 for the sf0.1
    //    document corpus at threshold 0.8, any R).
    val (starLabels, starSec) = time("connectedComponentsStar (distributed)") {
      val l = Dedup.connectedComponentsStar(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l.count()
      l
    }
    val nStar = starLabels.count()
    val nComponents = starLabels.select("component").distinct().count()
    var driverSec = -1.0
    if (nPairs <= 2000000) {
      val (driverLabels, sec) = time("driver union-find (reference)") {
        // far above the pair count but NOT Int.MaxValue (the adaptive
        // probe takes driverCap+1 rows, which must not overflow)
        val l = Dedup.connectedComponentsAdaptive(pairs, driverCap = 10000000)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        l.count()
        l
      }
      driverSec = sec
      val mismatches = starLabels.as("a")
        .join(driverLabels.as("b"), Seq("id"))
        .where(col("a.component") =!= col("b.component")).count()
      println(s"[stress] labels=$nStar components=$nComponents " +
        s"label mismatches vs driver union-find=$mismatches")
      require(mismatches == 0, "star CC disagrees with driver union-find")
    } else {
      println(s"[stress] labels=$nStar components=$nComponents " +
        "(driver cross-check skipped past 2M pairs; replica invariant applies)")
    }

    // 3. the production entry points end-to-end with the DEFAULT cap
    //    (so the adaptive fall-through takes the star branch itself)
    val (survivors, nearDupSec) = time("dedupNearDups end-to-end (default cap)") {
      Dedup.dedupNearDups(docs, 0.8).count()
    }
    println(s"[stress] dedupNearDups survivors=$survivors")

    val batchLo = nDocs / 10 * 9 // last replica's id range = the batch
    val (admitted, incSec) = time("dedupIncremental end-to-end (default cap)") {
      Dedup.dedupIncremental(
        docs.where(col("doc_id") >= batchLo),
        docs.where(col("doc_id") < batchLo), 0.8).count()
    }
    println(s"[stress] dedupIncremental admitted=$admitted of ${nDocs - batchLo}")

    println(f"[stress] SUMMARY pairs=$nPairs components=$nComponents " +
      f"star=$starSec%.2f s driverUF=$driverSec%.2f s " +
      f"dedupNearDups=$nearDupSec%.2f s dedupIncremental=$incSec%.2f s")
    spark.stop()
  }
}
