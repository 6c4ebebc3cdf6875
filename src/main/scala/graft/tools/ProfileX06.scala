package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.{Sim, Text}
import graft.operators.Dedup

/** Scratch profiler for the x06 SRP near-dup and x04 SimHash bench
  * regressions (round-3 VERDICT item 2): stage-by-stage timing of the
  * exact gate-query shapes (not part of the driver surface). */
object ProfileX06 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.local("profile-x06")
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    emb.write.format("noop").mode("overwrite").save()
    docs.write.format("noop").mode("overwrite").save()

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def med(label: String, reps: Int)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[median] $label%-36s ${ts(reps / 2)}%.3f s  (min ${ts.head}%.3f max ${ts.last}%.3f)")
    }
    if (args.contains("--median")) {
      def noop2(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def x06Lazy(): Unit = {
        val vecs = emb.select(col("vec_id").as("id"),
          Sim.asDouble(col("embedding")).as("v"))
        val c = Sim.srpCandidates(emb)
        noop2(c
          .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
          .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            round(graft.expressions.NativeVector.cosineSim(col("v_a"), col("v_b")), 4)
              .as("sim"))
          .where(col("sim") >= 0.4).orderBy("id_a", "id_b"))
      }
      def x06Gate(): Unit =
        noop2(Sim.nearDupPairs(emb, threshold = 0.4)
          .orderBy("id_a", "id_b"))
      def x04Gate(): Unit =
        noop2(Dedup.simhashPairs(docs, maxHamming = 3).orderBy("id_a", "id_b"))
      def x04NoFan(): Unit = {
        val bits = 16; val mask = (1L << bits) - 1
        val sg = docs.select(col("doc_id").as("id"), Text.simhash64(col("text")).as("sig"))
        val banded = sg.select(col("id"), col("sig"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("sig"), c * bits).bitwiseAND(mask)): _*)))
          .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "piece")
        val l = banded.select(col("chunk"), col("piece"), col("id").as("id_a"), col("sig").as("sig_a"))
        val r = banded.select(col("chunk"), col("piece"), col("id").as("id_b"), col("sig").as("sig_b"))
        noop2(l.join(r, Seq("chunk", "piece"))
          .where(col("id_a") < col("id_b"))
          .dropDuplicates("id_a", "id_b")
          .select(col("id_a"), col("id_b"),
            Text.hamming64(col("sig_a"), col("sig_b")).as("hamming"))
          .where(col("hamming") <= 3).orderBy("id_a", "id_b"))
      }
      x06Gate(); x06Lazy(); x04Gate(); x04NoFan() // warm all paths
      // NOTE: nearDupPairs was reverted to the fully lazy shape after
      // the staged-variant measurements recorded in BASELINE.md, so
      // these two now measure the SAME plan — kept as an A/A sanity
      // check of the measurement noise floor.
      med("x06 gate (now lazy)", 7)(x06Gate())
      med("x06 hand-built lazy (A/A)", 7)(x06Lazy())
      med("x04 gate (fanOut)", 7)(x04Gate())
      med("x04 no-fanOut", 7)(x04NoFan())
      spark.stop(); return
    }

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      // x06 as the gate runs it (session cache warm on round 2)
      time("x06 nearDupPairs (gate, lazy)")(
        noop(Sim.nearDupPairs(emb, threshold = 0.4).orderBy("id_a", "id_b")))
      // stage pieces
      val vecs = emb.select(col("vec_id").as("id"),
        Sim.asDouble(col("embedding")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  stage vecs persist+count")(vecs.count())
      val cand = time("  srpCandidates build+noop") {
        val c = Sim.srpCandidates(emb)
        noop(c); c
      }
      time("  verify joins lazy noop") {
        noop(cand
          .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
          .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            round(graft.expressions.NativeVector.cosineSim(col("v_a"), col("v_b")), 4)
              .as("sim"))
          .where(col("sim") >= 0.4))
      }
      vecs.unpersist()

      // x06 fully lazy (round-2 shape): no staging, no checkpoint
      time("x06 lazy variant") {
        val vecs = emb.select(col("vec_id").as("id"),
          Sim.asDouble(col("embedding")).as("v"))
        val c = Sim.srpCandidates(emb)
        noop(c
          .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
          .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            round(graft.expressions.NativeVector.cosineSim(col("v_a"), col("v_b")), 4)
              .as("sim"))
          .where(col("sim") >= 0.4).orderBy("id_a", "id_b"))
      }

      // x04 as the gate runs it
      time("x04 simhashPairs (gate)")(
        noop(Dedup.simhashPairs(docs, maxHamming = 3).orderBy("id_a", "id_b")))
      val sig = docs.select(col("doc_id").as("id"),
        Text.simhash64(col("text")).as("sig"))
      time("  simhash sig only noop")(noop(sig))
      // x04 without the fanOut repartition (round-2 shape)
      time("x04 no-fanOut variant") {
        val bits = 16; val mask = (1L << bits) - 1
        val sg = docs.select(col("doc_id").as("id"), Text.simhash64(col("text")).as("sig"))
        val banded = sg.select(col("id"), col("sig"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("sig"), c * bits).bitwiseAND(mask)): _*)))
          .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "piece")
        val l = banded.select(col("chunk"), col("piece"), col("id").as("id_a"), col("sig").as("sig_a"))
        val r = banded.select(col("chunk"), col("piece"), col("id").as("id_b"), col("sig").as("sig_b"))
        noop(l.join(r, Seq("chunk", "piece"))
          .where(col("id_a") < col("id_b"))
          .dropDuplicates("id_a", "id_b")
          .select(col("id_a"), col("id_b"),
            Text.hamming64(col("sig_a"), col("sig_b")).as("hamming"))
          .where(col("hamming") <= 3).orderBy("id_a", "id_b"))
      }
    }
    spark.stop()
  }
}
