package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.{Ivf, Sim}

/** Scratch: measure IVF recall@5 vs exact for the x14 gate shape at a
  * given sf dir, across nprobe settings (not part of the driver
  * surface). */
object ProfileX14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Session.local("profile-x14")
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    val exact = Sim.knnBrute(queries, emb, k = 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nExact = exact.count()
    for (nprobe <- Seq(2, 4, 6, 8, 16)) {
      val idx = Ivf.indexFor(s"profile16:$dir", emb, k = 16, iters = 3)
      val lists = java.nio.file.Files.createTempDirectory("x14prof").toString
      Ivf.writeLists(emb, idx, lists)
      val ivf = Ivf.searchIndexed(queries, lists, idx, k = 5, nprobe = nprobe)
        .select(col("query_id"), col("neighbor_id"))
      val missed = exact.join(ivf, Seq("query_id", "neighbor_id"), "left_anti").count()
      println(f"[x14] nprobe=$nprobe%2d  n_exact=$nExact  missed=$missed  recall=${1.0 - missed.toDouble / nExact}%.3f")
    }
    // x14b synthetic clustered corpus: actual miss count behind the
    // gate's ≤5 bound
    val synth = spark.range(96)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)), j =>
          (((col("id") / 8).cast("long") * 31 + j * 7) % 13 - 6).cast("double")
            + ((col("id") * 13 + j * 5) % 7 - 3).cast("double") / 1024.0)
          .as("embedding"))
    val sIdx = Ivf.indexFor("profile-synth12", synth, k = 12, iters = 3)
    val sLists = java.nio.file.Files.createTempDirectory("x14bprof").toString
    Ivf.writeLists(synth, sIdx, sLists)
    val sq = synth.where(col("vec_id") < 10)
    val sExact = Sim.knnBrute(sq, synth, k = 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val sIvf = Ivf.searchIndexed(sq, sLists, sIdx, k = 5, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"))
    val sMissed = sExact.join(sIvf, Seq("query_id", "neighbor_id"), "left_anti").count()
    println(s"[x14b] n_exact=${sExact.count()} missed=$sMissed")
    spark.stop()
  }
}
