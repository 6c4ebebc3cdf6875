package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler: IVF-PQ shortlist+rerank recall vs exact top-5 on
  * the embeddings fixture, to pin the x54b gate bound. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local("profile-pq")
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.sources.Tables.load(spark, d, "embeddings")
      val idx = graft.functions.Ivf.indexFor(s"ivf16:$d", emb, k = 16, iters = 3)
      for ((m, ksub) <- Seq((8, 64), (8, 256), (16, 64), (16, 256));
           shortlist <- Seq(25, 50)) {
      val books = graft.functions.Pq.codebooksFor(
        s"pq:$m:$ksub:$d", emb, m = m, ksub = ksub, iters = 3)
      val coded = graft.functions.Pq.encodeLists(emb, idx, books)
      val queries = emb.where(col("vec_id") < 10)
        val pq = graft.functions.Pq.searchRefined(
          queries, coded, emb, idx, books, k = 5, shortlist, nprobe = 8)
          .select(col("query_id"), col("neighbor_id"))
        val exact = graft.functions.Sim.knnBrute(queries, emb, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val ivfOnly = graft.functions.Ivf.search(queries, emb, idx, k = 5, nprobe = 8)
          .select(col("query_id"), col("neighbor_id"))
        val missedPq = exact.join(pq, Seq("query_id", "neighbor_id"), "left_anti").count()
        val missedIvf = exact.join(ivfOnly, Seq("query_id", "neighbor_id"), "left_anti").count()
        println(s"[$d] m=$m ksub=$ksub shortlist=$shortlist missedPq=$missedPq missedIvfOnly=$missedIvf of ${exact.count()}")
      }
    }
    spark.stop()
  }
}
