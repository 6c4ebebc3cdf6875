package graft.tools
object TimeX46 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Session.local("time-x46")
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.load(spark, dir, "documents")
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("x46_bm25_topk")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[x46] pass $i ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
