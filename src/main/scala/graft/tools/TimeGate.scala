package graft.tools

/** Warm per-gate timing: `TimeGate <sfDir> <gate> [gate ...]` — one
  * warm-up table scan, then 3 noop-sink passes per named gate. */
object TimeGate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val gates = args.drop(1)
    require(gates.nonEmpty, "usage: TimeGate <sfDir> <gate> [gate ...]")
    val spark = graft.Session.local("time-gate")
    spark.sparkContext.setLogLevel("ERROR")
    gates.foreach { g =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(g)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"[$g] pass $i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
