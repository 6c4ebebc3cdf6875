package graft.tools

/** Ad-hoc gate timer: runs a named gate N times in one session and
  * prints each wall time (first = cold, rest = warm). */
object TimeGate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeGate <sfDir> <gate> [n]")
    val dir = args(0); val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = graft.Session.local("time-gate")
    spark.sparkContext.setLogLevel("ERROR")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[$name run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
