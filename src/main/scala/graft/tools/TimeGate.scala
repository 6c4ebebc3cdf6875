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
    // match Bench's input-sized shuffle partitioning so warm timings
    // here predict bench deltas (Session.local defaults to cores)
    def walkBytes(f: java.io.File): Long =
      if (f.isDirectory) { val c = f.listFiles(); if (c == null) 0L else c.map(walkBytes).sum }
      else f.length()
    val parts = math.min(math.max(walkBytes(new java.io.File(dir)) / (4L << 20), 8L),
      4L * graft.Session.cpus).toString
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    println(s"[time-gate] shuffle.partitions=$parts")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[$name run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
