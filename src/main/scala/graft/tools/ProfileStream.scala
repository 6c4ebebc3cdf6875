package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch cost breakdown for a streaming gate: attaches a
  * StreamingQueryListener and prints each progress event's durationMs
  * map (triggerExecution, queryPlanning, getBatch, addBatch,
  * walCommit, commitOffsets) plus state-operator commit times, then
  * runs the named gate through the usual noop sink.
  * Usage: runMain graft.tools.ProfileStream <sfDir> <gate> [n]
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileStream <sfDir> <gate> [n]")
    val dir = args(0); val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 2
    val spark = graft.Session.local("profile-stream")
    spark.sparkContext.setLogLevel("ERROR")
    // ad-hoc conf experiments: SPARK_GRAFT_PROFILE_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      println(s"[conf] $k=$v"); spark.conf.set(k, v)
    })
    spark.streams.addListener(new StreamingQueryListener {
      def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream ${e.name}] started")
      def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val st = Option(p.stateOperators).getOrElse(Array.empty)
          .map(s => s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}")
          .mkString(" | ")
        println(f"[batch ${p.batchId}%2d] rows=${p.numInputRows}%6d " +
          s"dur=$dur state{$st}")
      }
      def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream] terminated")
    })
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[$name run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
