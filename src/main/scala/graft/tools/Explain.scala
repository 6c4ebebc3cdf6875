package graft.tools

import graft.{Session, SparkEntry}

/** Dump the formatted physical plan for one or all SparkEntry queries.
  * Usage: runMain graft.tools.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption match {
      case Some(n) if SparkEntry.queries.contains(n) => Seq(n)
      case _ => SparkEntry.queries.keys.toSeq.sorted
    }
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Session.local("explain")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
