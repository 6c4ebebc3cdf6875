package graft.pipeline

import graft.Session

/** CLI entry for the medallion pipeline: TSV in, warehouse dir out.
  * Usage: runMain graft.pipeline.FjcMain <raw.tsv[.gz]> <warehouseDir>
  */
object FjcMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: FjcMain <raw.tsv[.gz]> <warehouseDir>")
      sys.exit(2)
    }
    val Array(rawPath, warehouseDir) = args
    val spark = Session.local("fjc-pipeline")
    FjcPipeline.runAll(spark, rawPath, warehouseDir)
    val trusted = spark.read.parquet(s"$warehouseDir/trusted")
    println(s"[fjc] trusted rows=${trusted.count()} cols=${trusted.columns.length}")
    FjcPipeline.dims.foreach { case (name, _) =>
      val n = spark.read.parquet(s"$warehouseDir/dims/$name").count()
      println(s"[fjc] $name rows=$n")
    }
    spark.stop()
  }
}
