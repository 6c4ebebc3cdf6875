package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Catalog

/** Fault injection for the merge/compact rewrite+swap: the swap is
  * tmp-write → `dir`→aside → tmp→`dir` → drop aside, and the claim
  * under test is that a FAILED rename at either swap step leaves the
  * table readable and wholly-old (rollback), never mixed, never
  * deleted — and leaks no tmp/aside siblings. Injection happens in a
  * real Hadoop FileSystem ([[FaultInjectingFileSystem]], `faulty://`
  * scheme), so Spark's parquet IO and committer run unmodified. */
class CatalogSwapFaultSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def faultyDir(prefix: String): String = {
    FaultInjectingFileSystem.register(spark)
    val real = Files.createTempDirectory(prefix).toString
    s"faulty://$real/t"
  }

  private def rows(dir: String): Seq[(Long, Double)] =
    spark.read.parquet(dir).as[(Long, Double)].collect().toSeq.sorted

  /** Siblings of `dir` left behind by a failed swap (tmp or aside). */
  private def strays(dir: String): Seq[String] = {
    val real = new java.io.File(new java.net.URI(dir).getPath)
    Option(real.getParentFile.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_ != real.getName).toSeq
  }

  private val original = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))

  test("merge: failed move-aside rolls back to wholly-old, no strays") {
    val dir = faultyDir("swap_m1")
    original.toDF("k", "v").write.parquet(dir)
    try {
      FaultInjectingFileSystem.failRenameWhen =
        (_, dst) => dst.getName.contains("_premerge_")
      val ex = intercept[java.io.IOException] {
        Catalog.merge(spark, dir, Seq((2L, 99.0)).toDF("k", "v"), Seq("k"))
      }
      assert(ex.getMessage.contains("could not move"))
    } finally FaultInjectingFileSystem.reset()
    assert(rows(dir) == original.sorted, "table must read back wholly-old")
    assert(strays(dir).isEmpty, s"leaked swap dirs: ${strays(dir)}")
    // and with the fault cleared the same merge lands wholly-new
    val stats = Catalog.merge(spark, dir, Seq((2L, 99.0)).toDF("k", "v"), Seq("k"))
    assert(stats.rowsBefore == 3 && stats.rowsAfter == 3)
    assert(rows(dir) == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("merge: failed swap-in rolls back to wholly-old, no strays") {
    val dir = faultyDir("swap_m2")
    original.toDF("k", "v").write.parquet(dir)
    val dirP = new Path(dir)
    try {
      FaultInjectingFileSystem.failRenameWhen =
        (src, dst) => src.getName.contains("_merge_") && dst.getName == dirP.getName
      val ex = intercept[java.io.IOException] {
        Catalog.merge(spark, dir, Seq((4L, 40.0)).toDF("k", "v"), Seq("k"))
      }
      assert(ex.getMessage.contains("could not swap"))
    } finally FaultInjectingFileSystem.reset()
    // the rollback path itself renames aside→dir — it must have run
    assert(rows(dir) == original.sorted, "table must read back wholly-old")
    assert(strays(dir).isEmpty, s"leaked swap dirs: ${strays(dir)}")
    val stats = Catalog.merge(spark, dir, Seq((4L, 40.0)).toDF("k", "v"), Seq("k"))
    assert(stats.rowsBefore == 3 && stats.rowsAfter == 4)
    assert(rows(dir) == (original :+ (4L, 40.0)).sorted)
  }

  test("compact: failed move-aside rolls back to wholly-old, no strays") {
    val dir = faultyDir("swap_c1")
    original.toDF("k", "v").repartition(3).write.parquet(dir)
    try {
      FaultInjectingFileSystem.failRenameWhen =
        (_, dst) => dst.getName.contains("_precompact_")
      val ex = intercept[java.io.IOException] {
        Catalog.compact(spark, dir)
      }
      assert(ex.getMessage.contains("could not move"))
    } finally FaultInjectingFileSystem.reset()
    assert(rows(dir) == original.sorted, "table must read back wholly-old")
    assert(strays(dir).isEmpty, s"leaked swap dirs: ${strays(dir)}")
    val stats = Catalog.compact(spark, dir)
    assert(stats.filesBefore == 3 && stats.filesAfter == 1)
    assert(rows(dir) == original.sorted)
  }

  test("compact: failed swap-in rolls back to wholly-old, no strays") {
    val dir = faultyDir("swap_c2")
    original.toDF("k", "v").repartition(3).write.parquet(dir)
    val dirP = new Path(dir)
    try {
      FaultInjectingFileSystem.failRenameWhen =
        (src, dst) => src.getName.contains("_compact_") && dst.getName == dirP.getName
      val ex = intercept[java.io.IOException] {
        Catalog.compact(spark, dir)
      }
      assert(ex.getMessage.contains("could not swap"))
    } finally FaultInjectingFileSystem.reset()
    assert(rows(dir) == original.sorted, "table must read back wholly-old")
    assert(strays(dir).isEmpty, s"leaked swap dirs: ${strays(dir)}")
    val stats = Catalog.compact(spark, dir)
    assert(stats.filesBefore == 3 && stats.filesAfter == 1)
  }

  test("sanity: merge and compact succeed through faulty:// with no fault set") {
    val dir = faultyDir("swap_ok")
    original.toDF("k", "v").repartition(2).write.parquet(dir)
    val ms = Catalog.merge(spark, dir,
      Seq((1L, 11.0), (5L, 50.0)).toDF("k", "v"), Seq("k"))
    assert(ms.rowsBefore == 3 && ms.rowsAfter == 4)
    val cs = Catalog.compact(spark, dir)
    assert(cs.filesAfter == 1L)
    assert(rows(dir) == Seq((1L, 11.0), (2L, 20.0), (3L, 30.0), (5L, 50.0)))
  }
}
