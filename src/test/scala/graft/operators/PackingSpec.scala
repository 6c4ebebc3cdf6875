package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shard-parallel sequence packing: the sharded form must agree with
  * the single-window form shard-by-shard, conserve every document,
  * and keep seq_id ranges disjoint per shard. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val N = 16
  private def docs = (0L until 600L)
    .map(i => (i, if (i % 10 < 8) "train" else "test", 37L + i % 211))
    .toDF("doc_id", "split", "nt")

  test("nShards=1 degenerates to the single-window form exactly") {
    val a = Packing.contiguous(docs, "split", "doc_id", "nt", 512L)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    val b = Packing.contiguousSharded(docs, "split", "doc_id", "nt", 512L, 1)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("sharded packing = contiguous packing applied per shard, ids disjoint") {
    val packed = Packing.contiguousSharded(docs, "split", "doc_id", "nt",
      512L, N, salt = "pack")
    val rows = packed.select("doc_id", "split", "nt", "seq_id")
      .as[(Long, String, Long, Long)].collect()
    // conservation: every input doc appears exactly once
    assert(rows.map(_._1).sorted.toSeq == (0L until 600L))
    // seq_id mod N recovers the shard; replay each shard through the
    // single-window form and require identical local sequence numbers
    val sharded = docs.withColumn("shard",
      Packing.shardCol(col("doc_id"), N, "pack"))
      .as[(Long, String, Long, Int)].collect()
      .map { case (id, sp, nt, sh) => id -> sh }.toMap
    rows.groupBy(r => (r._2, (r._4 % N).toInt)).foreach { case ((sp, sh), grp) =>
      grp.foreach { case (id, _, _, _) => assert(sharded(id) == sh,
        s"doc $id landed in shard ${sharded(id)} but seq_id says $sh") }
      val subset = grp.sortBy(_._1)
      var off = 0L
      subset.foreach { case (id, _, nt, seqId) =>
        val localSeq = off / 512L
        assert(seqId == localSeq * N + sh,
          s"doc $id: expected seq ${localSeq * N + sh}, got $seqId")
        off += nt
      }
    }
  }

  test("shardCol Column and shardSql forms agree") {
    val df = (0L until 400L).toDF("id")
    df.createOrReplaceTempView("packing_shard_probe")
    val viaCol = df.select($"id", Packing.shardCol($"id", N, "pack").as("s"))
      .as[(Long, Int)].collect().toMap
    val viaSql = spark.sql(
      s"SELECT id, ${Packing.shardSql("id", N, "pack")
        .replace("AS VARCHAR", "AS STRING")} AS s FROM packing_shard_probe")
      .as[(Long, Int)].collect().toMap
    assert(viaCol == viaSql)
    // with 400 keys over 16 equal hex ranges, every shard is hit
    assert(viaCol.values.toSet.size == N)
  }

  test("colliding helper columns are rejected loudly") {
    val bad = docs.withColumn("_shard", lit(0))
    val e = intercept[IllegalArgumentException] {
      Packing.contiguousSharded(bad, "split", "doc_id", "nt", 512L, N)
    }
    assert(e.getMessage.contains("_shard"))
  }
}
