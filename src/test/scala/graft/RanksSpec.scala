package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking: exact equality with the window
  * row_number across orderings, determinism across partitioning, and
  * the plan property the operator exists for — no single-partition
  * exchange. */
class RanksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(3)
    (1L to 500L).map(i => (i, rnd.nextInt(40).toDouble / 4.0))
      .toDF("id", "v")
  }

  test("equals window row_number under asc, desc, and tie-broken orders") {
    for (order <- Seq(
        Seq(col("id").asc),
        Seq(col("v").desc, col("id").asc), // v has heavy ties
        Seq(col("v").asc, col("id").desc))) {
      val want = df.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)))
        .select("id", "rn").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranks.globalRowNumber(df, order)
        .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 500)
      want.foreach { case (id, rn) => assert(got(id) == rn.toLong, s"id $id") }
    }
  }

  test("independent of input partitioning") {
    val order = Seq(col("v").desc, col("id").asc)
    val a = Ranks.globalRowNumber(df.repartition(17), order)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Ranks.globalRowNumber(df.coalesce(1), order)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("no single-partition exchange (the window form has one)") {
    val order = Seq(col("v").asc, col("id").asc)
    val windowPlan = df.withColumn("rn",
      row_number().over(Window.orderBy(order: _*)))
      .queryExecution.executedPlan.toString
    assert(windowPlan.contains("SinglePartition"),
      "baseline: the global window DOES collapse to one partition")
    val ours = Ranks.globalRowNumber(df, order)
    val ourPlan = ours.queryExecution.executedPlan.toString
    assert(!ourPlan.contains("SinglePartition"),
      "globalRowNumber must never collapse to one partition")
    // the lineage is checkpoint-truncated (that pin IS the fix for
    // cross-job boundary drift). AQE legitimately coalesces this tiny
    // fixture to one partition BY SIZE — what must never appear is the
    // planner's SinglePartition requirement (asserted above), which
    // forces one task regardless of data volume.
    assert(ours.count() == 500)
  }

  test("ntileExact equals the window ntile for every k incl. k > n") {
    val order = Seq(col("v").asc, col("id").asc)
    for (k <- Seq(1, 3, 7, 10, 499, 500, 501, 1000)) {
      val want = df.withColumn("bin",
        ntile(k).over(Window.orderBy(order: _*)))
        .select("id", "bin").collect()
        .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      val got = Ranks.ntileExact(df, k, order)
        .select("id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"k=$k")
    }
  }

  test("ntileExact: SQL bucket sizes (first n mod k buckets one larger), partitioning-invariant") {
    val order = Seq(col("v").asc, col("id").asc)
    val sizes = Ranks.ntileExact(df.repartition(13), 7, order)
      .groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 500 = 7*71 + 3 → buckets 1-3 have 72 rows, 4-7 have 71
    assert(sizes == Map(1L -> 72L, 2L -> 72L, 3L -> 72L,
      4L -> 71L, 5L -> 71L, 6L -> 71L, 7L -> 71L))
    // counting-selection shape: what must never appear is an
    // UNPARTITIONED window (the ntile-over-everything single-task
    // sort). The only windows allowed are the boundary-extraction
    // ones, partitioned by (group, bucket) — each task holds
    // ≈ n/nBuckets rows of one boundary bucket.
    val plan = Ranks.ntileExact(df, 7, order)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(_.contains("__ntb_")),
      s"ntileExact planned a window outside the bucket-pruned " +
        s"boundary extraction:\n$plan")
    // and the bin assignment itself is map-only over a broadcast of
    // the k-1 boundary tuples — the data never shuffles or sorts
    assert(plan.contains("BroadcastHashJoin"),
      s"boundary table must broadcast:\n$plan")
  }

  test("ntileExactBy equals the partitioned window ntile, NULL group included") {
    val gdf = df.withColumn("g",
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("g"), col("id") % 3)))
    val order = Seq(col("v").asc, col("id").asc)
    for (k <- Seq(1, 4, 9, 200)) {
      val want = gdf.withColumn("bin", ntile(k).over(
        Window.partitionBy(col("g")).orderBy(order: _*)))
        .select("id", "bin").collect()
        .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      val got = Ranks.ntileExactBy(gdf, k, "g", order)
        .select("id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"k=$k")
    }
    val plan = Ranks.ntileExactBy(gdf, 4, "g", order)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(_.contains("__ntb_")),
      s"ntileExactBy planned a window outside the bucket-pruned " +
        s"boundary extraction:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"boundary table must broadcast:\n$plan")
  }

  test("ntile under a fully-tied order still emits exactly SQL-sized bins") {
    // 100 identical tuples, k=4: tie PLACEMENT is arbitrary (the
    // window ntile's own contract) but bin SIZES must be exactly
    // 25/25/25/25 — the two-level rank path numbers ties
    // consistently inside their bucket, so sizes cannot drift
    val flat = spark.range(100).select(lit(1.0).as("v"))
    val sizes = Ranks.ntileExact(flat, 4, Seq(col("v")))
      .groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 25L, 2L -> 25L, 3L -> 25L, 4L -> 25L),
      sizes.toString)
  }

  test("ntileExact falls back to the rank path for descending orders (values still exact)") {
    val order = Seq(col("v").desc, col("id").desc)
    val want = df.withColumn("bin",
      ntile(5).over(Window.orderBy(order: _*)))
      .select("id", "bin").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = Ranks.ntileExact(df, 5, order)
      .select("id", "bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
