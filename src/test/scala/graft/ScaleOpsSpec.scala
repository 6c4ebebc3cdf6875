package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Catalog
import graft.operators.SkewJoin
import graft.sources.Tables
import graft.streaming.EventStreams

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("saltedSumAgg equals plain aggregation (salt-invariance)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val salted = SkewJoin.saltedSumAgg(li, "l_returnflag", salts = 8,
      sumCols = Seq("l_quantity"))
      .select($"l_returnflag", $"cnt", round($"sum_l_quantity", 2).as("s"))
      .as[(String, Long, Double)].collect().toMap2
    val plain = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 2).as("s"))
      .as[(String, Long, Double)].collect().toMap2
    assert(salted == plain)
  }

  implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("saltedJoin equals plain join") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val salted = SkewJoin.saltedJoin(li, o, "l_orderkey", salts = 4)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedJoin bounds the straggler partition on a 90%-one-key dataset") {
    // 50k rows, 90% on key 0 — the classic hot-key join straggler
    val n = 50000
    val big = spark.range(n)
      .select(when($"id" % 10 < 9, 0L).otherwise($"id").as("k"), $"id".as("payload"))
    val dim = Seq((0L, "hot"), (1L, "cold")).toDF("k", "tag")
    val salts = 8
    val parts = 32

    // partition row counts under the exact shuffle keys each join uses:
    // unsalted → hash(k); salted → hash(k, _salt) with the operator's
    // salt expression (rand seed 42, matching SkewJoin.saltedJoin)
    def maxPartitionRows(df: org.apache.spark.sql.DataFrame, keys: Seq[String]): Long =
      df.repartition(parts, keys.map(col): _*)
        .mapPartitions(it => Iterator.single(it.length.toLong))(
          org.apache.spark.sql.Encoders.scalaLong)
        .collect().max

    val unsaltedMax = maxPartitionRows(big, Seq("k"))
    val saltedMax = maxPartitionRows(
      big.withColumn("_salt", (rand(seed = 42) * salts).cast("int")),
      Seq("k", "_salt"))
    // hot key = 45k rows: unsalted, one task owns them all. Salted,
    // each of the 8 (key,salt) cells holds ≈5.6k rows; hashing 8 cells
    // into 32 partitions can co-locate two of them, so the worst task
    // is bounded by ~2 cells (+20% slack) — still ≥4× better than the
    // unsalted straggler.
    assert(unsaltedMax >= (n * 0.9).toLong, s"expected hot partition, got $unsaltedMax")
    assert(saltedMax <= (n * 0.9 / salts * 2 * 1.2).toLong,
      s"salting left a straggler: max partition $saltedMax rows")
    assert(saltedMax <= unsaltedMax / 3)

    // and the operator itself still returns exact join results
    val joined = SkewJoin.saltedJoin(big, dim, "k", salts)
    assert(joined.where($"tag" === "hot").count() == (n * 9 / 10).toLong)
  }

  test("hashSplit: stable, deterministic, approximately weighted, salt-sensitive") {
    import graft.operators.Splits
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val ids = spark.range(20000).toDF("id")
    val assigned = Splits.hashSplit(ids, "id", splits, "v1")
    val counts = assigned.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    // fractions within ±2% absolute of the weights at n=20k
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, counts)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02, counts)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.02, counts)
    // stability: a row's split is unchanged when the corpus shrinks
    val subset = Splits.hashSplit(ids.where($"id" % 7 === 0), "id", splits, "v1")
      .as[(Long, String)].collect().toMap
    val full = assigned.as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) == s) }
    // different salt → different (but still deterministic) assignment
    val resalted = Splits.hashSplit(ids, "id", splits, "v2")
      .as[(Long, String)].collect().toMap
    assert(full.count { case (id, s) => resalted(id) != s } > 1000)
    assert(Splits.hashSplit(ids, "id", splits, "v2")
      .as[(Long, String)].collect().toMap == resalted)
  }

  test("co-bucketed tables join without an Exchange") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    Catalog.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Catalog.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders", "l_orderkey", 8)
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders").hint("merge"), Seq("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
    assert(joined.count() > 0)
  }

  test("approx_count_distinct within 5% of exact (HLL++ error bound)") {
    val o = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    val exact = o.select(countDistinct($"o_custkey")).as[Long].head().toDouble
    val approx = o.select(approx_count_distinct($"o_custkey", rsd = 0.01))
      .as[Long].head().toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("quality score stays in [0,1] across the corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val bad = docs.select(graft.functions.Text.qualityScore($"text").as("q"))
      .where($"q" < 0 || $"q" > 1).count()
    assert(bad == 0)
  }

  test("sliding window streaming agg covers overlapping windows") {
    val batch = EventStreams.windowedAgg(
      Tables.load(spark, sfDir, "events"), "1 hour", slide = Some("30 minutes"))
    // each event lands in exactly 2 overlapping one-hour windows
    val totalN = batch.agg(sum($"n")).as[Long].head()
    val nEvents = Tables.load(spark, sfDir, "events").count()
    assert(totalN == 2 * nEvents)
  }
}
