package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKAgg, TopKByScore}

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Aggregator semantics: bounded buffer, order, tie-break") {
    val agg = new TopKByScore(3)
    val items = Seq(
      ScoredId(1, 0.5), ScoredId(2, 0.9), ScoredId(3, 0.9),
      ScoredId(4, 0.1), ScoredId(5, 0.7))
    val b = items.foldLeft(agg.zero)(agg.reduce)
    assert(b.length == 3)
    // score desc, id asc on the 0.9 tie
    assert(agg.finish(b) == Seq(ScoredId(2, 0.9), ScoredId(3, 0.9), ScoredId(5, 0.7)))
    // merge of disjoint partials = same top-3
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == agg.finish(b))
  }

  test("UDAF top-k equals the row_number window on grouped scores") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- 0 until 7
      i <- 0 until 40
    } yield (g.toLong, (g * 100 + i).toLong, math.floor(rnd.nextDouble() * 100) / 100)
    val df = rows.toDF("grp", "id", "score")

    val viaWindow = df.withColumn("rnk",
        row_number().over(Window.partitionBy("grp")
          .orderBy(col("score").desc, col("id").asc)))
      .where(col("rnk") <= 5)
      .select(col("grp"), col("id"), col("score"), col("rnk").cast("long"))

    val tk = TopKAgg.topK(5)
    val viaUdaf = df.groupBy("grp")
      .agg(tk(col("id"), col("score")).as("topk"))
      .select(col("grp"), posexplode(col("topk")))
      .select(col("grp"), col("col.id").as("id"), col("col.score").as("score"),
        (col("pos") + 1).cast("long").as("rnk"))

    val a = viaWindow.as[(Long, Long, Double, Long)].collect().toSet
    val b = viaUdaf.as[(Long, Long, Double, Long)].collect().toSet
    assert(a == b)
    assert(a.size == 35)
  }

  test("VectorMean equals the explode-groupBy formulation") {
    val rnd = new scala.util.Random(5)
    val rows = for (g <- 0 until 4; _ <- 0 until 25)
      yield (g, Seq.fill(8)(rnd.nextGaussian()))
    val df = rows.toDF("g", "v")

    val viaUdaf = df.groupBy("g")
      .agg(graft.functions.VectorAgg.meanVec(col("v")).as("mv"))
      .select(col("g"), posexplode(col("mv")))
      .as[(Int, Int, Double)].collect().toSet

    val viaExplode = df.select(col("g"), posexplode(col("v")))
      .groupBy("g", "pos").agg(avg("col").as("m"))
      .as[(Int, Int, Double)].collect().toSet

    val byKey = viaExplode.map { case (g, p, m) => (g, p) -> m }.toMap
    viaUdaf.foreach { case (g, p, m) =>
      assert(math.abs(m - byKey((g, p))) < 1e-12, s"($g,$p)")
    }
    assert(viaUdaf.size == 32)
    // dim-mismatch fails fast instead of truncating
    val bad = Seq((0, Seq(1.0, 2.0)), (0, Seq(1.0))).toDF("g", "v")
    intercept[Exception] {
      bad.groupBy("g").agg(graft.functions.VectorAgg.meanVec(col("v"))).collect()
    }
  }

  test("VectorSum: exact integer element-wise sums, n·mean identity") {
    val rows = for (g <- 0 until 3; i <- 0 until 50)
      yield (g, Seq.tabulate(6)(j => ((g * 31 + i * 7 + j * 13) % 19 - 9).toDouble))
    val df = rows.toDF("g", "v")
    val sums = df.groupBy("g")
      .agg(graft.functions.VectorAgg.sumVec(col("v")).as("sv"))
      .as[(Int, Seq[Double])].collect().toMap
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })).toMap
    (0 until 3).foreach(g => assert(sums(g) == expected(g), s"g=$g"))
    // exact: every element is an integer-valued double
    sums.values.flatten.foreach(x => assert(x == math.rint(x)))
  }

  test("centroidOutliers: off-direction vectors flagged, per-label isolation") {
    // label 0: three vectors near +x, one anti-aligned; label 1: near +y
    val rows = Seq(
      (0L, 0L, Seq(10.0, 1.0, 0.0)),
      (1L, 0L, Seq(9.0, -1.0, 0.0)),
      (2L, 0L, Seq(11.0, 0.0, 1.0)),
      (3L, 0L, Seq(-10.0, 0.0, 0.0)),   // outlier for label 0
      (4L, 1L, Seq(0.0, 8.0, 1.0)),
      (5L, 1L, Seq(0.0, 9.0, -1.0)))
      .toDF("vec_id", "label", "embedding")
    val r = graft.functions.Sim.centroidOutliers(rows, minCos = 0.5)
      .select(col("vec_id"), col("is_outlier"))
      .as[(Long, Boolean)].collect().toMap
    assert(r == Map(0L -> false, 1L -> false, 2L -> false,
      3L -> true, 4L -> false, 5L -> false))
  }
}
