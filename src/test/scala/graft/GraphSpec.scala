package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("cycle is a fixpoint of the integer iteration") {
    // a->b->a: contrib = (1e6*17 div 20) div 1 = 850000; 150000+850000 = 1e6
    assert(ranks(Seq(1L -> 2L, 2L -> 1L), 1) == Map(1L -> 1000000L, 2L -> 1000000L))
    assert(ranks(Seq(1L -> 2L, 2L -> 1L), 5) == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star: hand-computed two rounds, dangling hub leaks, teleport floor") {
    // a->b, c->b. round 1: b = 150000 + 2*850000 = 1850000; a = c = 150000
    // round 2: b = 150000 + 2*((150000*17 div 20) div 1)
    //            = 150000 + 2*127500 = 405000 (b itself is dangling)
    val e = Seq(1L -> 2L, 3L -> 2L)
    assert(ranks(e, 1) == Map(1L -> 150000L, 2L -> 1850000L, 3L -> 150000L))
    assert(ranks(e, 2) == Map(1L -> 150000L, 2L -> 405000L, 3L -> 150000L))
  }

  test("parallel edges are a multiset; self-loops are ordinary edges") {
    // a->b twice: outdeg(a)=2, per-edge contrib = 850000 div 2 = 425000,
    // b receives both -> same inflow as one edge from outdeg 1
    val r = ranks(Seq(1L -> 2L, 1L -> 2L), 1)
    assert(r == Map(1L -> 150000L, 2L -> 1000000L))
    // self-loop feeds the node itself
    val s = ranks(Seq(7L -> 7L), 1)
    assert(s == Map(7L -> 1000000L))
  }

  test("operator equals its own unrolled-SQL spec on a generated graph") {
    // spark-side replay of pageRankSql's CTE chain, in scala
    val edges = (0L until 60L).flatMap { i =>
      Seq(i -> ((i * 7 + 13) % 30)) ++
        (if (i % 3 == 0) Seq(i -> ((i * 31 + 5) % 30)) else Nil)
    }
    def spec(iters: Int): Map[Long, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val inflow = edges.groupBy(_._2).view.mapValues(
          _.map { case (s, _) => (r(s) * 17 / 20) / outdeg(s) }.sum).toMap
        r = nodes.map(n => n -> (150000L + inflow.getOrElse(n, 0L))).toMap
      }
      r
    }
    assert(ranks(edges, 5) == spec(5))
  }

  test("bucketed edges: every iteration's join is exchange-free on the edge side") {
    // the 100 TB layout SCALE.md claims: bucket edges by src ONCE, and
    // no iteration ever shuffles the data-sized edge table — only the
    // node-sized contribution frame moves
    val edges = (0L until 5000L).map(i => (i % 400, (i * 7 + 13) % 400))
      .toDF("src", "dst")
    spark.sql("DROP TABLE IF EXISTS edges_bucketed_spec")
    graft.catalog.Catalog.writeBucketed(edges, "edges_bucketed_spec", "src", 8)
    val be = spark.table("edges_bucketed_spec")
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thr)
    try {
      // broadcast off: at fixture scale AQE would broadcast everything
      // and the exchange question would be vacuous
      spark.conf.set(thr, "-1")
      def iterPlan(e: org.apache.spark.sql.DataFrame): String = {
        val nodes = e.select($"src".as("node"))
          .union(e.select($"dst".as("node"))).distinct()
        val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val r0 = nodes.withColumn("rank", lit(1000000L))
        val step = Graph.step(e, nodes, outdeg, r0)
        step.write.format("noop").mode("overwrite").save()
        step.queryExecution.executedPlan.toString
      }
      val bucketed = iterPlan(be)
      val plain = iterPlan(edges)
      assert(bucketed.contains("Bucketed: true"),
        s"bucketed scan not engaged:\n$bucketed")
      def exchanges(p: String): Int =
        "Exchange hashpartitioning".r.findAllIn(p).length
      // identical shape except the edge-side exchange disappears
      assert(exchanges(bucketed) < exchanges(plain),
        s"bucketing saved no exchange: bucketed=${exchanges(bucketed)} " +
          s"plain=${exchanges(plain)}\n$bucketed")
    } finally spark.conf.set(thr, prev)

    // and the ranks are EXACT over the bucketed layout (x69's integer
    // determinism is partitioning-independent)
    val viaBucketed = Graph.pageRank(be, iters = 3)
      .as[(Long, Long)].collect().toMap
    val viaPlain = Graph.pageRank(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(viaBucketed == viaPlain)
  }
}
