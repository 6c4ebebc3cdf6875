package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.sources.Tables

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("CMS audit is partition-order independent (merge is commutative)") {
    val ev = Tables.load(spark, sfDir, "events")
    val a = Sketches.cmsAudit(ev, "event_type").collect().head
    val b = Sketches.cmsAudit(ev.repartition(7), "event_type").collect().head
    assert(a == b)
    assert(a.getLong(1) == 0L && a.getLong(2) == 0L)
  }

  test("Bloom audit: no false negatives regardless of partitioning") {
    val ev = Tables.load(spark, sfDir, "events")
    val a = Sketches.bloomAudit(ev, "event_type", 10000, 0.03).collect().head
    val b = Sketches.bloomAudit(ev.repartition(5), "event_type", 10000, 0.03)
      .collect().head
    assert(a.getLong(1) == 0L && b.getLong(1) == 0L)
    assert(a.getBoolean(2) && b.getBoolean(2))
  }

  test("Bloom audit probes ride the key column's type (long keys non-vacuous)") {
    import spark.implicits._
    // string probes against a long-built filter never collide, so the
    // fp check used to be vacuous for numeric keys; typed probes make
    // it real while the anti-join keeps every probe genuinely absent
    val df = (1L to 500L).toDF("k")
    val r = Sketches.bloomAudit(df, "k", 500, 0.03).collect().head
    assert(r.getLong(0) == 500L)
    assert(r.getLong(1) == 0L)
    assert(r.getBoolean(2))
    // int keys: probes must stay within the type's range (an
    // out-of-range cast throws under ANSI mode)
    val di = (1 to 300).toDF("k")
    val ri = Sketches.bloomAudit(di, "k", 300, 0.03).collect().head
    assert(ri.getLong(0) == 300L)
    assert(ri.getLong(1) == 0L)
    assert(ri.getBoolean(2))
  }

  test("audits skip null keys (sketch aggregates never see them)") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), Some("b"), None).toDF("k")
    val cms = Sketches.cmsAudit(df, "k").collect().head
    assert(cms.getLong(0) == 2L) // a, b — null excluded
    assert(cms.getLong(1) == 0L && cms.getLong(2) == 0L)
    val bloom = Sketches.bloomAudit(df, "k", 100, 0.03).collect().head
    assert(bloom.getLong(0) == 2L && bloom.getLong(1) == 0L)
  }
}
