package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** CDC log apply: sequence order (not op precedence) decides, deletes
  * remove, inserts add, untouched rows pass through, ambiguous or
  * malformed feeds are rejected. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "v", "x")

  test("sequence order wins: later op replaces earlier, whatever the ops are") {
    // k=1: U@1 then D@2 → deleted; k=2: D@1 then U@2 → resurrected
    // with the U payload (op precedence would get this wrong);
    // k=5: I → new row; k=3/4 untouched
    val log = Seq(
      (1L, 1L, "U", "a2", 11.0), (1L, 2L, "D", null, 0.0),
      (2L, 1L, "D", null, 0.0), (2L, 2L, "U", "b2", 22.0),
      (5L, 1L, "I", "e", 50.0))
      .toDF("k", "seq", "op", "v", "x")
    val got = Cdc.apply(base, log, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((2L, "b2", 22.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0)), got.toString)
  }

  test("ops are case-insensitive; broadcast and shuffle paths agree") {
    val log = Seq((1L, 1L, "d", null.asInstanceOf[String], 0.0),
        (5L, 7L, "i", "e", 50.0))
      .toDF("k", "seq", "op", "v", "x")
    val a = Cdc.apply(base, log, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val b = Cdc.apply(base, log, Seq("k"), broadcastLog = false)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(_._1) == Seq(2L, 3L, 4L, 5L))
  }

  test("a later re-insert resurrects a deleted key (pure seq order)") {
    val log = Seq((3L, 1L, "D", null.asInstanceOf[String], 0.0),
        (3L, 2L, "I", "c2", 33.0), (3L, 3L, "U", "c3", 34.0))
      .toDF("k", "seq", "op", "v", "x")
    val got = Cdc.apply(base, log, Seq("k"))
      .where($"k" === 3L).as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((3L, "c3", 34.0)), got.toString)
  }

  test("malformed feeds are rejected: dup (key,seq), NULL seq, bad op, wrong columns") {
    def lg(rows: Seq[(Long, java.lang.Long, String, String, Double)]) =
      rows.toDF("k", "seq", "op", "v", "x")
    intercept[IllegalArgumentException] {
      Cdc.apply(base, lg(Seq((1L, 1L, "U", "a", 1.0), (1L, 1L, "D", null, 0.0))),
        Seq("k")).count()
    }
    intercept[IllegalArgumentException] {
      Cdc.apply(base, lg(Seq((1L, null, "U", "a", 1.0))), Seq("k")).count()
    }
    intercept[IllegalArgumentException] {
      Cdc.apply(base, lg(Seq((1L, 1L, "UPSERT", "a", 1.0))), Seq("k")).count()
    }
    intercept[IllegalArgumentException] {
      Cdc.apply(base, Seq((1L, 1L, "U")).toDF("k", "seq", "op"), Seq("k"))
    }
  }

  test("NULL keys displace null-safely: delete removes, upsert replaces") {
    // a plain-equality anti join never matches NULL = NULL — the
    // deleted NULL-key row would survive, and an upsert would emit
    // BOTH the old and new rows
    val nbase = base.unionAll(
      Seq((null.asInstanceOf[java.lang.Long], "n", 0.5))
        .toDF("k", "v", "x"))
    val del = Seq((null.asInstanceOf[java.lang.Long], 1L, "D",
        null.asInstanceOf[String], 0.0))
      .toDF("k", "seq", "op", "v", "x")
    val afterDel = Cdc.apply(nbase, del, Seq("k"))
      .select($"k").as[Option[Long]].collect().toSeq
    assert(!afterDel.contains(None), s"NULL-key row survived its delete")
    val up = Seq((null.asInstanceOf[java.lang.Long], 1L, "U", "n2", 0.7))
      .toDF("k", "seq", "op", "v", "x")
    val afterUp = Cdc.apply(nbase, up, Seq("k"))
      .where($"k".isNull).as[(Option[Long], String, Double)].collect().toSeq
    assert(afterUp == Seq((None, "n2", 0.7)),
      s"NULL-key upsert must replace, not duplicate: $afterUp")
  }

  test("empty log is the identity") {
    val log = Seq.empty[(Long, Long, String, String, Double)]
      .toDF("k", "seq", "op", "v", "x")
    val got = Cdc.apply(base, log, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == base.as[(Long, String, Double)].collect().sortBy(_._1).toSeq)
  }

  test("applyOrdered: out-of-order batches converge to the one-shot apply") {
    // each key's LATER entry arrives in the EARLIER batch — the feed
    // shape a partitioned CDC topic actually delivers. Plain apply()
    // per batch would regress k=1 (stale U resurrects the deleted
    // row) and k=6 (stale D kills the newer insert); the tombstone +
    // sequence guard must hold both.
    val full = Seq(
      (1L, 1L, "U", "a2", 11.0), (1L, 2L, "D", null, 0.0),
      (2L, 1L, "D", null, 0.0), (2L, 2L, "U", "b2", 22.0),
      (5L, 1L, "I", "e", 50.0), (5L, 2L, "U", "e2", 55.0),
      (6L, 2L, "I", "f", 60.0), (6L, 1L, "D", null, 0.0))
    def df(rows: Seq[(Long, Long, String, String, Double)]) =
      rows.toDF("k", "seq", "op", "v", "x")
    val oneShot = Cdc.apply(base, df(full), Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    for (batches <- Seq(
        Seq(full.filter(_._2 == 2L), full.filter(_._2 == 1L)),   // reversed
        Seq(full.filter(_._2 == 1L), full.filter(_._2 == 2L)),   // in order
        Seq(full))) {                                            // one batch
      val end = batches.foldLeft(Cdc.initState(base)) { (st, b) =>
        Cdc.applyOrdered(st, df(b), Seq("k"))
      }
      val got = Cdc.snapshot(end)
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(got == oneShot, s"diverged for split $batches: $got vs $oneShot")
    }
  }

  test("applyOrdered: tombstones persist with the winning seq; stale ops ignored") {
    val st1 = Cdc.applyOrdered(Cdc.initState(base),
      Seq((1L, 9L, "D", null.asInstanceOf[String], 0.0))
        .toDF("k", "seq", "op", "v", "x"), Seq("k"))
    val t = st1.where($"k" === 1L)
      .select($"seq", $"__deleted").as[(Long, Boolean)].collect().toSeq
    assert(t == Seq((9L, true)), s"tombstone missing: $t")
    // a stale re-insert (seq 3 < 9) must NOT resurrect
    val st2 = Cdc.applyOrdered(st1,
      Seq((1L, 3L, "I", "zombie", 1.0)).toDF("k", "seq", "op", "v", "x"),
      Seq("k"))
    assert(Cdc.snapshot(st2).where($"k" === 1L).count() == 0L)
    // a NEWER re-insert (seq 10) must resurrect
    val st3 = Cdc.applyOrdered(st2,
      Seq((1L, 10L, "I", "alive", 2.0)).toDF("k", "seq", "op", "v", "x"),
      Seq("k"))
    val back = Cdc.snapshot(st3).where($"k" === 1L)
      .as[(Long, String, Double)].collect().toSeq
    assert(back == Seq((1L, "alive", 2.0)), back.toString)
  }

  test("diff: round-trip law — apply(from, diff(from, to)) == to") {
    // exercises every edge at once: NULL key (payload change), NULL
    // payload transitions in both directions, delete, insert,
    // unchanged rows (absent from the diff)
    val from = Seq(
      (Some(1L), "a", Option(10.0)), (Some(2L), "b", None),
      (Some(3L), "c", Option(30.0)), (None, "n", Option(0.5)))
      .toDF("k", "v", "x")
    val to = Seq(
      (Some(1L), "a", Option(10.0)),          // unchanged
      (Some(2L), "b", Option(20.0)),          // NULL -> value
      (Some(4L), "d", None),                  // insert with NULL payload
      (None, "n2", Option(0.5)))              // NULL key changed
      .toDF("k", "v", "x")                    // (3 deleted)
    val log = Cdc.diff(from, to, Seq("k"))
    val ops = log.select($"k", $"op").as[(Option[Long], String)]
      .collect().toSet
    assert(ops == Set((Some(2L), "U"), (Some(3L), "D"),
      (Some(4L), "I"), (None, "U")), ops.toString)
    val back = Cdc.apply(from, log, Seq("k"))
      .as[(Option[Long], String, Option[Double])].collect()
      .sortBy(_._1.getOrElse(Long.MinValue)).toSeq
    val want = to.as[(Option[Long], String, Option[Double])].collect()
      .sortBy(_._1.getOrElse(Long.MinValue)).toSeq
    assert(back == want, s"round-trip diverged: $back vs $want")
  }

  test("diff of identical snapshots is empty; schema/dup rejections fail loud") {
    assert(Cdc.diff(base, base, Seq("k")).count() == 0L)
    intercept[IllegalArgumentException] {
      Cdc.diff(base, base.drop("x"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Cdc.diff(base.unionAll(base), base, Seq("k")).count()
    }
  }

  test("plan shape: no window over the log; broadcast anti join on the base") {
    val log = Seq((1L, 1L, "U", "a2", 11.0)).toDF("k", "seq", "op", "v", "x")
    val plan = Cdc.apply(base, log, Seq("k"), checkUnique = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "log collapse must be an aggregation")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      "collapsed log should broadcast into the anti join")
  }
}
