package graft.tools

/** Scratch profiler for the q25 correlated-subquery tail (not part of
  * the driver surface; run manually while tuning). Compares the
  * baseline EXISTS plan against join-strategy hints on the
  * decorrelated semi join, per the q16b methodology: measure, apply
  * only what wins. */
object ProfileQ25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.local("profile-q25")
    graft.sources.Tables.registerViews(spark, dir)
    // warm both scans
    spark.table("orders").write.format("noop").mode("overwrite").save()
    spark.table("lineitem").write.format("noop").mode("overwrite").save()

    def time(label: String)(sql: String): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        println(f"[profile] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val baseline =
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p
         FROM orders o
         WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
           AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
         ORDER BY o_orderkey NULLS FIRST"""
    val hintedShuffleHash =
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p
         FROM orders o
         WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
           AND EXISTS (SELECT /*+ SHUFFLE_HASH(l) */ 1
                       FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
         ORDER BY o_orderkey NULLS FIRST"""
    val hintedBroadcast =
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p
         FROM orders o
         WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
           AND EXISTS (SELECT /*+ BROADCAST(l) */ 1
                       FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
         ORDER BY o_orderkey NULLS FIRST"""

    // round-5 candidate (judge): shrink the semi-join build input by
    // pre-aggregating to distinct keys — partial (map-side) aggregation
    // cuts the shuffled row count by the rows-per-key factor before
    // the exchange, at the price of an extra aggregate
    val distinctSemi =
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p
         FROM orders o
         WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)
           AND EXISTS (SELECT /*+ SHUFFLE_HASH(l) */ 1
                       FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
                       WHERE l.l_orderkey = o.o_orderkey)
         ORDER BY o_orderkey NULLS FIRST"""

    // round-5 candidate 2: the price filter keeps ~1% of orders, so
    // broadcast THAT side into a semi join running map-side over
    // lineitem — the big table never shuffles; the only exchange left
    // is the distinct over the matched keys (already shrunk map-side
    // by partial aggregation) and the 1% final sort. At 100 TB this
    // is the shape you want: selective dimension broadcast pruning
    // the fact scan in place.
    val broadcastFiltered =
      """WITH big AS (SELECT o_orderkey, o_totalprice FROM orders
                      WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.8 FROM orders)),
              keys AS (SELECT DISTINCT l_orderkey
                       FROM lineitem
                       WHERE l_orderkey IN (SELECT /*+ BROADCAST(big) */ o_orderkey FROM big))
         SELECT /*+ BROADCAST(keys) */ o_orderkey, ROUND(o_totalprice, 2) AS p
         FROM big JOIN keys ON o_orderkey = l_orderkey
         ORDER BY o_orderkey NULLS FIRST"""

    println("=== baseline plan ===")
    spark.sql(baseline).explain("formatted")
    println("=== shuffle_hash plan ===")
    spark.sql(hintedShuffleHash).explain("formatted")
    println("=== distinct semi plan ===")
    spark.sql(distinctSemi).explain("formatted")

    time("baseline EXISTS")(baseline)
    time("SHUFFLE_HASH(l) semi")(hintedShuffleHash)
    time("BROADCAST(l) semi")(hintedBroadcast)
    time("distinct-key semi")(distinctSemi)
    println("=== broadcast-filtered plan ===")
    spark.sql(broadcastFiltered).explain("formatted")
    time("broadcast-filtered semi")(broadcastFiltered)

    // floor decomposition: the three irreducible pieces of the query,
    // each alone (scalar agg job; filtered scan + global sort; the
    // decorrelated semi join) — if their floors sum past the 2× bar,
    // the gap is scheduling constant, not plan
    time("component: avg scalar agg")(
      "SELECT AVG(o_totalprice) * 1.8 AS t FROM orders")
    time("component: filter+sort only")(
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders
         WHERE o_totalprice > 80000 ORDER BY o_orderkey NULLS FIRST""")
    time("component: semi join only")(
      """SELECT o_orderkey FROM orders o
         WHERE EXISTS (SELECT /*+ SHUFFLE_HASH(l) */ 1
                       FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""")
    time("component: noop floor")(
      "SELECT 1 AS one")
    spark.stop()
  }
}
