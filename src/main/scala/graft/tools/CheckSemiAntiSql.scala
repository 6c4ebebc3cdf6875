package graft.tools

/** Scratch check: does SemiAntiRightDedup fire for SQL NOT EXISTS
  * (subquery-rewritten anti join), not just DataFrame-API joins? */
object CheckSemiAntiSql {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local("check-semianti-sql", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    graft.sources.Tables.load(spark, d, "part").createOrReplaceTempView("part")
    graft.sources.Tables.load(spark, d, "lineitem").createOrReplaceTempView("lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = spark.sql(
      """SELECT p_partkey FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_partkey = p.p_partkey)""")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("SQL_ANTI_DEDUP_FIRED=" + plan.contains("HashAggregate(keys=[l_partkey"))
    val df2 = {
      val p = graft.sources.Tables.load(spark, d, "part")
      val li = graft.sources.Tables.load(spark, d, "lineitem")
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
    }
    df2.write.format("noop").mode("overwrite").save()
    println("DF_ANTI_DEDUP_FIRED=" + df2.queryExecution.executedPlan.toString
      .contains("HashAggregate(keys=[l_partkey"))
    spark.stop()
  }
}
