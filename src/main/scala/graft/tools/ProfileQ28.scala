package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler comparing exact-percentile strategies (not part of
  * the driver surface; run manually while tuning). */
object ProfileQ28 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.local("profile-q28")
    val orders = graft.sources.Tables.load(spark, dir, "orders")
    orders.write.format("noop").mode("overwrite").save() // warm scan

    def time(label: String)(body: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        println(f"[profile] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    time("builtin percentile") {
      orders.groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderpriority"))
    }
    time("sort-based operator") {
      graft.operators.Percentiles.exact(orders, "o_orderpriority",
          "o_totalprice", Seq("p50r" -> 0.5, "p90r" -> 0.9))
        .select(col("o_orderpriority"), round(col("p50r"), 2).as("p50"),
          round(col("p90r"), 2).as("p90"), col("n_vals").as("n"))
        .orderBy(asc_nulls_first("o_orderpriority"))
    }
    time("window only (rank+count)") {
      val byG = Window.partitionBy(col("__g"))
      orders.select(col("o_orderpriority").as("__g"),
          col("o_totalprice").as("__v"))
        .withColumn("__rn", row_number().over(byG.orderBy(col("__v"))))
        .withColumn("__n", count(lit(1)).over(byG))
        .where(col("__rn") === col("__n"))
    }
    time("rank window only") {
      val byG = Window.partitionBy(col("__g"))
      orders.select(col("o_orderpriority").as("__g"),
          col("o_totalprice").as("__v"))
        .withColumn("__rn", row_number().over(byG.orderBy(col("__v"))))
        .where(col("__rn") === 1)
    }
    spark.stop()
  }
}
