package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4 scale stance).
  *
  * AQE's skew-join handling covers sort-merge joins; salting is the
  * complement for skewed *aggregations* and for joins where one hot
  * key floods a single task. Shapes:
  *
  *  - [[saltedAgg]]: two-phase aggregate — group on (key, salt) first
  *    (spreads a hot key over `salts` tasks), then re-aggregate on the
  *    key. Works for any algebraic aggregate you can split
  *    (sum/count/min/max via partials).
  *  - [[saltedJoin]]: explode the small side `salts`× with every salt
  *    value, salt the big side randomly — the hot key's rows land on
  *    `salts` different tasks while join semantics are unchanged.
  */
object SkewJoin {

  /** Two-phase salted sum/count aggregation. `aggs` maps output column
    * name → (column to sum). Deterministic salt from a hash of the
    * whole row would skew with duplicate rows, so use a uniform random
    * salt — aggregation results are salt-invariant. */
  def saltedSumAgg(df: DataFrame, keyCol: String, salts: Int,
                   sumCols: Seq[String]): DataFrame = {
    val salted = df.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val partial = salted.groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_cnt"),
        sumCols.map(c => sum(col(c)).as(s"_sum_$c")): _*)
    partial.groupBy(col(keyCol))
      .agg(sum(col("_cnt")).as("cnt"),
        sumCols.map(c => sum(col(s"_sum_$c")).as(s"sum_$c")): _*)
  }

  /** Salted equi-join: big side gets a random salt in [0, salts),
    * small side is exploded with all salt values; join on (key, salt).
    * Inner/left semantics over the big side are preserved. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    bigS.join(smallS, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
