package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data prep (SURVEY.md north-star
  * extension): assign documents to fixed-token-budget training
  * sequences by their starting offset in a deterministic document
  * order — the contiguous-packing scheme (greedy first-fit needs a
  * sequential scan; contiguous packing is a window cumsum, exact,
  * order-stable, and parallel).
  *
  * Scale design: the window partitions by `groupCol` (split / shard),
  * so no global ordering exists anywhere — each group packs
  * independently, which is exactly how packing shards at 100 TB
  * (sequences never span shards). Skewed groups split fine: the
  * cumsum is a single window pass per group.
  */
object Packing {

  /** Adds `seq_id`: the training sequence (of `seqTokens` budget)
    * each document STARTS in, packing contiguously per `groupCol` in
    * `orderCol` order. `tokCol` is the per-document token count.
    *
    * CONTRACT: `orderCol` must be UNIQUE within each group (a doc id,
    * not a timestamp) — the cumulative sum over tied rows would
    * otherwise depend on Spark's arbitrary tie order and the packing
    * would not be reproducible. Append a unique tie-break column to
    * the ordering upstream if the natural order has collisions. */
  def contiguous(df: DataFrame, groupCol: String, orderCol: String,
                 tokCol: String, seqTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_off", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("_off") / seqTokens).cast("long"))
      .drop("_off")
  }
}
