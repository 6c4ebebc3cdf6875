package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J7): for each left row, attach the most
  * recent right row with the same key and right.time <= left.time
  * (inclusive).
  *
  * Implementation is the union–sort–backfill shape, NOT a range join:
  * tag both sides, union, and run `last(ignoreNulls)` over a window
  * partitioned by key and ordered by (time, side) so every left row
  * sees the latest right row at-or-before it. One shuffle on the key,
  * linear scan per key — this survives 100 TB where a range-condition
  * join (pair explosion, BNLJ) does not. Rows-per-key skew is the only
  * hazard; mitigate upstream by salting hot keys if profiling shows it.
  */
object AsOfJoin {

  /** @param left  probe side (keeps all rows)
    * @param right build side; must be unique per (key, time) — callers
    *              dedupe first to make match choice deterministic
    * @param leftKey/rightKey equi-join key column names
    * @param leftTime/rightTime event-time column names
    * @param rightCols right columns to carry (others dropped)
    * @param tolerance optional max staleness (e.g. "30 minutes"): a
    *                  match older than left.time - tolerance is
    *                  dropped back to NULL (kdb-style `wj` windows)
    * @param direction "backward" (default: latest right at-or-before
    *                  left.time) or "forward" (earliest right
    *                  at-or-after); tolerance bounds the gap on the
    *                  matching side either way
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String],
           tolerance: Option[String] = None,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    // always carry the right time internally (tolerance needs it)
    val carried = (rightCols :+ rightTime).distinct

    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // left sorts after right at equal time → inclusive match
    val r = right
      .select((Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side")) ++
        carried.map(c => col(c))): _*)

    // align schemas: left carries its own columns + null right-cols; right vice versa
    val lAligned = l.select(
      (l.columns.filterNot(Seq("_k", "_t", "_side").contains).map(col) ++
        Seq(col("_k"), col("_t"), col("_side")) ++
        carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c"))): _*)
    val rAligned = r.select(
      (left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_k"), col("_t"), col("_side")) ++
        carried.map(c => col(c).as(s"_r_$c"))): _*)

    val unioned = lAligned.unionByName(rAligned)
    // backward: scan time ascending, right sorts before left at equal
    // time (side 0 < 1) → inclusive at-or-before match. forward: scan
    // time DESCENDING so "last seen" is the nearest following right;
    // right still first at equal time → inclusive at-or-after.
    val w = Window.partitionBy(col("_k"))
      .orderBy(if (backward) col("_t").asc else col("_t").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = carried.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    val tooStale = tolerance.map { t =>
      if (backward) col(s"_r_$rightTime") < col("_t") - expr(s"INTERVAL $t")
      else col(s"_r_$rightTime") > col("_t") + expr(s"INTERVAL $t")
    }
    filled
      .where(col("_side") === 1)
      .select((left.columns.map(col) ++
        rightCols.map { c =>
          tooStale match {
            case Some(cond) => when(cond, lit(null)).otherwise(col(s"_r_$c")).as(c)
            case None => col(s"_r_$c").as(c)
          }
        }): _*)
  }
}
