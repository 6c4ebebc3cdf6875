package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-touch marketing attribution: credit each conversion to the
  * user's latest preceding touch (click/impression/channel event)
  * within a lookback window — the standard product-analytics revenue
  * attribution, and at engine level exactly a BACKWARD AS-OF JOIN
  * ([[AsOfJoin]]) followed by one small aggregation.
  *
  * Determinism: several touches can share a (user, timestamp) —
  * whichever "wins" must not depend on partitioning, so touches are
  * pre-collapsed to one row per (user, time) keeping the MAX channel
  * string (a documented, engine-replayable tie rule). Conversions
  * with no touch inside the window attribute to NULL — unattributed
  * revenue is visible, never silently dropped or double-counted.
  *
  * Scale shape: the pre-collapse and the as-of join shuffle by user
  * once each (the as-of is the x11 one-key-shuffle shape, never a
  * range cross product); the final rollup is channels-sized. */
object Attribution {

  /** @param conversions rows with (userCol, timeCol, valueCol)
    * @param touches rows with (userCol, timeCol, channelCol)
    * @param lookback max age of a credited touch, e.g. "7 days"
    * @return one row per channel (NULL = unattributed):
    *         `(channel, n_conversions, revenue)` */
  def lastTouch(conversions: DataFrame, touches: DataFrame,
                lookback: String,
                userCol: String = "user_id", timeCol: String = "ts",
                valueCol: String = "value",
                channelCol: String = "channel"): DataFrame = {
    val collapsed = touches
      .where(col(timeCol).isNotNull && col(channelCol).isNotNull)
      .groupBy(col(userCol), col(timeCol))
      .agg(max(col(channelCol)).as(channelCol))
    // conversions are NOT time-filtered: a NULL-ts conversion can
    // never match a touch (NULLs sort before every touch in the as-of
    // scan), so it lands in the NULL/unattributed bucket — its revenue
    // stays visible instead of silently vanishing from the rollup
    val joined = AsOfJoin.asOf(
      conversions,
      collapsed,
      leftKey = userCol, rightKey = userCol,
      leftTime = timeCol, rightTime = timeCol,
      rightCols = Seq(channelCol),
      tolerance = Some(lookback),
      direction = "backward")
    joined.groupBy(col(channelCol).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol)).as("revenue"))
  }
}
