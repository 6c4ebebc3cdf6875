package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch sessionization (SURVEY.md §2.8 ST3 batch analogue): group
  * events into per-key sessions separated by inactivity gaps.
  *
  * Uses Spark's native `session_window` (same operator the streaming
  * path uses, so batch and stream agree on semantics): an event extends
  * the current session iff it starts strictly before previous-event
  * time + gap; a gap of exactly `gap` starts a new session.
  * One shuffle on the key; per-key linear merge.
  */
object Sessionize {

  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gap: String = "10 minutes"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("v"),
        min(col(tsCol)).as("session_start"))
      .select(col(keyCol), col("session_start"), col("n_events"), col("v"))
}
