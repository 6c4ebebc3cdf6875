package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance (Kimball SCD2): the
  * warehouse pattern for keeping a dimension's FULL HISTORY — every
  * attribute change closes the current row (`valid_to` = the change
  * time) and opens a new one, so fact joins can be as-of-correct
  * (the [[AsOfJoin]] complement on the write side).
  *
  * Table contract: key columns + tracked attribute columns +
  * `valid_from timestamp` + `valid_to timestamp` (NULL = current
  * row). [[apply2]] is a pure snapshot→snapshot transform — compose
  * with [[graft.catalog.Catalog.merge]]'s swap or
  * [[graft.catalog.Versioned]] commits for durability, both already
  * crash-safe.
  *
  * Scale shape: history rows pass through UNTOUCHED (filter, no
  * shuffle); the one FULL OUTER join is current-rows × updates on
  * the key (updates are a delta, small by contract — AQE broadcasts
  * them); change detection is a null-safe `<=>` conjunction over the
  * tracked columns, map-side in the join. No window, no sort, no
  * per-key loop.
  */
object Scd {

  /** Apply a delta of `(keyCols ++ tracked)` rows as of `asOfTs`
    * (an ISO timestamp literal, e.g. "2024-06-01 00:00:00"):
    *
    *  - closed history rows (`valid_to` non-NULL): unchanged;
    *  - current row whose key has an update with ANY tracked-column
    *    change (null-safe): row closes with `valid_to = asOfTs`, a
    *    new current row opens with the update's attributes and
    *    `valid_from = asOfTs`;
    *  - current row whose update is attribute-identical: unchanged
    *    (no spurious version churn);
    *  - key only in `updates`: new current row
    *    (`valid_from = asOfTs`);
    *  - key only in `current`: unchanged.
    *
    * Updates must be key-unique (the ambiguous multi-row match is
    * rejected, the MERGE precedent). */
  def apply2(current: DataFrame, updates: DataFrame,
             keyCols: Seq[String], asOfTs: String): DataFrame = {
    require(keyCols.nonEmpty, "scd needs at least one key column")
    val meta = Seq("valid_from", "valid_to")
    meta.foreach(m => require(current.columns.contains(m),
      s"scd: current snapshot has no $m column"))
    val tracked = current.columns.toSeq.filterNot(
      c => keyCols.contains(c) || meta.contains(c))
    require(tracked.nonEmpty, "scd: no tracked attribute columns")
    require(updates.columns.sorted.sameElements(
      (keyCols ++ tracked).sorted),
      s"scd: updates must carry exactly key + tracked columns " +
        s"(${(keyCols ++ tracked).mkString(",")}); " +
        s"got ${updates.columns.mkString(",")}")
    val dups = updates.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1).limit(1).count()
    require(dups == 0L,
      s"scd: updates contain more than one row per (${keyCols.mkString(",")}) key")

    val ts = to_timestamp(lit(asOfTs))
    val hist = current.where(col("valid_to").isNotNull)
    val cur = current.where(col("valid_to").isNull)
    val u = updates.withColumn("__upd", lit(true))
    val j = cur.as("c").join(u.as("u"), keyCols, "full_outer")
    val changed = col("u.__upd").isNotNull && col("c.valid_from").isNotNull &&
      !tracked.map(t => col(s"c.`$t`") <=> col(s"u.`$t`")).reduce(_ && _)
    val inCur = col("c.valid_from").isNotNull

    // surviving current rows: untouched, or closed at asOfTs
    val keptOrClosed = j.where(inCur).select(
      keyCols.map(col) ++
        tracked.map(t => col(s"c.`$t`").as(t)) ++
        Seq(col("c.valid_from").as("valid_from"),
          when(changed, ts).otherwise(lit(null).cast("timestamp"))
            .as("valid_to")): _*)
    // opened rows: changed keys and brand-new keys
    val opened = j.where(col("u.__upd").isNotNull && (!inCur || changed))
      .select(
        keyCols.map(col) ++
          tracked.map(t => col(s"u.`$t`").as(t)) ++
          Seq(ts.as("valid_from"),
            lit(null).cast("timestamp").as("valid_to")): _*)

    val ordered = current.columns.toSeq
    hist.select(ordered.map(col): _*)
      .unionAll(keptOrClosed.select(ordered.map(col): _*))
      .unionAll(opened.select(ordered.map(col): _*))
  }

  /** The as-of read side: the dimension snapshot valid at `atTs`. */
  def snapshotAt(dim: DataFrame, atTs: String): DataFrame = {
    val ts = to_timestamp(lit(atTs))
    dim.where(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
  }
}
