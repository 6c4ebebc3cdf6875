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
  * shuffle). The delta applies as two joins, both delta-sized on one
  * side: current LEFT JOIN updates (updates broadcast — Spark never
  * broadcasts a FULL OUTER side, which is why the naive full-outer
  * formulation would shuffle the whole dimension for a 1-row delta)
  * yields every kept/closed/reopened row in ONE map-side pass over
  * the current rows; new keys come from updates ANTI JOIN the
  * current KEY projection (the only shuffle, key-columns wide).
  * Change detection is a null-safe `<=>` conjunction over the
  * tracked columns, map-side in the join. No window, no sort, no
  * per-key loop. Set `broadcastUpdates = false` for a
  * dimension-sized delta (backfills): both joins then shuffle on the
  * key instead.
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
    * Both sides must be key-unique where it matters: a multi-row
    * UPDATE key is rejected (the ambiguous MERGE case), and a
    * current snapshot carrying two OPEN rows for one key is rejected
    * too — the full-outer multiplication would silently compound the
    * corruption on every later run (`checkUnique = false` skips both
    * scans for pre-validated pipelines). */
  def apply2(current: DataFrame, updates: DataFrame,
             keyCols: Seq[String], asOfTs: String,
             broadcastUpdates: Boolean = true,
             checkUnique: Boolean = true): DataFrame = {
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

    val ts = to_timestamp(lit(asOfTs))
    val hist = current.where(col("valid_to").isNotNull)
    val cur = current.where(col("valid_to").isNull)
    if (checkUnique) {
      // both uniqueness probes in ONE job (they were two eager
      // count() actions — pure scheduling overhead on the no-dup
      // happy path); the side tag keeps the error message exact
      def dupSide(df: DataFrame, what: String): DataFrame =
        df.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
          .limit(1).select(lit(what).as("__what"))
      val bad = dupSide(updates, "updates")
        .unionAll(dupSide(cur, "current OPEN rows"))
        .take(1)
      require(bad.isEmpty,
        s"scd: ${bad.headOption.map(_.getString(0)).getOrElse("")} contain " +
          s"more than one row per (${keyCols.mkString(",")}) key")
    }
    val u0 = updates.withColumn("__upd", lit(true))
    val u = if (broadcastUpdates) broadcast(u0) else u0
    // one map-side pass over the current rows: kept, closed, and the
    // reopened versions of changed keys all come from this LEFT join
    val j = cur.as("c").join(u.as("u"), keyCols, "left")
    val changed = col("u.__upd").isNotNull &&
      !tracked.map(t => col(s"c.`$t`") <=> col(s"u.`$t`")).reduce(_ && _)
    val keptOrClosed = j.select(
      keyCols.map(col) ++
        tracked.map(t => col(s"c.`$t`").as(t)) ++
        Seq(col("c.valid_from").as("valid_from"),
          when(changed, ts).otherwise(col("c.valid_to"))
            .as("valid_to")): _*)
    val reopened = j.where(changed).select(
      keyCols.map(col) ++
        tracked.map(t => col(s"u.`$t`").as(t)) ++
        Seq(ts.as("valid_from"),
          lit(null).cast("timestamp").as("valid_to")): _*)
    // brand-new keys: the only shuffle, and it carries key columns only
    val openedNew = updates
      .join(cur.select(keyCols.map(col): _*), keyCols, "left_anti")
      .select(
        keyCols.map(col) ++
          tracked.map(t => col(s"`$t`").as(t)) ++
          Seq(ts.as("valid_from"),
            lit(null).cast("timestamp").as("valid_to")): _*)

    val ordered = current.columns.toSeq
    hist.select(ordered.map(col): _*)
      .unionAll(keptOrClosed.select(ordered.map(col): _*))
      .unionAll(reopened.select(ordered.map(col): _*))
      .unionAll(openedNew.select(ordered.map(col): _*))
  }

  /** The as-of read side: the dimension snapshot valid at `atTs`. */
  def snapshotAt(dim: DataFrame, atTs: String): DataFrame = {
    val ts = to_timestamp(lit(atTs))
    dim.where(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
  }
}
