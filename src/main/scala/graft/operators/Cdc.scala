package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture log application — the warehouse pattern for
  * materializing a Debezium/Delta-CDF-shaped change stream onto a
  * base snapshot: the log carries `(key, sequence, op, payload)` rows
  * with op ∈ {I, U, D}; per key the HIGHEST-sequence entry wins
  * (sequence order, never op precedence — a delete followed by a
  * later re-insert must resurrect the row), winners with op I/U
  * upsert their payload, winners with op D remove the key.
  *
  * The [[Scd]] complement on the write side: SCD2 keeps history, CDC
  * apply materializes "latest state" from an ordered change feed.
  * Compose with [[graft.catalog.Catalog.merge]]'s swap or
  * [[graft.catalog.Versioned]] commits for durability.
  *
  * Scale shape: the log collapses with ONE aggregation —
  * `max(struct(seq, op, payload))` per key, which partial-aggregates
  * map-side (struct ordering consults seq first; seq is unique per
  * key, enforced) — never a window over the log. The collapsed frame
  * is delta-sized; it applies as a null-safe anti join (drop
  * overwritten/deleted base rows) plus a union of the surviving
  * winners. `broadcastLog` (default) broadcasts the collapsed delta
  * into the anti join so the base never shuffles — the SCD2
  * precedent; set false for a base-sized backfill log.
  */
object Cdc {

  /** Apply `log` to `base`. `log` must carry exactly
    * `keyCols ++ (seqCol, opCol) ++ base's payload columns`; op values
    * are I/U/D (case-insensitive). `(key, seq)` must be unique —
    * an ambiguous feed is rejected, not silently resolved
    * (`checkUnique = false` skips the scan for pre-validated feeds). */
  def apply(base: DataFrame, log: DataFrame, keyCols: Seq[String],
            seqCol: String = "seq", opCol: String = "op",
            broadcastLog: Boolean = true,
            checkUnique: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "cdc needs at least one key column")
    val payload = base.columns.toSeq.filterNot(keyCols.contains)
    require(log.columns.sorted.sameElements(
      (keyCols ++ Seq(seqCol, opCol) ++ payload).sorted),
      s"cdc: log must carry exactly key + ($seqCol, $opCol) + payload " +
        s"(${(keyCols ++ Seq(seqCol, opCol) ++ payload).mkString(",")}); " +
        s"got ${log.columns.mkString(",")}")
    if (checkUnique) validateLog(log, keyCols, seqCol, opCol)
    val winner = collapse(log, keyCols, seqCol, opCol, payload)
      .select(keyCols.map(col) ++ Seq(
        col("__w.__op").as("__op"),
        col("__w.__p").as("__p")): _*)
    val keysOnly = winner.select(keyCols.map(col): _*)
    // every keyed log entry displaces the base row (upsert or delete):
    // base minus touched keys, plus the I/U winners' payloads. The
    // anti join is NULL-SAFE (<=>): a NULL-key log entry must displace
    // the NULL-key base row, not leave it behind (delete) or duplicate
    // it (upsert) — plain equality never matches NULL
    val antiRight = if (broadcastLog) broadcast(keysOnly) else keysOnly
    val antiCond = keyCols.map(k => base(k) <=> antiRight(k)).reduce(_ && _)
    val untouched = base.join(antiRight, antiCond, "left_anti")
    val applied = winner.where(col("__op") =!= "D")
      .select(keyCols.map(col) ++
        payload.map(p => col(s"__p.$p").as(p)): _*)
    untouched.select(base.columns.map(col): _*)
      .unionAll(applied.select(base.columns.map(col): _*))
  }

  /** All feed validation in ONE aggregation pass (a backfill log is
    * base-sized — don't scan it twice): duplicates detected by
    * count-vs-distinct on (key, seq); an unordered or mis-tagged feed
    * fails loud, never resolves arbitrarily (NULL op counts as
    * invalid — when/otherwise routes NULL through otherwise). */
  private def validateLog(log: DataFrame, keyCols: Seq[String],
                          seqCol: String, opCol: String): Unit = {
    val chk = log.agg(
      count(lit(1)).as("n"),
      count_distinct(struct((keyCols :+ seqCol).map(col): _*)).as("nd"),
      sum(when(col(seqCol).isNull, 1L).otherwise(0L)).as("n0"),
      sum(when(upper(col(opCol)).isin("I", "U", "D"), 0L)
        .otherwise(1L)).as("n1")).head
    require(chk.isNullAt(2) || chk.getLong(2) == 0L,
      "cdc: NULL sequence values in log")
    require(chk.isNullAt(3) || chk.getLong(3) == 0L,
      s"cdc: $opCol values outside I/U/D in log")
    require(chk.getLong(0) == chk.getLong(1),
      s"cdc: log has more than one row per (${keyCols.mkString(",")}, $seqCol)")
  }

  /** Per-key winner in ONE partial-aggregating pass: struct ordering
    * consults seq first and (key, seq) is unique, so op/payload are
    * tie-breakers that never fire. Output: keys + `__w(__seq, __op,
    * __p)`. */
  private def collapse(log: DataFrame, keyCols: Seq[String], seqCol: String,
                       opCol: String, payload: Seq[String]): DataFrame =
    log.groupBy(keyCols.map(col): _*)
      .agg(max(struct(
        col(seqCol).as("__seq"),
        upper(col(opCol)).as("__op"),
        struct(payload.map(col): _*).as("__p"))).as("__w"))

  /** Incremental, REORDER-TOLERANT apply — the production shape for
    * applying a CDC feed in micro-batches, where batch boundaries
    * need not respect per-key sequence order (a partitioned feed
    * never guarantees it): the materialized STATE carries each key's
    * last-applied sequence plus a tombstone flag, and an incoming
    * winner is applied only when its sequence is HIGHER. Deletes
    * leave a tombstone (key, seq, deleted = true) instead of removing
    * the row — without it, a delete arriving before the insert it
    * supersedes would be forgotten and the stale insert would
    * resurrect the key (the Kafka-compaction semantics; compact
    * tombstones out only once the feed's reordering horizon passed).
    *
    * Convergence law (spec-pinned): applying any partition of a log
    * in any batch order yields the same state as one [[apply]] of the
    * whole log, so `snapshot(applyOrdered*(initState(base), batches))
    * == apply(base, log)`.
    *
    * Scale shape: same as [[apply]] — one log collapse, then a
    * null-safe full-outer key join of delta-sized `winner` against
    * the state (state side never shuffles more than the join needs). */
  def applyOrdered(state: DataFrame, log: DataFrame, keyCols: Seq[String],
                   seqCol: String = "seq", opCol: String = "op",
                   checkUnique: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "cdc needs at least one key column")
    val meta = Seq(seqCol, "__deleted")
    meta.foreach(m => require(state.columns.contains(m),
      s"cdc applyOrdered: state has no $m column — build it with initState"))
    val payload = state.columns.toSeq
      .filterNot(c => keyCols.contains(c) || meta.contains(c))
    require(log.columns.sorted.sameElements(
      (keyCols ++ Seq(seqCol, opCol) ++ payload).sorted),
      s"cdc: log must carry exactly key + ($seqCol, $opCol) + payload; " +
        s"got ${log.columns.mkString(",")}")
    if (checkUnique) validateLog(log, keyCols, seqCol, opCol)
    val winner = collapse(log, keyCols, seqCol, opCol, payload)
    def keyed(df: DataFrame, tag: String) = df.select(
      struct(keyCols.map(col): _*).as(s"__k$tag"),
      struct(df.columns.map(col): _*).as(s"__r$tag"))
    val st = keyed(state, "s")
    val wn = keyed(winner, "w")
    val joined = st.join(wn, st("__ks") <=> wn("__kw"), "full_outer")
    // the winner applies only when strictly newer than the state row
    val applies = col("__kw").isNotNull && (col("__ks").isNull ||
      col("__rw.__w.__seq") > col(s"__rs.$seqCol"))
    val side = coalesce(col("__kw"), col("__ks"))
    joined.select(
      keyCols.map(k => side.getField(k).as(k)) ++
        payload.map(p => when(applies,
            when(col("__rw.__w.__op") =!= "D", col(s"__rw.__w.__p.$p")))
          .otherwise(col(s"__rs.$p")).as(p)) ++
        Seq(
          when(applies, col("__rw.__w.__seq"))
            .otherwise(col(s"__rs.$seqCol")).as(seqCol),
          when(applies, col("__rw.__w.__op") === "D")
            .otherwise(col("__rs.__deleted")).as("__deleted")): _*)
  }

  /** Wrap a plain snapshot as [[applyOrdered]] state: every row at
    * `seqValue`, no tombstones. */
  def initState(snapshot: DataFrame, seqValue: Long = 0L,
                seqCol: String = "seq"): DataFrame =
    snapshot.withColumn(seqCol, lit(seqValue))
      .withColumn("__deleted", lit(false))

  /** The user-facing view of [[applyOrdered]] state: live rows only,
    * bookkeeping dropped. */
  def snapshot(state: DataFrame, seqCol: String = "seq"): DataFrame =
    state.where(!col("__deleted")).drop(seqCol, "__deleted")

  /** The inverse: derive the change log that turns `from` into `to` —
    * backfill/repair generation, table-sync auditing, CDC bootstrap.
    * Emits `(key, seq = seqValue, op, payload)` rows: keys only in
    * `to` → I, keys only in `from` → D (payload NULLed), keys in both
    * whose payload differs null-safely → U; unchanged keys are
    * ABSENT (a diff of identical snapshots is empty). Round-trip law
    * (spec-pinned): `apply(from, diff(from, to)) == to`.
    *
    * Scale shape: ONE null-safe full-outer key join (both sides
    * key-shuffled once), change detection map-side in the join
    * output; output is delta-sized. Both snapshots must be key-unique
    * — the apply() side would reject an ambiguous feed anyway, so the
    * diff fails loud at the source (`checkUnique = false` to skip). */
  def diff(from: DataFrame, to: DataFrame, keyCols: Seq[String],
           seqValue: Long = 1L, seqCol: String = "seq",
           opCol: String = "op",
           checkUnique: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "cdc diff needs at least one key column")
    require(from.columns.sorted.sameElements(to.columns.sorted),
      s"cdc diff: snapshots must share a schema; " +
        s"${from.columns.mkString(",")} vs ${to.columns.mkString(",")}")
    val payload = from.columns.toSeq.filterNot(keyCols.contains)
    if (checkUnique) {
      Seq(("from", from), ("to", to)).foreach { case (what, df) =>
        val c = df.agg(count(lit(1)).as("n"),
          count_distinct(struct(keyCols.map(col): _*)).as("nd")).head
        require(c.getLong(0) == c.getLong(1),
          s"cdc diff: $what snapshot has duplicate (${keyCols.mkString(",")}) keys")
      }
    }
    // null-safe key equality via struct-wrapped keys: a NULL key is a
    // key (the apply() side displaces it null-safely too)
    def keyed(df: DataFrame, tag: String) = df.select(
      struct(keyCols.map(col): _*).as(s"__k$tag"),
      struct(df.columns.map(col): _*).as(s"__r$tag"))
    val f = keyed(from, "f")
    val t = keyed(to, "t")
    val joined = f.join(t, f("__kf") <=> t("__kt"), "full_outer")
    val changed = payload.map(p =>
      !(col(s"__rf.$p") <=> col(s"__rt.$p"))).reduceOption(_ || _)
      .getOrElse(lit(false))
    val op = when(col("__kf").isNull, "I")
      .when(col("__kt").isNull, "D")
      .when(changed, "U")
    // keys live in whichever side is present; payload comes from `to`
    // for I/U and is NULLed for D (a delete carries no payload)
    val side = coalesce(col("__kt"), col("__kf"))
    joined.where(op.isNotNull)
      .select(keyCols.map(k => side.getField(k).as(k)) ++
        Seq(lit(seqValue).as(seqCol), op.as(opCol)) ++
        payload.map(p => when(op =!= "D", col(s"__rt.$p")).as(p)): _*)
  }
}
