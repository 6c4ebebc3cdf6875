package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data prep (SURVEY.md north-star
  * extension): assign documents to fixed-token-budget training
  * sequences by their starting offset in a deterministic document
  * order — the contiguous-packing scheme (greedy first-fit needs a
  * sequential scan; contiguous packing is a window cumsum, exact,
  * order-stable, and parallel).
  *
  * Scale design: [[contiguousSharded]] is the 100 TB form — each
  * logical group (split) is cut into `nShards` deterministic hash
  * shards of the order key, the window partitions by (group, shard),
  * and every shard packs its own sequences into a disjoint seq_id
  * range (`local_seq * nShards + shard`). Sequences never span
  * shards, no task ever sorts more than 1/nShards of a group, and
  * the assignment is a pure function of (salt, key) — reproducible
  * across runs, engines, and partitionings (the same md5-hex-bucket
  * construction as [[Splits]], so a SQL oracle can replay it
  * byte-identically). [[contiguous]] (single window per group) is
  * kept for small-group use; with few large groups it concentrates a
  * group's sort on one task.
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

  /** Deterministic shard of the order key: which of `nShards` equal
    * md5-hex ranges the key falls into (0-based). Same cut-point
    * machinery as [[Splits]] so the Column and SQL forms agree. */
  private[graft] def shardCol(key: Column, nShards: Int, salt: String): Column = {
    val cuts = Splits.cutPoints(Seq.fill(nShards)(1.0))
    val h = HexBucket.prefix(key, salt, 4)
    cuts.zipWithIndex.foldRight(lit(nShards - 1): Column) {
      case ((cut, i), rest) => when(h < lit(cut), lit(i)).otherwise(rest)
    }
  }

  /** SQL replay of [[shardCol]] (DuckDB/ANSI) — the auditable
    * cross-engine form; MUST stay semantically identical. */
  def shardSql(keyExpr: String, nShards: Int, salt: String): String = {
    val cuts = Splits.cutPoints(Seq.fill(nShards)(1.0))
    val h = HexBucket.prefixSql(keyExpr, salt, 4)
    val whens = cuts.zipWithIndex
      .map { case (cut, i) => s"WHEN $h < '$cut' THEN $i" }
      .mkString(" ")
    s"CASE $whens ELSE ${nShards - 1} END"
  }

  /** Shard-parallel contiguous packing: packs per (`groupCol`,
    * hash-shard of `orderCol`), emitting `seq_id` values that are
    * disjoint across shards (`local_seq * nShards + shard`). This is
    * the form that scales: a group holding 80% of the corpus sorts on
    * `nShards` tasks, not one. Within a shard the packing is the same
    * exact cumsum as [[contiguous]]; across shards sequences are
    * independent (they never span shards), so the only semantic
    * difference from the single-window form is the seq_id numbering.
    *
    * Same `orderCol`-uniqueness contract as [[contiguous]]. */
  def contiguousSharded(df: DataFrame, groupCol: String, orderCol: String,
                        tokCol: String, seqTokens: Long, nShards: Int,
                        salt: String = "pack"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    Seq("_shard", "_off").foreach { c =>
      require(!df.columns.contains(c), s"input already has a '$c' column")
    }
    val w = Window.partitionBy(col(groupCol), col("_shard"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_shard", shardCol(col(orderCol), nShards, salt))
      .withColumn("_off", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("seq_id",
        (floor(col("_off") / seqTokens) * nShards + col("_shard")).cast("long"))
      .drop("_off", "_shard")
  }
}
