package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-value entity store semantics (SURVEY.md §2.1 S12; ≙
  * `gcp-python-libs/datastore.py`): kinds (tables) of keyed entities
  * with upsert, delete, and filtered query — modeled as a keyed
  * parquet-backed DataFrame with MERGE-style overwrite-by-key.
  *
  * Scale note: upsert = updates ∪ (existing ⟕̸ updates) — one
  * left-anti join keyed on the entity key; broadcast the updates side
  * when it is a small delta (the common case).
  */
object KeyValue {

  /** Upsert: rows in `updates` replace same-key rows in `existing`
    * (≙ `datastore.py:15-24` put-by-key). */
  def upsert(existing: DataFrame, updates: DataFrame, keyCol: String): DataFrame = {
    val kept = existing.join(broadcast(updates.select(col(keyCol))),
      Seq(keyCol), "left_anti")
    kept.unionByName(updates)
  }

  /** Insert entities WITHOUT caller-provided keys (≙ `datastore.py:
    * 19-22` auto-ID entity creation: the store allocates the key).
    * Allocated keys hash (per-call nonce, content, partition-unique
    * row id): without the nonce, identical content inserted in two
    * separate calls at the same row position would collide with
    * probability 1; with it, cross-call collisions are the hash's
    * ~2^-64 — numeric, unique-in-expectation, NOT sequential, the
    * same contract as Datastore's allocated ids. */
  def insertAutoKey(existing: DataFrame, inserts: DataFrame,
                    keyCol: String): DataFrame = {
    val nonce = java.util.UUID.randomUUID().toString
    val keyed = inserts.withColumn(keyCol,
      xxhash64(lit(nonce), to_json(struct(col("*"))), monotonically_increasing_id()))
    existing.unionByName(keyed.select(existing.columns.map(col).toSeq: _*))
  }

  /** Delete by key (≙ `datastore.py:26-28`). */
  def delete(existing: DataFrame, keys: DataFrame, keyCol: String): DataFrame =
    existing.join(broadcast(keys.select(col(keyCol))), Seq(keyCol), "left_anti")

  /** Property-filter query (≙ `datastore.py:10-13`
    * `query.add_filter(field, "=", value)`). */
  def queryByProperty(kind: DataFrame, field: String, value: Any): DataFrame =
    kind.where(col(field) === lit(value))

  /** Persist a kind (parquet round-trip stands in for the store). */
  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
