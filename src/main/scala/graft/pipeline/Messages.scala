package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The EP2 file-transfer command contract (SURVEY.md §3.2; ≙
  * `transfer_sercom_files.py:102-123`): JSON messages carrying
  * source/destination connection strings, a remove flag, and an event
  * date, base64-encoded onto a topic. The "topic" here is a JSON-lines
  * directory; a Structured Streaming subscriber replays it.
  */
object Messages {

  /** ≙ the message dict built at `transfer_sercom_files.py:106-113`. */
  case class TransferRequest(
      source_connection_string: String,
      destination_connection_string: String,
      remove_file: Boolean,
      event_date: String)

  /** Encode requests as base64(JSON) payload column (≙ `b64encode(
    * json.dumps(m))`, `transfer_sercom_files.py:120`). */
  def encode(ds: Dataset[TransferRequest]): DataFrame =
    ds.select(base64(to_json(struct(col("*")))).as("payload"))

  /** Decode payloads back into the typed contract. */
  def decode(spark: SparkSession, payloads: DataFrame): Dataset[TransferRequest] = {
    import spark.implicits._
    payloads
      .select(from_json(unbase64(col("payload")).cast("string"),
        implicitly[org.apache.spark.sql.Encoder[TransferRequest]].schema).as("m"))
      .select("m.*")
      .as[TransferRequest]
  }

  /** Publish to a topic directory as JSON lines (S10 message sink).
    * Every message carries a unique id so subscriptions can track
    * delivery state. The id is a per-publish nonce plus the
    * partition-unique row id: a content hash alone would collide when
    * the same payload is re-published in a later batch at the same row
    * position, and the collision would make pull() drop the second
    * copy once the first is acked — silent loss under the documented
    * at-least-once contract. */
  def publish(ds: Dataset[TransferRequest], topicDir: String): Unit = {
    val nonce = java.util.UUID.randomUUID().toString
    encode(ds)
      .withColumn("msg_id",
        concat_ws("-", lit(nonce), monotonically_increasing_id()))
      .write.mode("append").json(topicDir)
  }

  /** Batch-replay a topic directory (firehose read, no delivery
    * state). */
  def subscribe(spark: SparkSession, topicDir: String): Dataset[TransferRequest] =
    decode(spark, spark.read.json(topicDir))

  // ---- at-least-once subscription semantics (≙ Pub/Sub pull+ack,
  // transfer_sercom_files.py:115-123): a subscription is its own ack
  // ledger next to the topic; pull returns every message without an
  // ack record (so an un-acked message is redelivered on the next
  // pull), ack appends to the ledger. At-least-once by construction:
  // a crash after processing but before ack yields redelivery, never
  // loss. The ledger is an append-only JSON dir — idempotent acks,
  // no compaction needed at this payload scale.

  private def ackDir(topicDir: String, subscription: String): String =
    s"$topicDir/_subscriptions/$subscription/acks"

  /** Pull messages not yet acked by this subscription: (msg_id,
    * payload) pairs, each decodable via [[decode]]. */
  def pull(spark: SparkSession, topicDir: String, subscription: String): DataFrame = {
    val all = spark.read.json(topicDir)
    val acked = ackedIds(spark, topicDir, subscription)
    all.join(acked, Seq("msg_id"), "left_anti")
  }

  /** Acknowledge delivered messages — they will not be pulled again.
    * Re-acking is harmless (the ledger is a set). */
  def ack(msgs: DataFrame, topicDir: String, subscription: String): Unit =
    msgs.select(col("msg_id"))
      .write.mode("append").json(ackDir(topicDir, subscription))

  // ---- Kafka-shaped transport (production shape): same
  // TransferRequest contract, same base64(JSON) payload, but carried
  // over [[KafkaLog]]'s partitioned commit log — keyed by event_date
  // so all of one day's transfer commands stay ordered on one
  // partition, which is what a day-partitioned downstream wants.

  /** Publish requests onto a [[KafkaLog]] topic (must exist — create
    * with `KafkaLog.createTopic`). */
  def producePartitioned(ds: Dataset[TransferRequest], root: String,
                         topic: String): Unit =
    KafkaLog.produce(
      ds.select(col("event_date").as("key"),
        base64(to_json(struct(col("*")))).as("value")),
      root, topic, col("key"), col("value"))

  /** Consume this group's undelivered requests; pair with
    * `KafkaLog.commitPolled` after processing for at-least-once. The
    * log record columns (partition, offset, ts, key) ride alongside
    * the decoded contract for offset management. */
  def consumePartitioned(spark: SparkSession, root: String, topic: String,
                         group: String): DataFrame = {
    val recs = KafkaLog.poll(spark, root, topic, group)
    recs.select(col("partition"), col("offset"), col("ts"), col("key"),
      from_json(unbase64(col("value")).cast("string"),
        org.apache.spark.sql.Encoders.product[TransferRequest].schema).as("m"))
      .select(col("partition"), col("offset"), col("ts"), col("key"), col("m.*"))
  }

  private def ackedIds(spark: SparkSession, topicDir: String,
                       subscription: String): DataFrame = {
    val dir = ackDir(topicDir, subscription)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.json(dir).select("msg_id").distinct()
    else {
      import spark.implicits._
      Seq.empty[String].toDF("msg_id")
    }
  }
}
