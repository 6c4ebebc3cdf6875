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

  /** Publish to a topic directory as JSON lines (S10 message sink). */
  def publish(ds: Dataset[TransferRequest], topicDir: String): Unit =
    encode(ds).write.mode("append").json(topicDir)

  /** Batch-replay a topic directory. */
  def subscribe(spark: SparkSession, topicDir: String): Dataset[TransferRequest] =
    decode(spark, spark.read.json(topicDir))
}
