package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A Kafka-SHAPED message bus over a shared filesystem: topics split
  * into hash-keyed partitions, each partition an append-only segment
  * log with dense sequential offsets, consumers organized into groups
  * that commit a next-offset watermark per partition. This is the
  * production contract of the reference's Pub/Sub flow
  * (`transfer_sercom_files.py:115-123`) re-expressed in the commit-log
  * model (Kreps et al., "Kafka: a Distributed Messaging System for
  * Log Processing", NetDB'11) — same-key ordering, at-least-once
  * delivery, replayable history — with the broker replaced by the
  * filesystem the cluster already shares. [[Messages]]' directory
  * topic remains the zero-setup fallback; swapping in a real broker
  * changes only this object, not the [[Messages.TransferRequest]]
  * contract on either side.
  *
  * Scale shape: this is a CONTROL-PLANE bus (file-transfer commands,
  * audit events — thousands of messages), not a data-plane path. The
  * produce fan-in is one writer task per log partition (enforced by
  * the same hash partitioning Kafka uses), each append a
  * lock-serialized temp-write + atomic rename, so no reader ever
  * observes a half-written segment. Readers are ordinary distributed
  * scans of the segment files — the log IS a table, which is the
  * commit-log model's whole point.
  *
  * On-disk layout:
  * {{{
  *   <root>/<topic>/_meta.json                  {"partitions": N}
  *   <root>/<topic>/part-<i>/segment-<start20d>-<count>.jsonl
  *   <root>/<topic>/_groups/<group>/part-<i>    next offset (text)
  * }}}
  */
object KafkaLog {

  /** One log record. `value` carries the payload (for
    * [[Messages.TransferRequest]] flows: base64(JSON), unchanged from
    * the directory topic); `key` drives partition assignment and
    * same-key ordering. */
  val recordSchema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  private def topicDir(root: String, topic: String): Path =
    Paths.get(root, topic)
  private def partDir(root: String, topic: String, p: Int): Path =
    topicDir(root, topic).resolve(s"part-$p")
  private def groupDir(root: String, topic: String, group: String): Path =
    topicDir(root, topic).resolve("_groups").resolve(group)

  def createTopic(root: String, topic: String, partitions: Int): Unit = {
    require(partitions > 0, "a topic needs at least one partition")
    val dir = topicDir(root, topic)
    Files.createDirectories(dir)
    (0 until partitions).foreach(p => Files.createDirectories(partDir(root, topic, p)))
    val meta = dir.resolve("_meta.json")
    if (!Files.exists(meta))
      Files.write(meta, s"""{"partitions": $partitions}""".getBytes(StandardCharsets.UTF_8))
  }

  def partitionCount(root: String, topic: String): Int = {
    val meta = topicDir(root, topic).resolve("_meta.json")
    require(Files.exists(meta), s"topic $topic does not exist under $root")
    val s = new String(Files.readAllBytes(meta), StandardCharsets.UTF_8)
    """"partitions"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"bad topic meta: $s"))
  }

  // ---- producer ----------------------------------------------------

  private val segmentName = """segment-(\d{20})-(\d+)\.jsonl""".r

  /** Next offset to assign = max(start + count) over existing
    * segments. Call only under the partition lock. */
  private def endOffset(dir: Path): Long = {
    val names = dir.toFile.list()
    if (names == null) 0L
    else names.foldLeft(0L) { (acc, n) =>
      n match {
        case segmentName(start, count) => math.max(acc, start.toLong + count.toLong)
        case _ => acc
      }
    }
  }

  /** Serialize appends to one partition across tasks AND processes:
    * `Files.createDirectory` is an atomic claim on every sane
    * filesystem. A holder that died is taken over after `staleMs`
    * (its temp file never got renamed in, so nothing torn is ever
    * visible).
    *
    * Liveness vs safety of the takeover:
    *  - the HOLDER heartbeats the lock dir's mtime every staleMs/4
    *    from a daemon thread, so a legitimate append that outlives
    *    staleMs (slow shared filesystem) never looks stale;
    *  - a WAITER that still sees a stale lock claims the right to
    *    remove it by atomically RENAMING the lock dir to a tombstone
    *    unique to the waiter — only one waiter's rename can succeed,
    *    so two waiters can never both "delete and re-create" (the
    *    check-then-delete TOCTOU);
    *  - the takeover is OWNERSHIP-CHECKED: each holder writes a
    *    unique token file inside its lock dir, the waiter records the
    *    token it judged stale, and after the rename verifies the
    *    tombstone still carries that token — if a fresh holder
    *    slipped in between the age check and the rename, the waiter
    *    puts the live lock straight back. */
  private def deleteLockDir(l: Path): Unit = {
    try Files.deleteIfExists(l.resolve("token")) catch { case _: java.io.IOException => () }
    try Files.deleteIfExists(l) catch { case _: java.io.IOException => () }
  }

  private def tokenOf(l: Path): String =
    try new String(Files.readAllBytes(l.resolve("token")), StandardCharsets.UTF_8)
    catch { case _: java.io.IOException => "" }

  private[pipeline] def withPartitionLock[T](dir: Path, staleMs: Long = 60000L)(body: => T): T = {
    val lock = dir.resolve("_lock")
    val myToken = java.util.UUID.randomUUID().toString
    var held = false
    var beat: Thread = null
    try {
      while (!held) {
        try {
          Files.createDirectory(lock)
          Files.write(lock.resolve("token"), myToken.getBytes(StandardCharsets.UTF_8))
          held = true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            val age = try System.currentTimeMillis() -
              Files.getLastModifiedTime(lock).toMillis
            catch { case _: java.io.IOException => 0L } // vanished: retry
            if (age > staleMs) {
              val staleToken = tokenOf(lock)
              val tomb = dir.resolve(s"_lock.stale.$myToken")
              try {
                Files.move(lock, tomb, StandardCopyOption.ATOMIC_MOVE)
                if (tokenOf(tomb) == staleToken) deleteLockDir(tomb)
                else {
                  // the age check raced a fresh acquisition: restore it
                  try Files.move(tomb, lock, StandardCopyOption.ATOMIC_MOVE)
                  catch { case _: java.io.IOException => deleteLockDir(tomb) }
                }
              } catch { case _: java.io.IOException => () } // lost the rename race: retry
            }
            else Thread.sleep(10L)
        }
      }
      beat = new Thread(() => {
        val period = math.max(250L, staleMs / 4)
        try while (!Thread.interrupted()) {
          Thread.sleep(period)
          try Files.setLastModifiedTime(lock,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch { case _: java.io.IOException => () }
        } catch { case _: InterruptedException => () }
      }, s"kafkalog-lock-heartbeat-${dir.getFileName}")
      beat.setDaemon(true)
      beat.start()
      body
    } finally {
      if (beat != null) beat.interrupt()
      // release only what we still own — if the lock was (wrongly)
      // taken over despite the heartbeat, don't destroy the new
      // holder's claim
      if (held && tokenOf(lock) == myToken) deleteLockDir(lock)
    }
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Hard per-partition bound on one produce call. The bus is a
    * CONTROL-PLANE channel (commands, audit events); buffering a
    * partition's rows for the locked single-segment append is only
    * safe under that contract, so the contract is enforced, not just
    * documented — a data-plane frame pointed here fails fast instead
    * of allocating a driver-sized buffer on an executor. */
  val MaxProduceRowsPerPartition: Int = 1 << 20

  /** Append (key, value) rows to the topic. Partition assignment is
    * `pmod(hash(key), n)` — the SAME hash Spark's `repartition(n, key)`
    * uses, so after that exchange each task holds exactly the rows of
    * its own log partition and appends them as ONE segment: same-key
    * ordering within a produce call for free, one writer per
    * partition, offsets dense by construction. Fails (entire job) when
    * any partition exceeds [[MaxProduceRowsPerPartition]] rows. */
  def produce(df: DataFrame, root: String, topic: String,
              key: Column, value: Column,
              maxRowsPerPartition: Int = MaxProduceRowsPerPartition): Unit = {
    val n = partitionCount(root, topic)
    val rooted = root // avoid capturing `this`
    df.select(key.cast(StringType).as("key"), value.cast(StringType).as("value"))
      .repartition(n, col("key"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val p = TaskContext.getPartitionId()
        val dir = partDir(rooted, topic, p)
        // buffer the partition's rows: control-plane volume (the
        // data plane never rides a message bus) — enforced by taking
        // at most bound+1 rows before materializing
        val rows = it.take(maxRowsPerPartition + 1).toArray
        if (rows.length > maxRowsPerPartition)
          throw new IllegalArgumentException(
            s"KafkaLog.produce: log partition $p received more than " +
              s"$maxRowsPerPartition rows in one produce call — " +
              "this bus is a control-plane channel; route data-plane " +
              "volume through a table write")
        if (rows.nonEmpty) {
          Files.createDirectories(dir)
          withPartitionLock(dir) {
            val start = endOffset(dir)
            val ts = System.currentTimeMillis()
            val tmp = Files.createTempFile(dir, ".segment.", ".part")
            val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
            try {
              var off = start
              rows.foreach { r =>
                val k = if (r.isNullAt(0)) "null" else "\"" + jsonEscape(r.getString(0)) + "\""
                val v = if (r.isNullAt(1)) "null" else "\"" + jsonEscape(r.getString(1)) + "\""
                out.write(s"""{"partition": $p, "offset": $off, "ts": $ts, "key": $k, "value": $v}""")
                out.write("\n")
                off += 1
              }
            } finally out.close()
            val name = f"segment-$start%020d-${rows.length}%d.jsonl"
            Files.move(tmp, dir.resolve(name),
              StandardCopyOption.ATOMIC_MOVE)
            ()
          }
        }
      }
  }

  // ---- consumers ---------------------------------------------------

  private def segmentFiles(root: String, topic: String): Seq[String] = {
    val n = partitionCount(root, topic)
    (0 until n).flatMap { p =>
      val d = partDir(root, topic, p)
      val names = d.toFile.list()
      if (names == null) Nil
      else names.collect { case nm @ segmentName(_, _) => d.resolve(nm).toString }
    }
  }

  /** The full log as a DataFrame (earliest → latest), no group state:
    * Kafka's `seekToBeginning` replay. The log is a plain distributed
    * scan — at scale each segment file is its own split. */
  def readEarliest(spark: SparkSession, root: String, topic: String): DataFrame = {
    val files = segmentFiles(root, topic)
    if (files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], recordSchema)
    else spark.read.schema(recordSchema).json(files: _*)
  }

  /** Committed next-offset per partition for a group (absent ⇒ 0). */
  def committed(root: String, topic: String, group: String): Map[Int, Long] = {
    val n = partitionCount(root, topic)
    (0 until n).flatMap { p =>
      val f = groupDir(root, topic, group).resolve(s"part-$p")
      if (Files.exists(f))
        Some(p -> new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong)
      else None
    }.toMap
  }

  /** Records at-or-after the group's committed watermark: everything
    * not yet committed is (re)delivered — at-least-once, exactly the
    * contract of the reference's Pub/Sub pull. */
  def poll(spark: SparkSession, root: String, topic: String, group: String): DataFrame = {
    val all = readEarliest(spark, root, topic)
    val cm = committed(root, topic, group)
    if (cm.isEmpty) all
    else {
      // tiny (one row per partition) — broadcast join against the log
      val cmDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          cm.toSeq.map { case (p, o) => org.apache.spark.sql.Row(p, o) }),
        StructType(Seq(StructField("partition", IntegerType, nullable = false),
          StructField("committed", LongType, nullable = false))))
      all.join(broadcast(cmDf), Seq("partition"), "left")
        .where(col("committed").isNull || col("offset") >= col("committed"))
        .drop("committed")
    }
  }

  /** Advance the group's watermark: `offsets` maps partition → NEXT
    * offset to read (Kafka's commit convention). Monotonic: a commit
    * below the current watermark is ignored. Swap-written, so a crash
    * mid-commit leaves the old watermark (⇒ redelivery, never loss). */
  def commit(root: String, topic: String, group: String,
             offsets: Map[Int, Long]): Unit = {
    val dir = groupDir(root, topic, group)
    Files.createDirectories(dir)
    val current = committed(root, topic, group)
    offsets.foreach { case (p, next) =>
      if (next > current.getOrElse(p, 0L)) {
        val tmp = Files.createTempFile(dir, s".part-$p.", ".tmp")
        Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, dir.resolve(s"part-$p"),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  /** Commit everything `records` contains (per-partition max offset
    * + 1): the "I processed this poll" call. */
  def commitPolled(root: String, topic: String, group: String,
                   records: DataFrame): Unit = {
    val tops = records.groupBy("partition").agg(max("offset").as("m"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1L)).toMap
    if (tops.nonEmpty) commit(root, topic, group, tops)
  }

  /** The topic as a Structured Streaming source: the file stream
    * tracks segment files exactly once, so new produce() appends
    * surface as new micro-batch input — Kafka's subscribe model with
    * the checkpoint playing the consumer group. */
  def readStream(spark: SparkSession, root: String, topic: String): DataFrame =
    spark.readStream.schema(recordSchema)
      .json(topicDir(root, topic).toString + "/part-*/segment-*.jsonl")
}
