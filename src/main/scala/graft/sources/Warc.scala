package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) ingest source — the container format
  * web crawls ship in (SURVEY.md §2.1 ingest layer; the reference's
  * HTTP-ingest stage `transfer_sercom_files.py:87-113` fetches files
  * one URL at a time — a crawl-scale pipeline ingests the same
  * payloads batched into WARC archives instead).
  *
  * Layout and scale model (the public Common Crawl convention):
  * a corpus is tens of thousands of ~1 GiB `.warc.gz` files, each a
  * CONCATENATION of per-record gzip members. Members are not
  * splittable without an external index, so the parallel unit is the
  * FILE: one task per file, records streamed off the open stream with
  * O(record) memory — the 100 TB shape is 64k files → 64k tasks, not
  * 64k whole-file byte arrays on executor heaps (which is what a
  * `binaryFile` scan would materialize). Payloads above
  * `maxPayloadBytes` are kept but cut at the cap and flagged
  * `truncated` (the crawl convention) rather than silently dropped.
  *
  * Untrusted-input contract (same as the [[graft.operators.Multimodal]]
  * container walkers): a malformed byte is DATA, not an exception — a
  * record that fails framing stops the walk of that file (everything
  * already parsed is kept) and never throws, because one crafted
  * archive must not kill a 64k-file job. WarcSpec fuzzes this with
  * random and truncated inputs.
  *
  * Records whose block is `application/http` are additionally split
  * into status line / headers / body inline during the same streamed
  * pass (`http_status`, `http_content_type`, `body`) — a second pass
  * over multi-MiB payload binaries would double the ingest IO.
  */
object Warc {

  /** Bounds on one record's header block — past these it is unframed
    * garbage and the walk stops (a crafted member must not OOM). */
  private val MaxHeaderBlockBytes = 1L << 20
  private val MaxHeaderCount = 256

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("rec_no", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", TimestampType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("truncated", BooleanType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true)))

  /** One parsed record. `body` is the HTTP message body when the
    * block is `application/http`, else the whole block. */
  final case class Rec(
      recNo: Long, warcType: String, targetUri: String,
      dateEpochMicros: Option[Long], recordId: String, contentType: String,
      contentLength: Long, truncated: Boolean,
      httpStatus: Option[Int], httpContentType: Option[String],
      body: Array[Byte])

  // ------------------------------------------------------------------
  // distributed reader
  // ------------------------------------------------------------------

  /** Scan a directory (or glob) of `.warc` / `.warc.gz` files.
    *
    * One task per file; each task streams records through the pull
    * parser. Works against any Hadoop filesystem — the driver's
    * Configuration is shipped as key/value pairs (the Configuration
    * object itself is not serializable) and rebuilt per partition.
    */
  /** Expand a dir/glob into the matching `.warc` family files, and
    * ship the driver Configuration as serializable key/value pairs —
    * shared by [[read]], [[buildIndex]], [[fetchAt]] so the three
    * paths can never silently diverge. */
  private def listWarcFiles(spark: SparkSession, path: String,
                            suffixes: Seq[String])
      : (Seq[String], Array[(String, String)]) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val files: Seq[String] = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter(_.isFile).map(_.getPath.toString)
      else Array(st.getPath.toString)
    }.filter(f => suffixes.exists(f.endsWith)).sorted.toSeq
    val confKv = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    (files, confKv)
  }

  private def microsToTimestamp(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  def read(spark: SparkSession, path: String,
           maxPayloadBytes: Int = 1 << 20): DataFrame = {
    val sc = spark.sparkContext
    val (files, confKv) = listWarcFiles(spark, path, Seq(".warc", ".warc.gz"))
    val cap = maxPayloadBytes

    val rdd = sc.parallelize(files, math.max(1, files.size))
      .mapPartitions { it =>
        val conf = new Configuration(false)
        confKv.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { file =>
          val fp = new Path(file)
          val in = fp.getFileSystem(conf).open(fp)
          // closing() fires only when the iterator drains; a limit()/
          // failure that abandons it mid-file must still release the
          // filesystem stream — at the 64k-file design point leaked
          // FSDataInputStreams exhaust connection pools and ulimits
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit] { _ =>
              try in.close() catch { case _: Exception => } })
          closing(in, records(maybeGunzip(new BufferedInputStream(in, 1 << 16)), cap))
            .map { r =>
              Row(file, r.recNo, r.warcType, r.targetUri,
                r.dateEpochMicros.map(microsToTimestamp).orNull,
                r.recordId, r.contentType, r.contentLength, r.truncated,
                r.httpStatus.map(Int.box).orNull,
                r.httpContentType.orNull, r.body)
            }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** The crawl-ingest projection: `response` records only, HTTP
    * fields exposed, payload decoded per the declared charset's
    * common case (UTF-8). */
  def readResponses(spark: SparkSession, path: String,
                    maxPayloadBytes: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, path, maxPayloadBytes)
      .where(col("warc_type") === "response")
      .select(col("file"), col("rec_no"), col("target_uri"),
        col("warc_date"), col("record_id"), col("http_status"),
        col("http_content_type"), col("truncated"), col("body"))
  }

  // ------------------------------------------------------------------
  // streaming pull parser (never throws on malformed input)
  // ------------------------------------------------------------------

  /** Stream records off `in`. Malformed framing ends the iterator;
    * records already parsed are yielded. The caller owns the stream. */
  def records(in: InputStream, maxPayloadBytes: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var recNo = 0L
      private var nextRec: Rec = _
      private var done = false
      private def advance(): Unit = {
        if (done || nextRec != null) return
        nextRec = try parseOne(in, recNo, maxPayloadBytes).orNull
        catch { case _: Exception => null } // malformed = stop, never throw
        if (nextRec == null) done = true else recNo += 1
      }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): Rec = {
        advance()
        if (done) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** Parse one record, or None at clean EOF / malformed framing. */
  private def parseOne(in: InputStream, recNo: Long,
                       cap: Int): Option[Rec] = {
    // skip inter-record CRLF padding, find the version line
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null || !line.startsWith("WARC/")) return None

    // Named headers; continuation lines (SP/HT) fold into the previous.
    // The whole block is bounded (total bytes + header count) and folds
    // append to a StringBuilder — a crafted member with millions of
    // header lines must degrade to "stop the walk", not OOM or go
    // quadratic on an executor (never-kill untrusted-input contract).
    val headers =
      scala.collection.mutable.LinkedHashMap.empty[String, StringBuilder]
    var lastKey: String = null
    var blockBytes = 0L
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      blockBytes += h.length + 2
      if (blockBytes > MaxHeaderBlockBytes || headers.size > MaxHeaderCount)
        return None // unframed garbage, not headers
      if ((h.charAt(0) == ' ' || h.charAt(0) == '\t') && lastKey != null) {
        headers(lastKey).append(' ').append(h.trim)
      } else {
        val colon = h.indexOf(':')
        if (colon <= 0) return None // malformed header line
        lastKey = h.substring(0, colon).trim.toLowerCase
        headers(lastKey) = new StringBuilder(h.substring(colon + 1).trim)
      }
      h = readLine(in)
    }
    if (h == null) return None // EOF inside the header block

    val hm: collection.Map[String, String] =
      headers.map { case (k, v) => (k, v.toString) }
    val len = hm.get("content-length").flatMap(v =>
      try Some(v.toLong) catch { case _: NumberFormatException => None })
      .getOrElse(-1L)
    if (len < 0) return None // Content-Length is mandatory (ISO 28500 §5.3)

    val keep = math.min(len, cap.toLong).toInt
    val block = new Array[Byte](keep)
    if (!readFully(in, block, keep)) return None // stream died mid-block
    var over = len - keep
    val truncated = over > 0
    while (over > 0) {
      val skipped = in.skip(over)
      if (skipped > 0) over -= skipped
      else if (in.read() >= 0) over -= 1
      else return Some(finish(recNo, hm, len, block, truncated = true))
    }
    Some(finish(recNo, hm, len, block, truncated))
  }

  private def finish(recNo: Long, headers: collection.Map[String, String],
                     len: Long, block: Array[Byte],
                     truncated: Boolean): Rec = {
    val ctype = headers.get("content-type").orNull
    val isHttp = ctype != null &&
      ctype.toLowerCase.startsWith("application/http")
    val (status, httpCt, body) =
      if (isHttp) splitHttp(block) else (None, None, block)
    Rec(
      recNo,
      warcType = headers.get("warc-type").orNull,
      targetUri = headers.get("warc-target-uri")
        .map(u => u.stripPrefix("<").stripSuffix(">")).orNull,
      dateEpochMicros = headers.get("warc-date").flatMap(parseDate),
      recordId = headers.get("warc-record-id").orNull,
      contentType = ctype, contentLength = len, truncated = truncated,
      httpStatus = status, httpContentType = httpCt, body = body)
  }

  /** WARC-Date is ISO 8601 UTC (`2023-11-14T22:13:20Z`); sub-second
    * digits allowed in 1.1. Malformed → None (data, not an error). */
  private[sources] def parseDate(s: String): Option[Long] =
    try {
      val inst = java.time.Instant.parse(s.trim)
      Some(Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
        inst.getNano / 1000L))
    } catch { case _: Exception => None }

  /** Split an `application/http` block into (status, content-type,
    * body). Requests have no status; a block with no header/body
    * separator is all headers and yields an empty body. */
  private[sources] def splitHttp(
      block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    val sep = findHeaderEnd(block)
    val headEnd = if (sep < 0) block.length else sep
    val head = new String(block, 0, headEnd, UTF_8)
    val body =
      if (sep < 0) Array.empty[Byte]
      else java.util.Arrays.copyOfRange(block, bodyStart(block, sep), block.length)
    val lines = head.split("\r?\n")
    val status =
      if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
        val parts = lines(0).split(" +")
        if (parts.length >= 2)
          try Some(parts(1).toInt) catch { case _: NumberFormatException => None }
        else None
      } else None
    val ct = lines.drop(1).collectFirst {
      case l if l.regionMatches(true, 0, "content-type:", 0, 13) =>
        l.substring(13).trim
    }
    (status, ct, body)
  }

  /** First `\r\n\r\n` or `\n\n` boundary (index of its first byte). */
  private def findHeaderEnd(b: Array[Byte]): Int = {
    var i = 0
    while (i < b.length - 1) {
      if (b(i) == '\n' &&
          (b(i + 1) == '\n' ||
           (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n')))
        return i - (if (i > 0 && b(i - 1) == '\r') 1 else 0)
      i += 1
    }
    -1
  }
  private def bodyStart(b: Array[Byte], sep: Int): Int = {
    var i = sep
    // skip exactly one blank line's worth of CR/LF after the headers
    var newlines = 0
    while (i < b.length && newlines < 2 &&
           (b(i) == '\r' || b(i) == '\n')) {
      if (b(i) == '\n') newlines += 1
      i += 1
    }
    i
  }

  /** Read a CRLF (or bare-LF) line as ISO-latin bytes → UTF-8 string;
    * null at EOF before any byte. Header lines are short; cap guards
    * a crafted no-newline stream from buffering unboundedly. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(80)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n' && buf.size < 65536) {
      buf.write(c)
      c = in.read()
    }
    if (c != '\n' && buf.size >= 65536) return null // unframed garbage
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    new String(bytes, 0, n, UTF_8)
  }

  private def readFully(in: InputStream, dst: Array[Byte], n: Int): Boolean = {
    var off = 0
    while (off < n) {
      val r = in.read(dst, off, n - off)
      if (r < 0) return false
      off += r
    }
    true
  }

  /** Gzip-sniff by magic bytes (1f 8b); JDK GZIPInputStream reads
    * concatenated members natively, which is exactly the per-record-
    * member `.warc.gz` layout.
    *
    * One JDK pitfall defended against: at a member boundary
    * GZIPInputStream only looks for the next member if the underlying
    * stream's `available() > 0` (or >26 bytes are already inflater-
    * buffered) — a remote-FS stream reporting 0 at exactly a boundary
    * would silently drop every remaining record. [[NonZeroAvailable]]
    * reports 1 until true EOF; at real EOF the next-header probe hits
    * EOFException, which readTrailer catches as clean end-of-stream. */
  private final class NonZeroAvailable(in: InputStream)
      extends java.io.FilterInputStream(in) {
    override def available(): Int = {
      val a = super.available(); if (a > 0) a else 1
    }
  }
  private[graft] def maybeGunzip(in: InputStream): InputStream = {
    val pb = new PushbackInputStream(new NonZeroAvailable(in), 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    if (b0 == 0x1f && b1 == 0x8b) {
      // magic can match on garbage; a header the constructor rejects is
      // malformed DATA → zero records, not an exception
      try new GZIPInputStream(pb, 1 << 16)
      catch { case _: Exception =>
        new ByteArrayInputStream(Array.emptyByteArray) }
    } else pb
  }

  // ------------------------------------------------------------------
  // CDX-style member index + ranged fetch (the selective-access path)
  // ------------------------------------------------------------------

  /** Index schema — one row per gzip member / WARC record. `offset` /
    * `length` delimit the COMPRESSED member inside the archive, so a
    * consumer can seek-read exactly one record. The metadata columns
    * are what crawl indexes (the public CDX(J) convention) carry:
    * enough to select records by URI / type / status / date without
    * touching the archives.
    *
    * Two zero-`length` bookkeeping row kinds share the schema (record
    * queries filter `rec_no >= 0`; [[fetchAt]] drops both):
    * `rec_no = -1` — [[updateIndex]]'s visited-but-empty sentinel;
    * `rec_no = -2` — a scan-coverage marker for an archive whose walk
    * stopped BEFORE physical EOF (`offset` = bytes covered,
    * `content_length` = file size at scan time), so partial scans are
    * durably distinguishable from complete ones. */
  val indexSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("rec_no", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", TimestampType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("content_length", LongType, nullable = false)))

  /** Build the member index for a directory/glob of `.warc.gz` files.
    *
    * This is how a 100 TB corpus is accessed selectively: ONE full
    * scan builds a columnar index (persist the result as parquet);
    * every later query filters the small index — predicate pushdown
    * and column pruning apply, the archives are never opened — and
    * [[fetchAt]] seek-reads only the matching members. Without this,
    * every "give me the 200-OK HTML of host X" query re-reads 100 TB.
    *
    * One task per file (members are only discoverable sequentially);
    * member boundaries are recovered exactly by walking each gzip
    * header by hand and inflating with a raw `Inflater`, whose
    * `getRemaining` tells how far the compressed data actually
    * reached — `GZIPInputStream` hides this. Malformed bytes stop the
    * file's walk (records already indexed are kept, never throws). */
  def buildIndex(spark: SparkSession, path: String): DataFrame = {
    val (files, confKv) = listWarcFiles(spark, path, Seq(".warc.gz"))
    indexFiles(spark, files, confKv)
  }

  private def indexFiles(spark: SparkSession, files: Seq[String],
                         confKv: Array[(String, String)]): DataFrame = {
    val sc = spark.sparkContext
    val rdd = sc.parallelize(files, math.max(1, files.size))
      .mapPartitions { it =>
        val conf = new Configuration(false)
        confKv.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { file =>
          val fp = new Path(file)
          val fsys = fp.getFileSystem(conf)
          val fileLen = try fsys.getFileStatus(fp).getLen
          catch { case _: Exception => -1L }
          val in = fsys.open(fp)
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit] { _ =>
              try in.close() catch { case _: Exception => } })
          var recNo = 0L
          var covered = 0L // bytes of the archive the walk got through
          // a member whose payload fails WARC framing STOPS this
          // file's walk (takeWhile), exactly like read() — the two
          // paths must agree record-for-record on dirty archives or
          // fetchAt ≡ full-scan silently breaks, and index rec_no
          // could no longer be correlated with scan rec_no
          val recRows = closing(in, gzipMembers(in)).map { case (off, clen, head) =>
            // parse just the record's headers + the block prefix (the
            // HTTP status line sits at block start); the body is not
            // index payload, so a small inner cap suffices
            val rec = try parseOne(new ByteArrayInputStream(head), recNo, 4096)
            catch { case _: Exception => None }
            rec.map { r =>
              covered = off + clen
              val n = recNo; recNo += 1
              Row(file, off, clen, n, r.warcType, r.targetUri,
                r.dateEpochMicros.map(microsToTimestamp).orNull,
                r.httpStatus.map(Int.box).orNull, r.contentLength)
            }
          }.takeWhile(_.isDefined).flatten
          // scan-completeness record: a walk that stopped BEFORE
          // physical EOF (malformed member — or a transient read
          // error, which the never-throw parser absorbs identically)
          // gets one `rec_no = -2` marker carrying how far it reached
          // (`offset`) and the file's size (`content_length`), so a
          // partial scan is never silently indistinguishable from a
          // complete one: updateIndex retries marked files once, and
          // the persisted marker lets any later maintenance pass find
          // archives whose tail was never indexed. When the file's
          // size is UNKNOWN (getFileStatus failed, fileLen = -1),
          // completeness cannot be judged at all — the marker is
          // emitted unconditionally with file_bytes = -1, putting the
          // file on the retry path rather than letting a stat failure
          // silently classify a possibly-truncated scan as complete.
          // Evaluated AFTER recRows drains (Iterator.++ is lazy), when
          // covered/recNo are final; empty scans (recNo == 0) stay on
          // the existing sentinel path instead.
          recRows ++ new Iterator[Row] {
            private var emitted = false
            override def hasNext: Boolean =
              !emitted && recNo > 0 && (fileLen < 0 || covered < fileLen)
            override def next(): Row = {
              emitted = true
              Row(file, covered, 0L, -2L, null, null, null, null, fileLen)
            }
          }
        }
      }
    spark.createDataFrame(rdd, indexSchema)
  }

  /** Incremental index maintenance — the daily-crawl-dump shape: new
    * archives arrive, already-indexed ones never change (WARC files
    * are immutable by convention). Indexes ONLY the files under
    * `path` that `existing` has no rows for and returns just the new
    * rows (caller appends them to the index table; with the versioned
    * catalog, as a new commit). The existing index is touched once
    * for its distinct file list — never re-scanned at archive level.
    *
    * A scanned archive that yields ZERO records gets one SENTINEL
    * row — `rec_no = -1`, zero offset/length, NULL metadata, and the
    * file's on-disk size at scan time in `content_length` — so the
    * next incremental run knows it was visited and never re-opens it
    * (without the sentinel, a corrupt archive would be re-downloaded
    * and re-gunzipped on every run forever). Because the streamed
    * parser absorbs transient I/O errors the same way it absorbs
    * malformed bytes, a scan that did NOT reach physical EOF — empty
    * (no rows) or partial (a `rec_no = -2` coverage marker, written
    * by [[indexFiles]] whenever the walk stopped short of the file's
    * size) — is RETRIED once, and the retry's result replaces the
    * first scan's when it covered MORE of the archive. A connection
    * reset mid-file must not permanently trust a half-built index
    * for that archive; genuinely corrupt files cost one cheap
    * re-scan (the walk stops at the bad member) and keep their
    * marker, an honest durable record of exactly how far the index
    * reaches. The recorded sizes let a caller detect a later rewrite
    * and drop the sentinel/marker to force re-indexing. [[fetchAt]]
    * drops sentinel and marker rows (zero length) and record queries
    * filter `rec_no >= 0`. */
  def updateIndex(spark: SparkSession, existing: DataFrame,
                  path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, max, sum, when, lit}
    val (files, confKv) = listWarcFiles(spark, path, Seq(".warc.gz"))
    // which of the freshly-listed files the index already covers is
    // decided by ANTI-JOIN, not by collecting the index's distinct
    // file set to the driver: driver state is bounded by the NEW
    // listing (which is driver-side anyway), not by every archive
    // ever indexed. Listing order is preserved for deterministic
    // task assignment.
    val freshSet =
      if (files.isEmpty) Set.empty[String]
      else spark.createDataset(files)(org.apache.spark.sql.Encoders.STRING)
        .toDF("file")
        .join(existing.select(col("file")).distinct(), Seq("file"), "left_anti")
        .collect().map(_.getString(0)).toSet
    val fresh = files.filter(freshSet)
    if (fresh.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], indexSchema)
    // pin the scan (the Ranks precedent): the completeness checks
    // below and the caller's consumption are separate jobs — without
    // this the archives would be gunzipped twice
    val rows = indexFiles(spark, fresh, confKv).localCheckpoint()
    // per-file (records, coverage): coverage is the -2 marker's offset
    // when present, else "complete" (Long.MaxValue) for a marker-less
    // scan with rows, else 0 for an empty scan. Bounded driver state,
    // one entry per fresh archive.
    def scanStats(df: DataFrame): Map[String, (Long, Long)] =
      df.groupBy(col("file"))
        .agg(sum(when(col("rec_no") >= 0, 1L).otherwise(0L)).as("nreal"),
          max(when(col("rec_no") === -2L, col("offset"))).as("partial"))
        .collect().map { r =>
          val nreal = r.getLong(1)
          val cov = if (!r.isNullAt(2)) r.getLong(2)
            else if (nreal > 0) Long.MaxValue else 0L
          r.getString(0) -> (nreal, cov)
        }.toMap
    val s1 = scanStats(rows)
    def covOf(s: Map[String, (Long, Long)], f: String): Long =
      s.get(f).map(_._2).getOrElse(0L)
    // retry anything that did not reach EOF: empty scans AND partial
    // ones — a transient read error looks exactly like corruption to
    // the never-throw parser, and must not earn a permanent sentinel
    // or a permanently truncated index
    val needRetry = fresh.filter(f => covOf(s1, f) != Long.MaxValue)
    val (chosen, stats) =
      if (needRetry.isEmpty) (rows, s1)
      else {
        val retried = indexFiles(spark, needRetry, confKv).localCheckpoint()
        val s2 = scanStats(retried)
        val takeRetried = needRetry.filter(f => covOf(s2, f) > covOf(s1, f)).toSet
        if (takeRetried.isEmpty) (rows, s1)
        else {
          val keep = rows.where(
            !col("file").isin(takeRetried.toSeq: _*))
          val swapped = retried.where(
            col("file").isin(takeRetried.toSeq: _*))
          (keep.unionAll(swapped),
            s1 ++ s2.view.filterKeys(takeRetried).toMap)
        }
      }
    val stillEmpty = fresh.filter(f => stats.get(f).forall(_._1 == 0L))
    if (stillEmpty.isEmpty) return chosen
    val hconf = spark.sparkContext.hadoopConfiguration
    val sentinels = stillEmpty.map { f =>
      val fp = new Path(f)
      val sz = try fp.getFileSystem(hconf).getFileStatus(fp).getLen
      catch { case _: Exception => 0L }
      Row(f, 0L, 0L, -1L, null, null, null, null, sz)
    }
    chosen.unionAll(spark.createDataFrame(
      spark.sparkContext.parallelize(sentinels, 1), indexSchema))
  }

  /** The maintenance view of an index's incompleteness: one row per
    * archive whose last scan did NOT reach physical EOF —
    * `(file, covered_bytes, file_bytes)` from the `rec_no = -2`
    * coverage markers [[indexFiles]] writes. A crawl-maintenance pass
    * drops these files' rows from the index and lets [[updateIndex]]
    * re-scan them (e.g. after an archive repair), or alerts on
    * persistently partial archives. */
  def partialArchives(index: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    index.where(col("rec_no") === -2L)
      .select(col("file"), col("offset").as("covered_bytes"),
        col("content_length").as("file_bytes"))
  }

  /** Fetched-record schema: the index coordinates that located the
    * member plus the full record fields of [[schema]]. */
  val fetchSchema: StructType = StructType(
    StructField("file", StringType, nullable = false) +:
    StructField("offset", LongType, nullable = false) +:
    schema.fields.toSeq.filter(f => f.name != "file" && f.name != "rec_no"))

  /** Ranged fetch: read exactly the members named by `index` rows
    * (columns `file`, `offset`, `length` — e.g. a filtered
    * [[buildIndex]] result) and parse each as one WARC record.
    *
    * Scale shape: rows are repartitioned by file and sorted by offset
    * within each partition, so each archive is opened once per task
    * and reads proceed in file order (sequential-friendly seeks; on
    * object stores these become ranged GETs). A member that fails to
    * read or parse is dropped, never thrown — the index may be stale
    * relative to a rewritten archive. */
  def fetchAt(spark: SparkSession, index: DataFrame,
              maxPayloadBytes: Int = 1 << 20,
              maxMemberBytes: Long = 1L << 26): DataFrame = {
    import org.apache.spark.sql.functions.{col, floor, lit}
    val sc = spark.sparkContext
    val confKv: Array[(String, String)] =
      sc.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    val cap = maxPayloadBytes
    val memberCap = maxMemberBytes
    // Partition on (file, 64 MiB offset chunk), not hash on file
    // alone: hashing by file caps parallelism at the archive count
    // (8 staged files = 8 busy cores of 32, and hash collisions make
    // it worse); chunking the offset spreads a big archive's fetches
    // over many tasks (concurrent readers at different offsets are
    // free). Deliberately NOT repartitionByRange: RangePartitioner
    // SAMPLES its input first, which re-executes the index lineage —
    // when the caller composes buildIndex→fetchAt directly, that is
    // a second full archive walk. The hash bucketing is a pure
    // function of each row. sortWithinPartitions keeps file-major
    // offset order for the open-once stream reuse below.
    val rows = index.select(col("file"), col("offset"), col("length"))
      .repartition(col("file"), floor(col("offset") / lit(64L << 20)))
      .sortWithinPartitions(col("file"), col("offset"))
      .rdd
    val out = rows.mapPartitions { it =>
      val conf = new Configuration(false)
      confKv.foreach { case (k, v) => conf.set(k, v) }
      var curPath: String = null
      var curLen = 0L
      var curIn: org.apache.hadoop.fs.FSDataInputStream = null
      def closeCur(): Unit =
        if (curIn != null) { try curIn.close() catch { case _: Exception => }; curIn = null }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => closeCur()))
      it.flatMap { r =>
        val file = r.getString(0); val off = r.getLong(1); val len = r.getLong(2)
        try {
          if (file != curPath) {
            closeCur()
            val fp = new Path(file)
            val fsys = fp.getFileSystem(conf)
            curLen = fsys.getFileStatus(fp).getLen
            curIn = fsys.open(fp)
            curPath = file
          }
          // the length is INDEX data, i.e. untrusted relative to the
          // file on disk: bound the allocation (one corrupt row must
          // not OOM the executor — OutOfMemoryError is not an
          // Exception, the catch below would not contain it) and
          // reject ranges outside the file
          if (len <= 0 || len > math.min(memberCap, Int.MaxValue.toLong) ||
              off < 0 || off + len > curLen) None
          else {
            curIn.seek(off)
            val bytes = new Array[Byte](len.toInt)
            if (!readFully(curIn, bytes, len.toInt)) None
            else parseAll(bytes, cap).headOption.map { rec =>
              Row(file, off, rec.warcType, rec.targetUri,
                rec.dateEpochMicros.map(microsToTimestamp).orNull,
                rec.recordId, rec.contentType, rec.contentLength,
                rec.truncated, rec.httpStatus.map(Int.box).orNull,
                rec.httpContentType.orNull, rec.body)
            }
          }
        } catch { case _: Exception =>
          // a failed seek/read poisons the stream state; reopen lazily
          closeCur(); curPath = null; None
        }
      }
    }
    spark.createDataFrame(out, fetchSchema)
  }

  /** Walk the gzip members of a concatenated `.warc.gz` stream,
    * yielding `(offset, compressedLength, decompressedPrefix)` per
    * member. The prefix is capped (header block + status line is all
    * the indexer needs) while inflation continues to the member's true
    * end, so a multi-GiB payload costs no heap. Malformed framing ends
    * the iterator — bytes are data, not exceptions. */
  private[sources] def gzipMembers(
      in: InputStream,
      prefixCap: Int = (MaxHeaderBlockBytes + 8192).toInt)
      : Iterator[(Long, Long, Array[Byte])] =
    new Iterator[(Long, Long, Array[Byte])] {
      private val r = new CountingReader(in)
      private var nextM: (Long, Long, Array[Byte]) = _
      private var done = false
      private def advance(): Unit = {
        if (done || nextM != null) return
        nextM = try readMember(r, prefixCap).orNull
        catch { case _: Exception => null }
        if (nextM == null) done = true
      }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): (Long, Long, Array[Byte]) = {
        advance()
        if (done) throw new NoSuchElementException
        val m = nextM; nextM = null; m
      }
    }

  /** Buffered reader that knows its absolute offset and can expose the
    * unconsumed tail of its buffer to an `Inflater` (then take back
    * what the inflater did not use). */
  private final class CountingReader(in: InputStream) {
    private val buf = new Array[Byte](1 << 16)
    private var len = 0
    private var pos = 0
    private var base = 0L
    def offset: Long = base + pos
    private def ensure(): Boolean = {
      while (pos >= len) {
        base += len; pos = 0
        len = in.read(buf)
        if (len < 0) { len = 0; return false }
      }
      true
    }
    def read(): Int =
      if (!ensure()) -1 else { val b = buf(pos) & 0xff; pos += 1; b }
    /** Expose the buffered unconsumed bytes (refilling if drained);
      * (array, start, count), count == 0 at EOF. */
    def chunk(): (Array[Byte], Int, Int) =
      if (!ensure()) (buf, 0, 0) else (buf, pos, len - pos)
    def consume(n: Int): Unit = pos += n
    def unconsume(n: Int): Unit = pos -= n
  }

  /** Read one gzip member: hand-parsed header (RFC 1952), raw-inflate
    * to find the exact deflate end via `Inflater.getRemaining`, 8-byte
    * trailer. Returns (startOffset, memberLength, decompressedPrefix)
    * or None at EOF / malformed bytes. */
  private def readMember(r: CountingReader,
                         prefixCap: Int): Option[(Long, Long, Array[Byte])] = {
    val start = r.offset
    val b0 = r.read()
    if (b0 < 0) return None // clean EOF
    val b1 = r.read()
    if (b0 != 0x1f || b1 != 0x8b) return None
    if (r.read() != 8) return None // CM must be deflate
    val flg = r.read()
    if (flg < 0) return None
    var i = 0
    while (i < 6) { if (r.read() < 0) return None; i += 1 } // MTIME XFL OS
    if ((flg & 4) != 0) { // FEXTRA
      val l0 = r.read(); val l1 = r.read()
      if (l0 < 0 || l1 < 0) return None
      var n = l0 | (l1 << 8)
      while (n > 0) { if (r.read() < 0) return None; n -= 1 }
    }
    if ((flg & 8) != 0) { // FNAME, NUL-terminated
      var c = r.read()
      while (c > 0) c = r.read()
      if (c < 0) return None
    }
    if ((flg & 16) != 0) { // FCOMMENT
      var c = r.read()
      while (c > 0) c = r.read()
      if (c < 0) return None
    }
    if ((flg & 2) != 0) { if (r.read() < 0 || r.read() < 0) return None } // FHCRC

    val inf = new java.util.zip.Inflater(true)
    val prefix = new ByteArrayOutputStream(math.min(prefixCap, 1 << 16))
    val tmp = new Array[Byte](1 << 16)
    try {
      while (!inf.finished()) {
        if (inf.needsInput()) {
          val (b, p, l) = r.chunk()
          if (l <= 0) return None // EOF mid-deflate
          inf.setInput(b, p, l)
          r.consume(l)
        }
        val n = inf.inflate(tmp)
        if (n > 0 && prefix.size < prefixCap)
          prefix.write(tmp, 0, math.min(n, prefixCap - prefix.size))
        else if (n == 0 && inf.needsDictionary()) return None
      }
      r.unconsume(inf.getRemaining) // bytes past the deflate end
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    i = 0
    while (i < 8) { if (r.read() < 0) return None; i += 1 } // CRC32 + ISIZE
    Some((start, r.offset - start, prefix.toByteArray))
  }

  private def closing[A](in: InputStream, it: Iterator[A]): Iterator[A] =
    new Iterator[A] {
      private var closed = false
      override def hasNext: Boolean = {
        val h = try it.hasNext catch { case _: EOFException => false }
        if (!h && !closed) { closed = true; try in.close() catch { case _: Exception => } }
        h
      }
      override def next(): A = it.next()
    }

  // ------------------------------------------------------------------
  // writer (fixture/test synthesis; also the mirror spec of the parser)
  // ------------------------------------------------------------------

  /** Serialize one record (version line, headers, CRLF, block,
    * CRLF CRLF trailer) per ISO 28500 §4. */
  def writeRecord(headers: Seq[(String, String)],
                  payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 256)
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    out.write(sb.toString.getBytes(UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** One gzip member per record — the concatenable `.warc.gz` unit. */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(record); gz.finish(); gz.close()
    out.toByteArray
  }

  def httpResponseBytes(status: Int, reason: String, contentType: String,
                        body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status $reason\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    head.getBytes(UTF_8) ++ body
  }

  def httpRequestBytes(method: String, path: String, host: String): Array[Byte] =
    s"$method $path HTTP/1.1\r\nHost: $host\r\nUser-Agent: graft\r\n\r\n".getBytes(UTF_8)

  /** Convenience: parse a standalone byte array (tests). */
  def parseAll(bytes: Array[Byte], maxPayloadBytes: Int = 1 << 20): Seq[Rec] =
    records(maybeGunzip(new BufferedInputStream(
      new ByteArrayInputStream(bytes))), maxPayloadBytes).toList
}
