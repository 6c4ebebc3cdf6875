package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC container source: framing roundtrip, concatenated gzip
  * members, HTTP splitting, the truncation cap, and the never-throw
  * contract on malformed / fuzzed input. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def respRecord(id: Int, body: String,
                         status: Int = 200): Array[Byte] =
    Warc.writeRecord(
      Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> s"https://example.org/item$id",
        "WARC-Date" -> "2023-11-14T22:13:20Z",
        "WARC-Record-ID" -> s"<urn:uuid:00000000-0000-0000-0000-${"%012d".format(id)}>",
        "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponseBytes(status, "OK", "text/html; charset=utf-8",
        body.getBytes(UTF_8)))

  private def reqRecord(id: Int): Array[Byte] =
    Warc.writeRecord(
      Seq(
        "WARC-Type" -> "request",
        "WARC-Target-URI" -> s"https://example.org/item$id",
        "WARC-Date" -> "2023-11-14T22:13:20Z",
        "Content-Type" -> "application/http; msgtype=request"),
      Warc.httpRequestBytes("GET", s"/item$id", "example.org"))

  test("roundtrip: plain multi-record stream, request/response split") {
    val bytes = reqRecord(1) ++ respRecord(1, "<p>one</p>") ++
      respRecord(2, "<p>two</p>", status = 404)
    val recs = Warc.parseAll(bytes)
    assert(recs.map(_.warcType) == Seq("request", "response", "response"))
    val r1 = recs(1)
    assert(r1.targetUri == "https://example.org/item1")
    assert(r1.httpStatus.contains(200))
    assert(r1.httpContentType.contains("text/html; charset=utf-8"))
    assert(new String(r1.body, UTF_8) == "<p>one</p>")
    assert(r1.dateEpochMicros.contains(1700000000000000L))
    assert(!r1.truncated)
    assert(recs(2).httpStatus.contains(404))
    // request record: no status, body is empty (headers only)
    assert(recs(0).httpStatus.isEmpty)
    assert(recs(0).body.isEmpty)
  }

  test("concatenated per-record gzip members parse as one stream") {
    val bytes = Warc.gzipMember(respRecord(1, "a")) ++
      Warc.gzipMember(reqRecord(2)) ++
      Warc.gzipMember(respRecord(2, "bb"))
    val recs = Warc.parseAll(bytes)
    assert(recs.size == 3)
    assert(new String(recs(2).body, UTF_8) == "bb")
  }

  test("header folding, bracket-stripped URI, LF-only HTTP head") {
    val payload = "HTTP/1.1 301 Moved\nContent-Type: text/plain\nLocation: x\n\nmoved"
      .getBytes(UTF_8)
    val rec = Warc.writeRecord(
      Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "<https://example.org/a>",
        "WARC-Date" -> "2023-11-14T22:13:20.500Z",
        "X-Folded" -> "first",
        " continued" -> "ignored-shape", // written as a folded line below
        "Content-Type" -> "application/http"),
      payload)
    // hand-build a folded header: replace the bogus line with a continuation
    val txt = new String(rec, UTF_8)
      .replace(" continued: ignored-shape", "\tsecond part")
    val recs = Warc.parseAll(txt.getBytes(UTF_8))
    assert(recs.size == 1)
    assert(recs.head.targetUri == "https://example.org/a") // <> stripped
    assert(recs.head.httpStatus.contains(301))
    assert(new String(recs.head.body, UTF_8) == "moved")
    assert(recs.head.dateEpochMicros.contains(1700000000500000L))
  }

  test("payload cap: oversize block kept to cap, flagged truncated; walk continues") {
    val big = respRecord(1, "x" * 5000)
    val after = respRecord(2, "tail")
    val recs = Warc.parseAll(big ++ after, maxPayloadBytes = 256)
    assert(recs.size == 2)
    assert(recs.head.truncated)
    assert(recs.head.body.length <= 256)
    assert(recs.head.contentLength > 5000) // declared, not kept, length
    assert(!recs(1).truncated)
    assert(new String(recs(1).body, UTF_8) == "tail")
  }

  test("malformed inputs stop the walk, keep parsed prefix, never throw") {
    val good = respRecord(1, "ok")
    // truncated mid-block
    val cut = (good ++ respRecord(2, "yy")).dropRight(9)
    assert(Warc.parseAll(cut).size >= 1)
    // garbage between records: stop at the garbage, keep record 1
    val garbage = good ++ "not a warc header\r\n\r\n".getBytes(UTF_8) ++ good
    assert(Warc.parseAll(garbage).map(_.recNo) == Seq(0L))
    // missing Content-Length
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(UTF_8)
    assert(Warc.parseAll(noLen).isEmpty)
    // negative / non-numeric Content-Length
    val badLen = "WARC/1.0\r\nContent-Length: -5\r\n\r\n".getBytes(UTF_8)
    assert(Warc.parseAll(badLen).isEmpty)
    // truncated gzip member
    val gz = Warc.gzipMember(good)
    assert(Warc.parseAll(gz.dropRight(7)).size <= 1)
    // malformed WARC-Date is data, not an error
    val badDate = Warc.writeRecord(Seq("WARC-Type" -> "response",
      "WARC-Date" -> "yesterday-ish"), Array[Byte](1, 2))
    val r = Warc.parseAll(badDate)
    assert(r.size == 1 && r.head.dateEpochMicros.isEmpty)
  }

  test("fuzz: random and mutated bytes never throw") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val junk = Array.fill[Byte](rnd.nextInt(512))(rnd.nextInt.toByte)
      Warc.parseAll(junk) // must not throw
    }
    val good = Warc.gzipMember(respRecord(7, "seed body"))
    for (_ <- 1 to 300) {
      val mut = good.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips)
        mut(rnd.nextInt(mut.length)) = rnd.nextInt.toByte
      Warc.parseAll(mut) // must not throw
    }
    // a crafted huge Content-Length must not allocate/buffer unboundedly
    val evil = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${Long.MaxValue}\r\n\r\nshort").getBytes(UTF_8)
    val r = Warc.parseAll(evil, maxPayloadBytes = 1 << 10)
    assert(r.forall(_.truncated))
  }

  test("header bombs degrade to stop-the-walk, bounded memory") {
    // more distinct header lines than the cap → record dropped, no OOM
    val manyHeaders = new StringBuilder("WARC/1.0\r\n")
    for (i <- 1 to 1000) manyHeaders.append(s"X-H$i: v\r\n")
    manyHeaders.append("Content-Length: 0\r\n\r\n\r\n\r\n")
    assert(Warc.parseAll(manyHeaders.toString.getBytes(UTF_8)).isEmpty)
    // a continuation-line flood folds linearly and is size-bounded
    val fold = new StringBuilder("WARC/1.0\r\nX-A: start\r\n")
    for (_ <- 1 to 300000) fold.append(" c\r\n")
    fold.append("Content-Length: 0\r\n\r\n\r\n\r\n")
    assert(Warc.parseAll(fold.toString.getBytes(UTF_8)).isEmpty) // > 1 MiB block
    // under the caps, folding still works
    val ok = ("WARC/1.0\r\nWARC-Type: x\r\n\tfolded\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(UTF_8)
    assert(Warc.parseAll(ok).head.warcType == "x folded")
  }

  test("multi-member gzip survives an underlying stream with available()==0") {
    // GZIPInputStream's member-boundary probe consults available();
    // NonZeroAvailable must keep it walking even when the raw stream
    // reports 0 (remote-FS behavior), and still terminate at true EOF
    val rnd = new scala.util.Random(7)
    val bigBody = new String(Array.fill(200000)(('a' + rnd.nextInt(26)).toChar))
    val bytes = Warc.gzipMember(respRecord(1, bigBody)) ++
      Warc.gzipMember(respRecord(2, "tail"))
    val zeroAvail = new java.io.InputStream {
      val b = new java.io.ByteArrayInputStream(bytes)
      def read(): Int = b.read()
      override def read(a: Array[Byte], o: Int, l: Int): Int = b.read(a, o, l)
      override def available(): Int = 0
    }
    val recs = Warc.records(Warc.maybeGunzip(zeroAvail), 1 << 20).toList
    assert(recs.size == 2)
    assert(new String(recs(1).body, UTF_8) == "tail")
  }

  test("distributed read: one task per file, schema, response projection") {
    val dir = Files.createTempDirectory("graft_warc_spec")
    Files.write(dir.resolve("a.warc.gz"),
      Warc.gzipMember(reqRecord(1)) ++ Warc.gzipMember(respRecord(1, "<b>A</b>")))
    Files.write(dir.resolve("b.warc"),
      respRecord(2, "B" * 10) ++ respRecord(3, "C", status = 500))
    Files.write(dir.resolve("ignored.txt"), "nope".getBytes(UTF_8))

    val df = Warc.read(spark, dir.toString)
    assert(df.rdd.getNumPartitions == 2) // one per .warc* file
    assert(df.count() == 4)
    val resp = Warc.readResponses(spark, dir.toString)
      .orderBy("target_uri").collect()
    assert(resp.length == 3)
    assert(resp.map(_.getAs[Int]("http_status")).toSeq == Seq(200, 200, 500))
    assert(new String(resp(0).getAs[Array[Byte]]("body"), UTF_8) == "<b>A</b>")
    assert(resp(0).getAs[java.sql.Timestamp]("warc_date") != null)
  }
}
