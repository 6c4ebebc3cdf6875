package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal asset plumbing (SURVEY.md north-star extension): treat
  * image/audio/video as opaque `binary` columns with typed metadata,
  * with decode / feature-extract / resize / frame-sample as
  * partition-local transforms.
  *
  * Codec boundary: IMAGES decode for real through the pure-JDK
  * [[ImageCodec]] (`javax.imageio` — PNG/BMP/GIF/JPEG headers and
  * pixels), AUDIO through [[AudioCodec]] (`javax.sound.sampled` —
  * WAV/AIFF/AU containers), and VIDEO through [[VideoCodec]] (a
  * hand-rolled RIFF/AVI chunk walker — uncompressed DIB AVIs parse,
  * resize and re-encode frame-accurately with zero dependencies).
  * Compressed video codecs are NOT in this container, so payloads no
  * real reader recognizes fall back to the clearly-marked
  * deterministic stub ([[StubCodec]]) reading a tiny fake header.
  * Everything Spark-owned — schema, batch iteration shape
  * (iterator-to-iterator, never materializing a partition),
  * partitioning, explode fan-out — is identical on both sides of the
  * boundary: swapping the stub for a JNI/FFI codec changes no plan
  * shape.
  */
object Multimodal {

  /** Asset table schema: id, modality tag, raw bytes, shallow metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("mime", StringType))))))

  /** Decoded-feature schema produced by [[decodeFeatures]].
    * width/height are image dims (0 for audio); sample_rate/channels
    * are audio stream properties (0 for images); n_frames is video
    * frames, audio PCM frames, or 1 for a still image. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("byte_len", LongType)))

  /** STUB codec boundary: parses the deterministic fake header
    * `[w:int16][h:int16][frames:int16]` big-endian from the first 6
    * bytes. A real implementation would hand `bytes` to an image/
    * audio/video library here — per-record, partition-local, no
    * change to the surrounding plan. */
  object StubCodec {
    def decodeHeader(bytes: Array[Byte]): (Int, Int, Int) = {
      def u16(i: Int): Int =
        ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      if (bytes == null || bytes.length < 6) (0, 0, 0)
      else (u16(0), u16(2), u16(4))
    }

    def encodeHeader(w: Int, h: Int, frames: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](6 + payload.length)
      out(0) = (w >> 8).toByte; out(1) = w.toByte
      out(2) = (h >> 8).toByte; out(3) = h.toByte
      out(4) = (frames >> 8).toByte; out(5) = frames.toByte
      System.arraycopy(payload, 0, out, 6, payload.length)
      out
    }
  }

  /** REAL image codec: pure-JDK `javax.imageio`, so it ships with the
    * engine (no new dependencies) and runs partition-local on any
    * executor. Dimension reads are HEADER-ONLY (`ImageReader.getWidth`
    * never decodes pixel data) — the cheap path for feature
    * extraction over 100 TB of assets; full pixel decode happens only
    * in [[resize]]. */
  object ImageCodec {
    // never spill ImageIO scratch to executor-local temp files
    javax.imageio.ImageIO.setUseCache(false)

    /** (width, height) from the image header, or None when no
      * installed reader recognizes the bytes (corrupt payloads, and
      * the stub-header synthetic fixtures, fall back to [[StubCodec]]
      * at the [[decodeFeatures]] dispatch). */
    def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
            finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    }

    /** Full pixel decode, or None when unreadable. */
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    /** Container format name ("png", "bmp", …) sniffed from the
      * bytes, or None when no reader recognizes them. */
    def formatName(bytes: Array[Byte]): Option[String] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try Some(r.getFormatName.toLowerCase(java.util.Locale.ROOT))
            finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    }

    /** Deterministic image encode (compression of fixed pixels is
      * byte-stable for a fixed JDK encoder). Throws when no writer
      * exists for `format` — a silent false return would yield a
      * 0-byte payload masquerading as an image. */
    def encode(img: java.awt.image.BufferedImage, format: String = "png"): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      if (!javax.imageio.ImageIO.write(img, format, bos))
        throw new IllegalArgumentException(s"no image writer for format $format")
      bos.toByteArray
    }

    /** Nearest-neighbor pixel resize — explicit interpolation so the
      * result is deterministic across JDK implementations. */
    def resizePixels(img: java.awt.image.BufferedImage,
                     factor: Double): java.awt.image.BufferedImage = {
      val w = math.max(1, (img.getWidth * factor).toInt)
      val h = math.max(1, (img.getHeight * factor).toInt)
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, w, h, null); ()
      } finally g.dispose()
      out
    }
  }

  /** REAL audio codec: pure-JDK `javax.sound.sampled` — WAV/AIFF/AU
    * container headers parse without decoding sample data (the cheap
    * path, like [[ImageCodec.decodeDims]]). */
  object AudioCodec {
    /** (sampleRate, channels, pcmFrames) from the container header,
      * or None when no installed reader recognizes the bytes. */
    def decodeMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength
        if (frames < 0) None
        else Some((fmt.getSampleRate.toInt, fmt.getChannels, frames))
      } catch { case _: Exception => None }
    }

    /** Deterministic 16-bit PCM WAV encode (header + seed-derived
      * samples — byte-stable for a fixed JDK). */
    def encodeWav(sampleRate: Int, channels: Int, nFrames: Int,
                  seed: Long): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, channels, true, false)
      val data = new Array[Byte](nFrames * channels * 2)
      var i = 0
      while (i < data.length) {
        data(i) = ((seed * 31 + i * 7) % 127).toByte; i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Encode the SAME index-derived 16-bit PCM samples into any of
      * the three javax lossless containers (WAVE little-endian, AIFF
      * and AU big-endian — the byte order lives in the container, the
      * sample VALUES are identical), so cross-container dedup has
      * real ground truth. Mono; sample j = (seed·31 + j·7) % 1000 −
      * 500. */
    def encodePcm(sampleRate: Int, nFrames: Int, seed: Long,
                  container: String): Array[Byte] = {
      val big = container != "wav"
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, big)
      val data = new Array[Byte](nFrames * 2)
      var j = 0
      while (j < nFrames) {
        val s = ((seed * 31 + j * 7) % 1000 - 500).toShort
        if (big) { data(2 * j) = (s >> 8).toByte; data(2 * j + 1) = s.toByte }
        else { data(2 * j) = s.toByte; data(2 * j + 1) = (s >> 8).toByte }
        j += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
      val typ = container match {
        case "wav" => javax.sound.sampled.AudioFileFormat.Type.WAVE
        case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
        case "au" => javax.sound.sampled.AudioFileFormat.Type.AU
        case other => throw new IllegalArgumentException(s"container $other")
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, typ, bos)
      bos.toByteArray
    }

    /** Full 16-bit PCM decode through javax (WAV/AIFF/AU): sample
      * VALUES in container-independent form — endianness is resolved
      * from the stored format, so the same samples read back equal
      * regardless of container. None when unreadable or not 16-bit
      * PCM. */
    def decodePcm(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            return None
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          val out = new Array[Short](n)
          val big = fmt.isBigEndian
          var j = 0
          while (j < n) {
            out(j) =
              if (big) (((raw(2 * j) & 0xff) << 8) | (raw(2 * j + 1) & 0xff)).toShort
              else (((raw(2 * j + 1) & 0xff) << 8) | (raw(2 * j) & 0xff)).toShort
            j += 1
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, out))
        } finally ais.close()
      } catch { case _: Exception => None }
    }

    // ---- MPEG audio (MP3) frame-header metadata --------------------
    // javax.sound has no MP3 decoder, but the FRAME STREAM is plain
    // header arithmetic (MPEG-1 Layer III): 4-byte headers carrying
    // bitrate/samplerate indices, each frame's length derivable as
    // 144·bitrate/samplerate (+padding), 1152 PCM samples per frame.
    // Same honesty line as the video containers: stream structure is
    // parsed for real, sample synthesis/decode is not pretended.

    private val Mp3Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96,
      112, 128, 160, 192, 224, 256, 320) // kbps, MPEG-1 Layer III
    private val Mp3Rates = Array(44100, 48000, 32000)

    /** (sampleRate, channels, pcmFrames) from an MPEG-1 Layer III
      * frame stream — frames counted by walking the header chain
      * (ID3v2 prefix tag and trailing ID3v1 'TAG' block skipped),
      * pcmFrames = 1152 × frame count. None unless the bytes start
      * (after any ID3v2) with a valid sync and every subsequent
      * position holds a consistent frame header. */
    def mp3Meta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes == null || bytes.length < 4) return None
      var p = 0
      // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4)
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        p = 10 + sz
      }
      var frames = 0
      var rate = 0; var channels = 0
      while (p + 4 <= bytes.length) {
        // ID3v1 trailer is the only non-frame tail accepted
        if (bytes.length - p == 128 && bytes(p) == 'T' && bytes(p + 1) == 'A' &&
            bytes(p + 2) == 'G') {
          p = bytes.length
        } else {
          val h0 = bytes(p) & 0xff; val h1 = bytes(p + 1) & 0xff
          val h2 = bytes(p + 2) & 0xff; val h3 = bytes(p + 3) & 0xff
          // sync + MPEG-1 (version bits 11) + Layer III (bits 01)
          if (h0 != 0xff || (h1 & 0xfe) != 0xfa) return None
          val brIdx = (h2 >> 4) & 0xf
          val srIdx = (h2 >> 2) & 0x3
          if (brIdx == 0 || brIdx == 0xf || srIdx == 3) return None
          val br = Mp3Bitrates(brIdx) * 1000
          val sr = Mp3Rates(srIdx)
          val pad = (h2 >> 1) & 0x1
          val ch = if (((h3 >> 6) & 0x3) == 3) 1 else 2
          if (frames == 0) { rate = sr; channels = ch }
          else if (rate != sr || channels != ch) return None // no VBR remux
          val len = 144 * br / sr + pad
          if (len < 4 || p + len > bytes.length) return None
          frames += 1
          p += len
        }
      }
      if (frames == 0 || p != bytes.length) None
      // Long arithmetic + cap, matching flacMeta: ~1.86M frames of a
      // valid 32 kbps stream would overflow `frames * 1152` as Int.
      else Some((rate, channels,
        math.min(frames.toLong * 1152L, Int.MaxValue.toLong).toInt))
    }

    /** (sampleRate, channels, totalSamples) from a FLAC STREAMINFO
      * block — "fLaC" magic, then metadata block headers ([last:1 |
      * type:7][len:u24be]); STREAMINFO (type 0, 34 bytes) packs
      * 20-bit sample rate, 3-bit channels−1, 5-bit bps−1 and 36-bit
      * total samples after the block/frame size fields. Container
      * metadata only — no frame decode. */
    def flacMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes == null || bytes.length < 8) return None
      if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
        return None
      var p = 4L
      while (p + 4 <= bytes.length) {
        val hdr = bytes(p.toInt) & 0xff
        val len = ((bytes(p.toInt + 1) & 0xff) << 16) |
          ((bytes(p.toInt + 2) & 0xff) << 8) | (bytes(p.toInt + 3) & 0xff)
        val body = p + 4
        if (body + len > bytes.length) return None
        if ((hdr & 0x7f) == 0) { // STREAMINFO
          if (len < 34) return None
          val b = body.toInt
          val sr = ((bytes(b + 10) & 0xff) << 12) |
            ((bytes(b + 11) & 0xff) << 4) | ((bytes(b + 12) & 0xff) >> 4)
          val ch = (((bytes(b + 12) & 0xff) >> 1) & 0x7) + 1
          val totalSamples = ((bytes(b + 13) & 0x0fL) << 32) |
            ((bytes(b + 14) & 0xffL) << 24) | ((bytes(b + 15) & 0xffL) << 16) |
            ((bytes(b + 16) & 0xffL) << 8) | (bytes(b + 17) & 0xffL)
          return if (sr > 0) Some((sr, ch,
            math.min(totalSamples, Int.MaxValue.toLong).toInt)) else None
        }
        if ((hdr & 0x80) != 0) return None // last block, no STREAMINFO
        p = body + len
      }
      None
    }

    /** Deterministic FLAC header: "fLaC" + a STREAMINFO block with
      * the given properties (16-bit samples, zeroed frame-size and
      * MD5 fields) — the container-metadata fixture for [[flacMeta]];
      * no audio frames are pretended. */
    def encodeFlac(sampleRate: Int, channels: Int, totalSamples: Int): Array[Byte] = {
      require(sampleRate > 0 && sampleRate < (1 << 20) &&
        channels >= 1 && channels <= 8 && totalSamples >= 0, "bad FLAC params")
      val out = new Array[Byte](4 + 4 + 34)
      out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
      out(4) = 0x80.toByte // last metadata block, type 0 = STREAMINFO
      out(7) = 34          // 24-bit length
      val b = 8
      out(b) = 0x10; out(b + 1) = 0x00      // min block size 4096
      out(b + 2) = 0x10; out(b + 3) = 0x00  // max block size 4096
      out(b + 10) = (sampleRate >> 12).toByte
      out(b + 11) = (sampleRate >> 4).toByte
      out(b + 12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
        ((16 - 1) >> 4)).toByte             // bps-1 high bit (16-bit)
      out(b + 13) = ((((16 - 1) & 0xf) << 4)).toByte // bps-1 low, samples hi 4 = 0
      out(b + 14) = (totalSamples >> 24).toByte
      out(b + 15) = (totalSamples >> 16).toByte
      out(b + 16) = (totalSamples >> 8).toByte
      out(b + 17) = totalSamples.toByte
      out
    }

    /** Deterministic MPEG-1 Layer III frame stream: a small ID3v2 tag
      * (so the parser's tag skip is exercised) + `mpegFrames` frames
      * of real header arithmetic around zeroed payload bytes — the
      * honest fixture for [[mp3Meta]]; no encoder is pretended. */
    def encodeMp3(sampleRate: Int, channels: Int, mpegFrames: Int,
                  bitrateKbps: Int): Array[Byte] = {
      val srIdx = Mp3Rates.indexOf(sampleRate)
      val brIdx = Mp3Bitrates.indexOf(bitrateKbps)
      require(srIdx >= 0 && brIdx > 0 && mpegFrames >= 0, "bad MP3 params")
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 10), 0, 10)
      out.write(new Array[Byte](10), 0, 10) // empty padded tag body
      val len = 144 * bitrateKbps * 1000 / sampleRate // padding bit 0
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      frame(3) = (if (channels == 1) 0xc0 else 0x00).toByte
      (0 until mpegFrames).foreach(_ => out.write(frame, 0, len))
      out.toByteArray
    }
  }

  /** REAL video codec: hand-rolled RIFF/AVI container support (pure
    * JDK — no codec library exists in-container, but an uncompressed
    * DIB ('00db') AVI is plain header arithmetic plus raw RGB24
    * frames, the same class of work as [[AudioCodec]]'s WAV parse).
    * Metadata reads walk the RIFF chunk tree to the 'avih' main
    * header — width, height and frame count come from the container
    * itself, not from any stub convention. Unrecognized video
    * payloads still fall back to [[StubCodec]] at the dispatch sites.
    */
  object VideoCodec {
    private def u32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def cc(b: Array[Byte], i: Int): String =
      if (i + 4 > b.length) ""
      else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** RIFF magic sniff — lets callers distinguish "real container
      * that failed its resizer" from stub-header fixtures. */
    def isRiff(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 4 && cc(bytes, 0) == "RIFF"
    private def putU32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    private def putCC(b: Array[Byte], i: Int, s: String): Unit = {
      var j = 0
      while (j < 4) { b(i + j) = s.charAt(j).toByte; j += 1 }
    }

    /** DIB rows are padded to 4-byte boundaries. */
    private def rowBytes(w: Int): Int = (w * 3 + 3) & ~3

    /** Walk the RIFF chunk tree under `[from, to)`, descending into
      * every LIST and invoking `f(id, payloadOffset, size)` on leaf
      * chunks. ALL arithmetic is Long: chunk sizes are untrusted
      * record content, and an Int guard like `off + 8 + size >
      * length` overflows for sizes near 2^31, wrapping the cursor
      * negative and crashing the walk. Malformed sizes stop the scan
      * — never throw. */
    private def scanRiff(bytes: Array[Byte], from: Long, to: Long,
                         depth: Int = 0)
                        (f: (String, Int, Int) => Unit): Unit = {
      // depth bound: LISTs nest by self-recursion on untrusted sizes,
      // and a crafted payload of ~80k 12-byte LIST-in-LIST chunks
      // would otherwise StackOverflowError (an Error no catch sees)
      // straight through the never-throw contract. Real AVI trees are
      // 3-4 deep; 32 is generous, beyond it the walk just stops.
      if (depth > 32) return
      val end = math.min(to, bytes.length.toLong)
      var off = from
      while (off + 8 <= end) {
        val id = cc(bytes, off.toInt)
        val size = u32(bytes, off.toInt + 4).toLong & 0xffffffffL
        if (off + 8 + size > end) return
        if (id == "LIST" && size >= 4)
          scanRiff(bytes, off + 12, off + 8 + size, depth + 1)(f)
        else f(id, (off + 8).toInt, size.toInt)
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
    }

    /** (width, height, frames) from the 'avih' main header, or None
      * when the bytes are not a RIFF/AVI container. */
    def decodeMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes == null || bytes.length < 24) return None
      if (cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ") return None
      var result: Option[(Int, Int, Int)] = None
      scanRiff(bytes, 12L, bytes.length.toLong) { (id, d, size) =>
        if (id == "avih" && size >= 40 && result.isEmpty)
          result = Some((u32(bytes, d + 32), u32(bytes, d + 36), u32(bytes, d + 16)))
      }
      result
    }

    /** Deterministic uncompressed AVI encode: RIFF(AVI ){ LIST hdrl
      * { avih, LIST strl { strh(vids/DIB), strf(BITMAPINFOHEADER) } },
      * LIST movi { frames × '00db'(raw bottom-up RGB24, 4-byte row
      * padding) } }. `pixel(f, x, y)` supplies each frame's RGB. */
    def encodeAvi(w: Int, h: Int, frames: Int,
                  pixel: (Int, Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0 && frames >= 0, "bad AVI dimensions")
      val rb = rowBytes(w)
      val frameBytes = rb * h
      val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val moviSize = 4 + frames * (8 + frameBytes)
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val out = new Array[Byte](8 + riffSize)
      var p = 0
      def chunkHeader(id: String, size: Int): Unit = {
        putCC(out, p, id); putU32(out, p + 4, size); p += 8
      }
      chunkHeader("RIFF", riffSize); putCC(out, p, "AVI "); p += 4
      chunkHeader("LIST", hdrlSize); putCC(out, p, "hdrl"); p += 4
      chunkHeader("avih", 56)
      val avih = p
      putU32(out, avih, 100000)            // usec/frame (10 fps)
      putU32(out, avih + 16, frames)       // dwTotalFrames
      putU32(out, avih + 24, 1)            // dwStreams
      putU32(out, avih + 28, frameBytes)   // dwSuggestedBufferSize
      putU32(out, avih + 32, w); putU32(out, avih + 36, h)
      p += 56
      chunkHeader("LIST", 4 + (8 + 56) + (8 + 40)); putCC(out, p, "strl"); p += 4
      chunkHeader("strh", 56)
      val strh = p
      putCC(out, strh, "vids"); putCC(out, strh + 4, "DIB ")
      putU32(out, strh + 20, 1)            // dwScale
      putU32(out, strh + 24, 10)           // dwRate → 10 fps
      putU32(out, strh + 32, frames)       // dwLength
      putU32(out, strh + 36, frameBytes)
      p += 56
      chunkHeader("strf", 40)
      val bih = p
      putU32(out, bih, 40)                 // biSize
      putU32(out, bih + 4, w); putU32(out, bih + 8, h)
      out(bih + 12) = 1                    // biPlanes
      out(bih + 14) = 24                   // biBitCount (BI_RGB)
      putU32(out, bih + 20, frameBytes)    // biSizeImage
      p += 40
      chunkHeader("LIST", moviSize); putCC(out, p, "movi"); p += 4
      var f = 0
      while (f < frames) {
        chunkHeader("00db", frameBytes)
        var y = 0
        while (y < h) {
          val row = p + (h - 1 - y) * rb // DIB rows store bottom-up
          var x = 0
          while (x < w) {
            val rgb = pixel(f, x, y)
            out(row + x * 3) = rgb.toByte             // B
            out(row + x * 3 + 1) = (rgb >> 8).toByte  // G
            out(row + x * 3 + 2) = (rgb >> 16).toByte // R
            x += 1
          }
          y += 1
        }
        p += frameBytes
        f += 1
      }
      out
    }

    /** First SOF (start-of-frame) marker's (width, height) from a
      * JPEG byte stream at `[off, off+len)` — the dimensional truth
      * of a compressed frame, read the way the decoder would. Walks
      * the marker stream (FF xx [len16 payload]): standalone markers
      * skipped, SOF0–SOF15 accepted except DHT(C4)/JPG(C8)/DAC(CC),
      * stop at SOS (entropy-coded data follows — a stream with no
      * SOF before SOS is broken). */
    def jpegSofDims(b: Array[Byte], off: Int, len: Int): Option[(Int, Int)] = {
      if (b == null || len < 4 || off < 0 || off + len > b.length) return None
      if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xff) != 0xd8) return None
      var p = off + 2
      val end = off + len
      while (p + 2 <= end) {
        if ((b(p) & 0xff) != 0xff) return None // lost marker sync
        val marker = b(p + 1) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) p += 2
        else {
          if (p + 4 > end) return None
          val segLen = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
          if (segLen < 2 || p + 2 + segLen > end) return None
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            // SOF payload: precision(1) height(2) width(2) ...
            if (segLen < 7) return None
            val h = ((b(p + 5) & 0xff) << 8) | (b(p + 6) & 0xff)
            val w = ((b(p + 7) & 0xff) << 8) | (b(p + 8) & 0xff)
            return Some((w, h))
          }
          if (marker == 0xda) return None // SOS before any SOF
          p += 2 + segLen
        }
      }
      None
    }

    /** (width, height, frames) for an MJPEG-in-AVI payload read from
      * the COMPRESSED STREAM itself: frames = count of '00dc' chunks,
      * dims = the first frame's JPEG SOF marker. The container's
      * 'avih' header is deliberately not consulted — compressed
      * corpora routinely carry absent or lying container headers, and
      * the frames are the truth. None when the payload is not
      * RIFF/AVI or no '00dc' frame parses as a JPEG. */
    def mjpegMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes == null || bytes.length < 24) return None
      if (cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ") return None
      var frames = 0
      var dims: Option[(Int, Int)] = None
      scanRiff(bytes, 12L, bytes.length.toLong) { (id, off, size) =>
        if (id == "00dc") {
          frames += 1
          if (dims.isEmpty) dims = jpegSofDims(bytes, off, size)
        }
      }
      dims.map { case (w, h) => (w, h, frames) }
    }

    /** Deterministic MJPEG-in-AVI encode: the same RIFF structure as
      * [[encodeAvi]] but the stream is 'MJPG' and every '00dc' chunk
      * payload is a REAL JPEG written by the JDK's ImageIO encoder.
      * With `advertiseDims = false` the avih and strf headers carry
      * ZERO dims/frames — the fixture for proving that metadata is
      * recovered from the frames ([[mjpegMeta]]), not the container. */
    def encodeMjpegAvi(w: Int, h: Int, frames: Int,
                       pixel: (Int, Int, Int) => Int,
                       advertiseDims: Boolean = true): Array[Byte] = {
      require(w > 0 && h > 0 && frames >= 0, "bad AVI dimensions")
      val jpegs = (0 until frames).map { f =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, pixel(f, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val out = new Array[Byte](8 + riffSize)
      var p = 0
      def chunkHeader(id: String, size: Int): Unit = {
        putCC(out, p, id); putU32(out, p + 4, size); p += 8
      }
      val adv = if (advertiseDims) 1 else 0
      chunkHeader("RIFF", riffSize); putCC(out, p, "AVI "); p += 4
      chunkHeader("LIST", hdrlSize); putCC(out, p, "hdrl"); p += 4
      chunkHeader("avih", 56)
      val avih = p
      putU32(out, avih, 100000)                  // usec/frame (10 fps)
      putU32(out, avih + 16, frames * adv)       // dwTotalFrames
      putU32(out, avih + 24, 1)                  // dwStreams
      putU32(out, avih + 32, w * adv); putU32(out, avih + 36, h * adv)
      p += 56
      chunkHeader("LIST", 4 + (8 + 56) + (8 + 40)); putCC(out, p, "strl"); p += 4
      chunkHeader("strh", 56)
      val strh = p
      putCC(out, strh, "vids"); putCC(out, strh + 4, "MJPG")
      putU32(out, strh + 20, 1)                  // dwScale
      putU32(out, strh + 24, 10)                 // dwRate → 10 fps
      putU32(out, strh + 32, frames * adv)       // dwLength
      p += 56
      chunkHeader("strf", 40)
      val bih = p
      putU32(out, bih, 40)                       // biSize
      putU32(out, bih + 4, w * adv); putU32(out, bih + 8, h * adv)
      out(bih + 12) = 1                          // biPlanes
      out(bih + 14) = 24                         // biBitCount
      putCC(out, bih + 16, "MJPG")               // biCompression
      p += 40
      chunkHeader("LIST", moviSize); putCC(out, p, "movi"); p += 4
      jpegs.foreach { j =>
        chunkHeader("00dc", j.length)
        System.arraycopy(j, 0, out, p, j.length)
        p += j.length
        if ((j.length & 1) == 1) { out(p) = 0; p += 1 } // word-align
      }
      out
    }

    /** REAL video resize: parse the container, nearest-neighbor scale
      * every raw frame, rebuild the AVI around the new dimensions.
      * None when the bytes are not an uncompressed AVI this codec can
      * re-frame (callers then decide: stub or pass through). */
    def resizeAvi(bytes: Array[Byte], factor: Double): Option[Array[Byte]] =
      decodeMeta(bytes).flatMap { case (w, h, frames) =>
        // header values are UNTRUSTED record content: bound them
        // against the payload length before any allocation or index
        // arithmetic. Each frame costs >= a chunk header (8 bytes) and
        // w*h raw pixels cost 3 bytes each, so a header whose claim
        // cannot physically fit in `bytes` is rejected up front — a
        // crafted dwTotalFrames can no longer pre-size a ~2^31 buffer,
        // and the per-frame bound below is computed in Long so huge
        // dims cannot overflow the guard negative.
        if (w <= 0 || h <= 0 || frames < 0 || frames > bytes.length / 8 ||
            w.toLong * h > bytes.length.toLong / 3) None
        else {
          // collect '00db' frame payload offsets in stream order
          val offs = new scala.collection.mutable.ArrayBuffer[Int]()
          scanRiff(bytes, 12L, bytes.length.toLong) { (id, off, _) =>
            if (id == "00db") offs += off
          }
          val rb = rowBytes(w) // safe: w*3+3 <= bytes.length+3 after the dim guard
          val frameLen = rb.toLong * h
          if (offs.size != frames ||
              offs.exists(_.toLong + frameLen > bytes.length)) None
          else {
            val w2 = math.max(1, (w * factor).toInt)
            val h2 = math.max(1, (h * factor).toInt)
            Some(encodeAvi(w2, h2, frames, (f, x, y) => {
              val sx = math.min(w - 1, (x.toLong * w / w2).toInt)
              val sy = math.min(h - 1, (y.toLong * h / h2).toInt)
              val row = offs(f) + (h - 1 - sy) * rb
              ((bytes(row + sx * 3 + 2) & 0xff) << 16) |
                ((bytes(row + sx * 3 + 1) & 0xff) << 8) |
                (bytes(row + sx * 3) & 0xff)
            }))
          }
        }
      }

    /** REAL compressed-video resize for MJPEG-in-AVI: every '00dc'
      * frame is a JPEG the JDK can decode — scale each frame's actual
      * pixels and rebuild the container (truthful headers) via
      * [[encodeMjpegAvi]]. None when the bytes are not an AVI whose
      * every '00dc' chunk ImageIO can read. */
    def resizeMjpeg(bytes: Array[Byte], factor: Double): Option[Array[Byte]] = {
      if (bytes == null || bytes.length < 24) return None
      if (cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ") return None
      val chunks = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      scanRiff(bytes, 12L, bytes.length.toLong) { (id, off, size) =>
        if (id == "00dc") chunks += ((off, size))
      }
      if (chunks.isEmpty) return None
      val imgs = chunks.map { case (o, s) =>
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes, o, s))
        catch { case _: Exception => null }
      }
      if (imgs.exists(_ == null)) return None
      val scaled = imgs.map(ImageCodec.resizePixels(_, factor))
      val (w2, h2) = (scaled.head.getWidth, scaled.head.getHeight)
      if (scaled.exists(i => i.getWidth != w2 || i.getHeight != h2)) return None
      Some(encodeMjpegAvi(w2, h2, scaled.size,
        (f, x, y) => scaled(f).getRGB(x, y) & 0xffffff))
    }

    /** Per-frame dHashes of the DECODED frame pixels, in stream
      * order: raw bottom-up DIB rows for '00db' streams (the
      * resizeAvi bounds applied — header claims are untrusted),
      * ImageIO-decoded JPEGs for '00dc' (MJPEG). None when the bytes
      * are not an AVI whose every frame decodes. */
    def frameDHashes(bytes: Array[Byte]): Option[Seq[Long]] = {
      decodeMeta(bytes) match {
        case Some((w, h, frames))
            if w > 0 && h > 0 && frames > 0 && frames <= bytes.length / 8 &&
              w.toLong * h <= bytes.length.toLong / 3 =>
          val offs = new scala.collection.mutable.ArrayBuffer[Int]()
          scanRiff(bytes, 12L, bytes.length.toLong) { (id, off, _) =>
            if (id == "00db") offs += off
          }
          val rb = rowBytes(w)
          val frameLen = rb.toLong * h
          if (offs.size == frames &&
              offs.forall(_.toLong + frameLen <= bytes.length))
            return Some(offs.map { o =>
              Multimodal.dHashFromPixels(w, h, (x, y) => {
                val row = o + (h - 1 - y) * rb
                ((bytes(row + x * 3 + 2) & 0xff) << 16) |
                  ((bytes(row + x * 3 + 1) & 0xff) << 8) |
                  (bytes(row + x * 3) & 0xff)
              })
            }.toSeq)
        case _ => ()
      }
      if (bytes == null || bytes.length < 24 ||
          cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ") return None
      val chunks = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      scanRiff(bytes, 12L, bytes.length.toLong) { (id, off, size) =>
        if (id == "00dc") chunks += ((off, size))
      }
      if (chunks.isEmpty) return None
      val imgs = chunks.map { case (o, s) =>
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes, o, s))
        catch { case _: Exception => null }
      }
      if (imgs.exists(_ == null)) None
      else Some(imgs.map(img => Multimodal.dHashFromPixels(
        img.getWidth, img.getHeight, (x, y) => img.getRGB(x, y))).toSeq)
    }

    /** Append a spec-legal JUNK chunk (ignored by every RIFF reader)
      * and patch the RIFF size — a byte-level layout variant of the
      * same content, the video analog of re-encoding an image in a
      * different lossless container. */
    def appendJunk(avi: Array[Byte], n: Int): Array[Byte] = {
      require(n >= 0 && (n & 1) == 0, "JUNK payload must be even (word-aligned)")
      val out = java.util.Arrays.copyOf(avi, avi.length + 8 + n)
      putCC(out, avi.length, "JUNK")
      putU32(out, avi.length + 4, n)
      putU32(out, 4, u32(avi, 4) + 8 + n)
      out
    }

    // ---- ISO-BMFF (MP4) container metadata ------------------------
    // H.264/H.265/VP9 sample data has no pure-JDK decoder, but the
    // CONTAINER is plain big-endian box arithmetic (ISO/IEC 14496-12),
    // the same class of work as the RIFF walker above: every box is
    // [size:u32][type:4cc][payload], size==1 → 64-bit largesize
    // follows, size==0 → box runs to end of file.

    private def u32be(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def u16be(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def u64be(b: Array[Byte], i: Int): Long =
      (u32be(b, i) << 32) | u32be(b, i + 4)

    /** Walk the direct children of `[from, to)`, invoking `f(type,
      * payloadStart, payloadEnd)`; malformed sizes stop the walk
      * (never throw — payloads are untrusted record content). */
    private def walkBoxes(b: Array[Byte], from: Long, to: Long)
                         (f: (String, Long, Long) => Unit): Unit = {
      var off = from
      while (off + 8 <= to) {
        val size0 = u32be(b, off.toInt)
        val typ = cc(b, off.toInt + 4)
        var hdr = 8L
        var size = size0
        if (size0 == 1L) {
          if (off + 16 > to) return
          size = u64be(b, off.toInt + 8); hdr = 16L
        } else if (size0 == 0L) size = to - off
        // Overflow-safe bound: `to - off` is small and non-negative,
        // while a hostile 64-bit largesize near 2^63 would wrap
        // `off + size` negative and sail past an `off + size > to`
        // check (then index with a garbage Int below).
        if (size < hdr || size > to - off) return
        f(typ, off + hdr, off + size)
        off += size
      }
    }

    /** (width, height, frames, codec4cc, durationMs) from the moov
      * tree: dims from the VIDEO trak's 'tkhd' (16.16 fixed),
      * duration from 'mvhd' (movie-timescale units → ms), frame count
      * from that trak's 'stsz' sample_count, codec id from its 'stsd'
      * sample entry. Only the trak whose mdia/hdlr handler is 'vide'
      * contributes codec/frames — a muxed file with the audio trak
      * first must NOT report 'mp4a' and the AAC sample count for a
      * video asset. None when the bytes are not ISO-BMFF (must start
      * with 'ftyp' or 'moov') or no video track parses. Never
      * consults sample data — this is container metadata, not codec
      * decode; actual H.264/H.265/VP9 frame decode stays behind the
      * labelled stub. */
    def mp4Meta(bytes: Array[Byte]): Option[(Int, Int, Int, String, Long)] = {
      if (bytes == null || bytes.length < 16) return None
      val first = cc(bytes, 4)
      if (first != "ftyp" && first != "moov") return None
      var w = 0; var h = 0; var frames = 0
      var codec = ""; var durMs = 0L
      walkBoxes(bytes, 0L, bytes.length.toLong) { (typ, ps, pe) =>
        if (typ == "moov") walkBoxes(bytes, ps, pe) { (t2, s2, e2) =>
          if (t2 == "mvhd" && e2 - s2 >= 20) {
            val ver = bytes(s2.toInt) & 0xff
            val (ts, dur) =
              if (ver == 1 && e2 - s2 >= 32)
                (u32be(bytes, s2.toInt + 20), u64be(bytes, s2.toInt + 24))
              else (u32be(bytes, s2.toInt + 12), u32be(bytes, s2.toInt + 16))
            // overflow-safe ms: a hostile 64-bit duration (possibly
            // with bit 63 set → negative Long) must not wrap the
            // ×1000. Split whole/remainder (rem < ts ≤ 2^32 →
            // rem*1000 < 2^42) and saturate the absurd tail. The
            // bound is STRICTLY-below MaxValue/1000: at whole ==
            // MaxValue/1000 exactly, whole·1000 + a 3-digit remainder
            // already exceeds MaxValue (…775000 + 999 > …775807).
            if (ts > 0 && dur >= 0) {
              val whole = dur / ts
              durMs =
                if (whole >= Long.MaxValue / 1000L) Long.MaxValue
                else whole * 1000L + (dur % ts) * 1000L / ts
            }
          } else if (t2 == "trak") {
            // gather per-trak, commit only if this trak is video
            var tw = 0; var th = 0; var tCodec = ""; var tFrames = 0
            var handler = ""
            walkBoxes(bytes, s2, e2) { (t3, s3, e3) =>
              if (t3 == "tkhd") {
                val ver = bytes(s3.toInt) & 0xff
                val dimOff = if (ver == 1) 88 else 76
                if (e3 - s3 >= dimOff + 8) {
                  // 16.16 fixed point; a sound track carries zeros
                  tw = (u32be(bytes, s3.toInt + dimOff) >> 16).toInt
                  th = (u32be(bytes, s3.toInt + dimOff + 4) >> 16).toInt
                }
              } else if (t3 == "mdia") walkBoxes(bytes, s3, e3) { (t4, s4, e4) =>
                if (t4 == "hdlr" && e4 - s4 >= 12)
                  handler = cc(bytes, s4.toInt + 8)
                else if (t4 == "minf") walkBoxes(bytes, s4, e4) { (t5, s5, e5) =>
                  if (t5 == "stbl") walkBoxes(bytes, s5, e5) { (t6, s6, e6) =>
                    if (t6 == "stsd" && e6 - s6 >= 16 && tCodec.isEmpty) {
                      // verflags(4) entry_count(4), then the first
                      // sample entry: [size:u32][codec:4cc]...
                      if (u32be(bytes, s6.toInt + 4) >= 1)
                        tCodec = cc(bytes, s6.toInt + 12)
                    } else if (t6 == "stsz" && e6 - s6 >= 12 && tFrames == 0)
                      // saturate like mp3Meta/flacMeta: a hostile
                      // sample_count ≥ 2^31 must not wrap negative
                      tFrames = math.min(u32be(bytes, s6.toInt + 8),
                        Int.MaxValue.toLong).toInt
                  }
                }
              }
            }
            // 'vide' is authoritative; a missing hdlr falls back to
            // the tkhd-dims heuristic (sound traks carry zero dims)
            val isVideo = handler == "vide" || (handler.isEmpty && tw > 0 && th > 0)
            if (isVideo && w == 0 && tw > 0 && th > 0) {
              w = tw; h = th; codec = tCodec; frames = tFrames
            }
          }
        }
      }
      if (w > 0 && h > 0 && codec.nonEmpty) Some((w, h, frames, codec, durMs))
      else None
    }

    /** Deterministic minimal ISO-BMFF encode: ftyp + moov { mvhd,
      * trak { tkhd, mdia { mdhd, hdlr(vide), minf { vmhd, dinf/dref,
      * stbl { stsd(codec sample entry), stts, stsc, stsz, stco } } } } }
      * + empty mdat. Carries REAL container metadata (dims, timescale
      * 1000, `frames` samples at 40 ms each → 25 fps) around a codec
      * payload this environment cannot synthesize — the honest
      * container-level fixture for [[mp4Meta]]. With
      * `audioTrackFirst` an 'mp4a'/'soun' trak (zero tkhd dims, a
      * deliberately larger stsz sample count) precedes the video trak
      * — the standard muxed layout that must NOT leak its codec or
      * sample count into the video metadata. */
    def encodeMp4(w: Int, h: Int, frames: Int, codec: String,
                  audioTrackFirst: Boolean = false): Array[Byte] = {
      require(w > 0 && h > 0 && frames >= 0 && codec.length == 4, "bad MP4 params")
      def be32(v: Long): Array[Byte] = Array(
        (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
      def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
        val len = 8 + parts.map(_.length).sum
        val out = new Array[Byte](len)
        System.arraycopy(be32(len.toLong), 0, out, 0, 4)
        System.arraycopy(fourcc(typ), 0, out, 4, 4)
        var p = 8
        parts.foreach { b => System.arraycopy(b, 0, out, p, b.length); p += b.length }
        out
      }
      val durMovie = frames.toLong * 40L // timescale 1000, 25 fps
      val identityMatrix = be32(0x00010000L) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000L) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000L)
      val ftyp = box("ftyp", fourcc("isom"), be32(0x200L),
        fourcc("isom"), fourcc("mp42"))
      val mvhd = box("mvhd", be32(0), be32(0), be32(0),
        be32(1000L), be32(durMovie),                 // timescale, duration
        be32(0x00010000L), be16(0x0100), be16(0),    // rate, volume, rsvd
        be32(0), be32(0), identityMatrix,
        new Array[Byte](24), be32(2))                // pre_defined, next track
      val tkhd = box("tkhd", be32(3),                // v0, enabled+in-movie
        be32(0), be32(0), be32(1), be32(0),          // times, track 1, rsvd
        be32(durMovie), new Array[Byte](8),
        be16(0), be16(0), be16(0), be16(0),          // layer, group, volume
        identityMatrix,
        be32(w.toLong << 16), be32(h.toLong << 16))  // 16.16 fixed dims
      val mdhd = box("mdhd", be32(0), be32(0), be32(0),
        be32(1000L), be32(durMovie), be16(0x55c4), be16(0)) // 'und'
      val hdlr = box("hdlr", be32(0), be32(0), fourcc("vide"),
        new Array[Byte](12), Array[Byte](0))
      val vmhd = box("vmhd", be32(1), be16(0), be16(0), be16(0), be16(0))
      val dinf = box("dinf", box("dref", be32(0), be32(1),
        box("url ", be32(1)))) // flag 1: data in this file
      val sampleEntry = box(codec,
        new Array[Byte](6), be16(1),                 // reserved, dref idx
        be16(0), be16(0), new Array[Byte](12),
        be16(w), be16(h),
        be32(0x00480000L), be32(0x00480000L),        // 72 dpi
        be32(0), be16(1),                            // frame_count 1
        new Array[Byte](32),                         // compressorname
        be16(0x18), be16(0xffff))
      val stsd = box("stsd", be32(0), be32(1), sampleEntry)
      val stts = box("stts", be32(0), be32(1), be32(frames.toLong), be32(40L))
      val stsc = box("stsc", be32(0), be32(1), be32(1), be32(frames.toLong), be32(1))
      val stsz = box("stsz", be32(0), be32(256L), be32(frames.toLong))
      val stco = box("stco", be32(0), be32(0))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = box("minf", vmhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      val moov =
        if (!audioTrackFirst) box("moov", mvhd, trak)
        else {
          val aTkhd = box("tkhd", be32(3), be32(0), be32(0), be32(2),
            be32(0), be32(durMovie), new Array[Byte](8),
            be16(0), be16(0), be16(0x0100), be16(0),    // audio volume
            identityMatrix, be32(0), be32(0))            // zero dims
          val aHdlr = box("hdlr", be32(0), be32(0), fourcc("soun"),
            new Array[Byte](12), Array[Byte](0))
          val aEntry = box("mp4a", new Array[Byte](6), be16(1),
            new Array[Byte](8), be16(2), be16(16), be32(0),
            be32(44100L << 16))
          val aStsd = box("stsd", be32(0), be32(1), aEntry)
          val aFrames = frames.toLong * 40L + 7L // ≠ video count
          val aStbl = box("stbl", aStsd,
            box("stts", be32(0), be32(1), be32(aFrames), be32(1L)),
            box("stsc", be32(0), be32(1), be32(1), be32(aFrames), be32(1)),
            box("stsz", be32(0), be32(64L), be32(aFrames)),
            box("stco", be32(0), be32(0)))
          val aMinf = box("minf",
            box("smhd", be32(0), be16(0), be16(0)), dinf, aStbl)
          val aMdia = box("mdia", mdhd, aHdlr, aMinf)
          box("moov", mvhd, box("trak", aTkhd, aMdia), trak)
        }
      val mdat = box("mdat")
      ftyp ++ moov ++ mdat
    }

    // ---- Matroska/WebM (EBML) container metadata -------------------
    // The other dominant compressed-video container (VP8/VP9/AV1).
    // EBML is [id-varint][size-varint][payload] all the way down —
    // byte arithmetic again, no codec work: dims from
    // Tracks→TrackEntry→Video PixelWidth/Height, codec from CodecID,
    // duration from Info (Duration × TimecodeScale), frame count =
    // SimpleBlock/BlockGroup elements across Clusters (container
    // structure, not sample decode).

    private val EbmlId = 0x1A45DFA3L
    private val SegmentId = 0x18538067L
    private val InfoId = 0x1549A966L
    private val TimecodeScaleId = 0x2AD7B1L
    private val DurationId = 0x4489L
    private val TracksId = 0x1654AE6BL
    private val TrackEntryId = 0xAEL
    private val TrackTypeId = 0x83L
    private val CodecIdId = 0x86L
    private val VideoElId = 0xE0L
    private val PixelWidthId = 0xB0L
    private val PixelHeightId = 0xBAL
    private val ClusterId = 0x1F43B675L
    private val SimpleBlockId = 0xA3L
    private val BlockGroupId = 0xA0L

    /** Leading-zero-coded varint length from its first byte (0 = invalid). */
    private def vintLen(b0: Int): Int = {
      var mask = 0x80; var n = 1
      while (mask != 0) {
        if ((b0 & mask) != 0) return n
        mask >>= 1; n += 1
      }
      0
    }

    /** (value, nextOffset); for IDs the marker bit is KEPT (Matroska
      * convention), for sizes it is stripped; None on malformed or
      * out-of-range input. */
    private def readVint(b: Array[Byte], off: Long, end: Long,
                         keepMarker: Boolean): Option[(Long, Long)] = {
      if (off >= end) return None
      val n = vintLen(b(off.toInt) & 0xff)
      if (n == 0 || off + n > end) return None
      var v = (b(off.toInt) & 0xff).toLong
      if (!keepMarker) v &= (0xffL >> n)
      var i = 1
      while (i < n) { v = (v << 8) | (b(off.toInt + i) & 0xffL); i += 1 }
      Some((v, off + n))
    }

    private def ebmlUint(b: Array[Byte], from: Long, to: Long): Long = {
      var v = 0L; var i = from
      while (i < to && i - from < 8) { v = (v << 8) | (b(i.toInt) & 0xffL); i += 1 }
      v
    }

    private def ebmlFloat(b: Array[Byte], from: Long, to: Long): Double =
      (to - from) match {
        case 4 => java.lang.Float.intBitsToFloat(ebmlUint(b, from, to).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(ebmlUint(b, from, to))
        case _ => 0.0
      }

    /** Walk the direct child elements of `[from, to)`; unknown-size
      * elements (all-ones size varint) run to `to`. Malformed input
      * stops the walk — untrusted record content never throws. */
    private def walkEbml(b: Array[Byte], from: Long, to: Long)
                        (f: (Long, Long, Long) => Unit): Unit = {
      var off = from
      var ok = true
      while (ok && off < to) {
        val step = for {
          (id, p1) <- readVint(b, off, to, keepMarker = true)
          (size, p2) <- readVint(b, p1, to, keepMarker = false)
        } yield {
          val szLen = (p2 - p1).toInt
          // a size varint of n bytes carries 7n value bits; all-ones
          // means "unknown size" (streaming) → element runs to `to`
          val unknown = szLen < 9 && size == (1L << (7 * szLen)) - 1
          val pe = if (unknown) to else p2 + size
          if (pe > to) None else Some((id, p2, pe))
        }
        step.flatten match {
          case Some((id, ps, pe)) => f(id, ps, pe); off = pe
          case None => ok = false
        }
      }
    }

    private val BlockId = 0xA1L
    private val TrackNumberId = 0xD7L

    /** (width, height, frames, codecId, durationMs) from a Matroska/
      * WebM stream, or None when the bytes don't open with an EBML
      * header or carry no video track. Frames count ONLY the blocks
      * whose leading track-number varint matches the video track's
      * TrackNumber — a muxed file's audio blocks (typically 2-3× the
      * video blocks) must not inflate the frame count. Container
      * metadata only — VP8/VP9/AV1 sample decode stays behind the
      * labelled stub. */
    def webmMeta(bytes: Array[Byte]): Option[(Int, Int, Int, String, Long)] = {
      if (bytes == null || bytes.length < 8) return None
      val head = readVint(bytes, 0L, bytes.length.toLong, keepMarker = true)
      if (!head.exists(_._1 == EbmlId)) return None
      var w = 0; var h = 0
      var codec = ""; var tcScale = 1000000L; var durTicks = 0.0
      var videoTrack = -1L
      // per-track block tallies; resolved against videoTrack at the
      // end so Cluster-before-Tracks element order also works
      val blockCounts = new java.util.HashMap[Long, Int]()
      def countBlock(payloadStart: Long, payloadEnd: Long): Unit =
        readVint(bytes, payloadStart, payloadEnd, keepMarker = false)
          .foreach { case (track, _) =>
            blockCounts.merge(track, 1, (a, b) => a + b); ()
          }
      walkEbml(bytes, 0L, bytes.length.toLong) { (id, ps, pe) =>
        if (id == SegmentId) walkEbml(bytes, ps, pe) { (id2, s2, e2) =>
          if (id2 == InfoId) walkEbml(bytes, s2, e2) { (id3, s3, e3) =>
            if (id3 == TimecodeScaleId) tcScale = ebmlUint(bytes, s3, e3)
            else if (id3 == DurationId) durTicks = ebmlFloat(bytes, s3, e3)
          } else if (id2 == TracksId) walkEbml(bytes, s2, e2) { (id3, s3, e3) =>
            if (id3 == TrackEntryId) {
              var isVideo = false; var tw = 0; var th = 0; var tc = ""
              var trackNum = -1L
              walkEbml(bytes, s3, e3) { (id4, s4, e4) =>
                if (id4 == TrackTypeId) isVideo = ebmlUint(bytes, s4, e4) == 1L
                else if (id4 == TrackNumberId) trackNum = ebmlUint(bytes, s4, e4)
                else if (id4 == CodecIdId)
                  tc = new String(bytes, s4.toInt, (e4 - s4).toInt,
                    java.nio.charset.StandardCharsets.US_ASCII).takeWhile(_ != 0)
                else if (id4 == VideoElId) walkEbml(bytes, s4, e4) { (id5, s5, e5) =>
                  // saturate: an 8-byte hostile PixelWidth like
                  // 0x100000010 would .toInt-wrap to a plausible 16
                  if (id5 == PixelWidthId)
                    tw = math.min(ebmlUint(bytes, s5, e5), Int.MaxValue.toLong).toInt
                  else if (id5 == PixelHeightId)
                    th = math.min(ebmlUint(bytes, s5, e5), Int.MaxValue.toLong).toInt
                }
              }
              if (isVideo && w == 0 && tw > 0 && th > 0) {
                w = tw; h = th; codec = tc; videoTrack = trackNum
              }
            }
          } else if (id2 == ClusterId) walkEbml(bytes, s2, e2) { (id3, s3, e3) =>
            if (id3 == SimpleBlockId) countBlock(s3, e3)
            else if (id3 == BlockGroupId) walkEbml(bytes, s3, e3) { (id4, s4, e4) =>
              if (id4 == BlockId) countBlock(s4, e4)
            }
          }
        }
      }
      if (w > 0 && h > 0 && codec.nonEmpty) {
        val frames = blockCounts.getOrDefault(videoTrack, 0)
        Some((w, h, frames, codec,
          // hostile float Duration (sign-flipped / NaN / Inf) must
          // clamp, not surface as a negative or wrapped millisecond
          math.max(0L, (durTicks * tcScale / 1e6).round)))
      } else None
    }

    /** Deterministic minimal Matroska/WebM encode: EBML header +
      * Segment { Info(TimecodeScale 1 ms, Duration), Tracks {
      * TrackEntry(video, codecId, PixelWidth/Height) }, Cluster {
      * frames × SimpleBlock(1-byte placeholder payload) } }. Block
      * payloads are placeholders by design — the fixture proves the
      * container walk; codec sample data cannot be synthesized here.
      * With `withAudioTrack` an A_OPUS TrackEntry (track 2) precedes
      * the video entry and 3× as many track-2 SimpleBlocks interleave
      * the video blocks — the muxed layout whose audio blocks must
      * not inflate the video frame count. */
    def encodeWebm(w: Int, h: Int, frames: Int, codecId: String,
                   withAudioTrack: Boolean = false): Array[Byte] = {
      require(w > 0 && h > 0 && frames >= 0 && codecId.nonEmpty, "bad WebM params")
      def idBytes(id: Long): Array[Byte] = {
        val n = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
                else if (id <= 0xffffffL) 3 else 4
        (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
      }
      // fixed 8-byte size varint: 0x01 marker + 7 value bytes
      def sizeVint(n: Long): Array[Byte] =
        Array(0x01.toByte) ++ (0 until 7).map(i =>
          ((n >> (8 * (6 - i))) & 0xff).toByte)
      def el(id: Long, parts: Array[Byte]*): Array[Byte] = {
        val payload = parts.flatten.toArray
        idBytes(id) ++ sizeVint(payload.length.toLong) ++ payload
      }
      def uintPayload(v: Long): Array[Byte] = {
        var n = 1; while (n < 8 && (v >> (8 * n)) != 0) n += 1
        (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
      }
      val ebmlHeader = el(EbmlId,
        el(0x4286L, uintPayload(1)),                    // EBMLVersion
        el(0x42F7L, uintPayload(1)),                    // EBMLReadVersion
        el(0x4282L, "webm".getBytes("US-ASCII")),       // DocType
        el(0x4287L, uintPayload(4)), el(0x4285L, uintPayload(2)))
      val info = el(InfoId,
        el(TimecodeScaleId, uintPayload(1000000L)),     // 1 ms ticks
        el(DurationId, {                                // frames × 40 ms
          val bits = java.lang.Double.doubleToLongBits(frames * 40.0)
          (0 until 8).map(i => ((bits >> (8 * (7 - i))) & 0xff).toByte).toArray
        }))
      val videoEntry = el(TrackEntryId,
        el(0xD7L, uintPayload(1)),                      // TrackNumber
        el(0x73C5L, uintPayload(1)),                    // TrackUID
        el(TrackTypeId, uintPayload(1)),                // video
        el(CodecIdId, codecId.getBytes("US-ASCII")),
        el(VideoElId,
          el(PixelWidthId, uintPayload(w.toLong)),
          el(PixelHeightId, uintPayload(h.toLong))))
      val audioEntry = el(TrackEntryId,
        el(0xD7L, uintPayload(2)),                      // TrackNumber 2
        el(0x73C5L, uintPayload(2)),
        el(TrackTypeId, uintPayload(2)),                // audio
        el(CodecIdId, "A_OPUS".getBytes("US-ASCII")))
      val tracks =
        if (withAudioTrack) el(TracksId, audioEntry, videoEntry)
        else el(TracksId, videoEntry)
      def simpleBlock(track: Int, f: Int): Array[Byte] =
        // SimpleBlock: track varint(1) + s16 timecode + flags + payload
        el(SimpleBlockId, Array((0x80 | track).toByte,
          ((f * 40) >> 8).toByte, (f * 40).toByte,
          0x80.toByte, f.toByte))
      val blocks = (0 until frames).flatMap { f =>
        // muxed layout: ~3 audio blocks around every video frame —
        // they carry track 2 and must not count as video frames
        if (withAudioTrack)
          Seq(simpleBlock(2, f * 3), simpleBlock(1, f),
            simpleBlock(2, f * 3 + 1), simpleBlock(2, f * 3 + 2))
        else Seq(simpleBlock(1, f))
      }
      val cluster = el(ClusterId,
        (el(0xE7L, uintPayload(0L)) +: blocks): _*)     // Timecode 0
      ebmlHeader ++ el(SegmentId, info, tracks, cluster)
    }
  }

  /** Decode shallow features from the binary column: image payloads
    * through the real [[ImageCodec]] header read (frames = 1), audio
    * through the real [[AudioCodec]] container parse (sample rate,
    * channels, PCM frame count), video — and any payload no reader
    * recognizes — through [[StubCodec]]. mapPartitions with an
    * iterator-to-iterator body: constant memory per partition
    * regardless of asset size — the shape that survives 100 TB of
    * video. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "modality", "bytes").rdd
      .mapPartitions(_.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val modality = r.getAs[String]("modality")
        val (w, h, f, sr, ch) = modality match {
          case "image" =>
            ImageCodec.decodeDims(bytes) match {
              case Some((iw, ih)) => (iw, ih, 1, 0, 0)
              case None =>
                val (sw, sh, sf) = StubCodec.decodeHeader(bytes)
                (sw, sh, sf, 0, 0)
            }
          case "audio" =>
            // real container parse first (WAV/AIFF/AU via javax),
            // then the MPEG frame-header walk for MP3 payloads, then
            // the FLAC STREAMINFO bit unpack
            AudioCodec.decodeMeta(bytes)
              .orElse(AudioCodec.mp3Meta(bytes))
              .orElse(AudioCodec.flacMeta(bytes)) match {
              case Some((rate, chans, frames)) => (0, 0, frames, rate, chans)
              case None =>
                val (sw, sh, sf) = StubCodec.decodeHeader(bytes)
                (sw, sh, sf, 0, 0)
            }
          case "video" =>
            // container header first (covers DIB and well-formed
            // MJPEG); a missing or lying avih (zeroed dims) falls
            // through to reading the compressed frames themselves;
            // ISO-BMFF payloads go through the MP4 box walk
            VideoCodec.decodeMeta(bytes)
              .filter { case (vw, vh, _) => vw > 0 && vh > 0 }
              .orElse(VideoCodec.mjpegMeta(bytes))
              .orElse(VideoCodec.mp4Meta(bytes)
                .orElse(VideoCodec.webmMeta(bytes))
                .map { case (vw, vh, vf, _, _) => (vw, vh, vf) }) match {
              case Some((vw, vh, vf)) => (vw, vh, vf, 0, 0)
              case None =>
                val (sw, sh, sf) = StubCodec.decodeHeader(bytes)
                (sw, sh, sf, 0, 0)
            }
          case _ =>
            val (sw, sh, sf) = StubCodec.decodeHeader(bytes)
            (sw, sh, sf, 0, 0)
        }
        Row(r.getAs[Long]("asset_id"), modality,
          w, h, f, sr, ch, if (bytes == null) 0L else bytes.length.toLong)
      })
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling: one output row per sampled frame index —
    * `posexplode` fan-out on a sequence bounded by the decoded frame
    * count, `stride` frames apart. The explode happens before any
    * shuffle so downstream repartitioning sees frame-level rows. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .where(col("n_frames") > 0)
      .select(col("asset_id"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")

  /** Resize: a VISUAL op. REAL pixel scaling (decode →
    * nearest-neighbor scale → re-encode in the source format) for
    * image payloads `javax.imageio` can read; header-dim arithmetic
    * through [[StubCodec]] for image/video payloads no real reader
    * recognizes (the stub-header fixtures). Audio — and any other
    * non-visual modality — passes through BYTE-IDENTICAL: rewriting
    * the first 6 bytes of a WAV would corrupt its RIFF header. Same
    * iterator-to-iterator codec-boundary shape as [[decodeFeatures]]
    * — per-record, partition-local, constant memory, no closure UDF. */
  def resize(assets: DataFrame, factor: Double): DataFrame = {
    val spark = assets.sparkSession
    val schema = assets.schema
    val idx = schema.fieldIndex("bytes")
    val modIdx = schema.fieldIndex("modality")
    val rdd = assets.rdd.mapPartitions(_.map { r =>
      val bytes = r.getAs[Array[Byte]](idx)
      val modality = r.getAs[String](modIdx)
      val isVisual = modality == "image" || modality == "video"
      val out =
        if (!isVisual || bytes == null || bytes.length < 6) bytes
        else if (modality == "video")
          // real AVI → re-framed container with scaled raw frames;
          // MJPEG → per-frame JPEG decode/scale/re-encode (frames are
          // real JPEGs, so this is actual pixel work); MP4/WebM
          // (codec frames we cannot re-encode) → BYTE-IDENTICAL
          // pass-through — mangling a real container through the
          // stub's fake-header arithmetic would corrupt it;
          // stub-header video fixtures → header arithmetic
          VideoCodec.resizeAvi(bytes, factor)
            .orElse(VideoCodec.resizeMjpeg(bytes, factor)).getOrElse {
            // REAL containers that failed their resizer (truncated
            // MJPEG frame, avih/chunk-count mismatch, MP4/WebM codec
            // frames) pass through byte-identical — falling into the
            // stub branch would reinterpret 'RIFF'+size as fake dims
            // and rewrite them, corrupting the payload
            if (VideoCodec.isRiff(bytes) ||
                VideoCodec.mp4Meta(bytes).isDefined ||
                VideoCodec.webmMeta(bytes).isDefined) bytes
            else {
              val (w, h, f) = StubCodec.decodeHeader(bytes)
              StubCodec.encodeHeader((w * factor).toInt, (h * factor).toInt, f,
                bytes.drop(6))
            }
          }
        else ImageCodec.decode(bytes) match {
          case Some(img) =>
            // re-encode in the SOURCE container format so the bytes
            // stay consistent with meta.mime (a BMP in must be a BMP
            // out); png only when the format can't be sniffed
            ImageCodec.encode(ImageCodec.resizePixels(img, factor),
              ImageCodec.formatName(bytes).getOrElse("png"))
          case None =>
            val (w, h, f) = StubCodec.decodeHeader(bytes)
            StubCodec.encodeHeader((w * factor).toInt, (h * factor).toInt, f,
              bytes.drop(6))
        }
      Row.fromSeq(r.toSeq.updated(idx, out))
    })
    spark.createDataFrame(rdd, schema)
  }

  /** dHash core over any pixel accessor — shared by the image path
    * (BufferedImage.getRGB) and the per-frame video path (raw DIB
    * rows / decoded MJPEG frames). */
  private[graft] def dHashFromPixels(w: Int, h: Int,
                                     rgb: (Int, Int) => Int): Long = {
    val g = new Array[Int](72) // 9 cols × 8 rows, row-major
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val p = rgb(math.min(w - 1, x * w / 9), math.min(h - 1, y * h / 8))
        g(y * 9 + x) = (((p >> 16) & 0xff) * 299 +
          ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var bit = 0
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) hash |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    hash
  }

  /** 64-bit difference hash (dHash) of the DECODED pixels — the
    * standard perceptual image fingerprint: 9×8 grayscale grid
    * (nearest-neighbor point sampling, explicit integer arithmetic —
    * no platform-dependent interpolation), one bit per horizontal
    * gradient sign. Container-invariant by construction: any lossless
    * re-encode (PNG/BMP/TIFF) of the same pixels hashes identically,
    * and lossy re-encodes (JPEG) land within a small Hamming
    * distance — which is what makes Hamming-bucketed image dedup
    * work. None when the bytes decode to no image. */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    ImageCodec.decode(bytes).map(img =>
      dHashFromPixels(img.getWidth, img.getHeight, (x, y) => img.getRGB(x, y)))

  /** (id, sig) table from a per-asset 64-bit fingerprint, ready for
    * [[Dedup.hammingPairs]] — the shared shape of the image/audio/
    * video signature paths. Partition-local decode (the mapPartitions
    * codec boundary, like [[decodeFeatures]]); unfingerprintable rows
    * drop. */
  private def sigTable(assets: DataFrame,
                       fingerprint: Array[Byte] => Option[Long]): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "bytes").rdd.mapPartitions(_.flatMap { r =>
      fingerprint(r.getAs[Array[Byte]]("bytes"))
        .map(s => org.apache.spark.sql.Row(r.getLong(0), s))
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sig", LongType, nullable = false))))
  }

  /** 64-bit energy-profile fingerprint of REALLY-decoded PCM — the
    * audio analog of [[dHash64]]: the sample stream splits into 65
    * equal windows, each window's energy is an INTEGER
    * sum-of-squares (Long — no float anywhere, so the hash is
    * bit-deterministic), one bit per adjacent-window energy
    * gradient. Container-invariant by construction: WAV/AIFF/AU of
    * the same samples decode to identical values (endianness lives
    * in the container), so re-encodes hash identically. None when
    * the bytes don't decode to ≥ 65 16-bit PCM samples. */
  def audioFingerprint64(bytes: Array[Byte]): Option[Long] =
    AudioCodec.decodePcm(bytes).collect {
      case (_, _, samples) if samples.length >= 65 =>
        val n = samples.length
        val e = new Array[Long](65)
        var w = 0
        while (w < 65) {
          val from = w * n / 65
          val until = (w + 1) * n / 65
          var acc = 0L
          var j = from
          while (j < until) {
            acc += samples(j).toLong * samples(j); j += 1
          }
          e(w) = acc
          w += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (e(b + 1) > e(b)) hash |= 1L << b
          b += 1
        }
        hash
    }

  /** (id, sig) audio-fingerprint table, ready for
    * [[Dedup.hammingPairs]] — same shape as [[imageDHashes]]. */
  def audioFingerprints(assets: DataFrame): DataFrame =
    sigTable(assets, audioFingerprint64)

  def audioNearDupPairs(assets: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs(audioFingerprints(assets), maxHamming)

  /** Layout-invariant video CONTENT hash: FNV-style chain of the
    * per-frame dHashes ([[VideoCodec.frameDHashes]]) — two AVIs with
    * byte-different container layout (chunk order, JUNK padding) but
    * identical decoded frames hash identically; any frame edit
    * changes it. Chain, not set: frame ORDER is content. */
  def videoContentHash64(bytes: Array[Byte]): Option[Long] =
    VideoCodec.frameDHashes(bytes).map(
      _.foldLeft(0xcbf29ce484222325L)((h, d) => (h ^ d) * 0x100000001b3L))

  /** (id, sig) video content-hash table + exact content-dup pairs
    * (Hamming 0 through the same pigeonhole machinery — identical
    * chains share every chunk). */
  def videoContentHashes(assets: DataFrame): DataFrame =
    sigTable(assets, videoContentHash64)

  def videoDupPairs(assets: DataFrame): DataFrame =
    Dedup.hammingPairs(videoContentHashes(assets), maxHamming = 0)

  /** [[syntheticImageDupAssets]] for video: frame content depends
    * only on the GROUP id (i % 16); the three variants per group are
    * byte-DIFFERENT layouts of the same DIB AVI content (plain, +64B
    * JUNK, +256B JUNK), so content-hash dedup must pair them while
    * byte-level dedup cannot. */
  def syntheticVideoDupAssets(spark: SparkSession, n: Int): DataFrame = {
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val g = (i % 16).toInt
      val base = VideoCodec.encodeAvi(16 + (g % 3) * 8, 12 + (g % 2) * 8,
        3 + (g % 3), (f, x, y) =>
          (((g * 2654435761L + f * 40503L +
            (y * 31L + x) * 2246822519L) >> 8) & 0xffffff).toInt)
      val bytes = (i % 3).toInt match {
        case 0 => base
        case 1 => VideoCodec.appendJunk(base, 64)
        case _ => VideoCodec.appendJunk(base, 256)
      }
      Row(i, "video", bytes, Row(s"grp$g", "video/avi"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** [[syntheticImageDupAssets]] for the audio modality: PCM content
    * depends only on the GROUP id (i % 16) while the container
    * cycles WAV/AIFF/AU — each group is the same audio stored three
    * ways, so the oracle derives the full expected pair inventory
    * (all within-group pairs at Hamming 0) from index arithmetic. */
  def syntheticAudioDupAssets(spark: SparkSession, n: Int): DataFrame = {
    val containers = Seq("wav", "aiff", "au")
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val g = (i % 16).toInt
      val container = containers((i % containers.length).toInt)
      Row(i, "audio",
        AudioCodec.encodePcm(8000 + (g % 2) * 8000,
          400 + (g % 5) * 100, seed = g * 17L + 3L, container),
        Row(s"grp$g", s"audio/$container"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** (id, sig) perceptual-hash table of an asset frame — the image
    * analog of [[Dedup.signatureTable]], ready for
    * [[Dedup.hammingPairs]]. Partition-local decode (the mapPartitions
    * codec boundary, like [[decodeFeatures]]); undecodable rows drop. */
  def imageDHashes(assets: DataFrame): DataFrame =
    sigTable(assets, dHash64)

  /** Near-duplicate image pairs at Hamming ≤ maxHamming over the
    * dHash signatures — pigeonhole-bucketed ([[Dedup.hammingPairs]]),
    * never all-pairs: exhaustive for maxHamming < chunks. */
  def imageNearDupPairs(assets: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs(imageDHashes(assets), maxHamming)

  /** [[syntheticImageAssets]] variant for the dedup gate: pixel
    * content depends only on the GROUP id (i % 16) while the
    * container cycles through the lossless trio (PNG/BMP/TIFF), so
    * each group is the same image stored three ways — the oracle
    * derives the full expected pair inventory (all within-group
    * pairs at Hamming 0) from the index arithmetic alone. JPEG/GIF
    * are deliberately absent here: JPEG decode is lossy and GIF
    * palette-quantizes, so their copies land NEAR zero, not at it
    * (that robustness is spec-asserted, not oracle-pinned). */
  def syntheticImageDupAssets(spark: SparkSession, n: Int): DataFrame = {
    val formats = Seq("png", "bmp", "tiff")
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val g = (i % 16).toInt
      val w = 16 + (g % 4) * 4
      val h = 12 + (g % 3) * 4
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // per-pixel MIXED color (not a smooth gradient): a gradient
          // makes every row's brightness monotone, which collapses
          // all dHashes toward the same bit pattern and would create
          // false cross-group Hamming-0 pairs
          img.setRGB(x, y, (((g * 2654435761L +
            (y * 31L + x) * 2246822519L) >> 8) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val format = formats((i % formats.length).toInt)
      Row(i, "image", ImageCodec.encode(img, format),
        Row(s"grp$g", s"image/$format"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Synthesize a deterministic REAL-image asset table: every row is
    * an actual PNG / JPEG / GIF / BMP / TIFF (cycling on i%5 —
    * proving multi-format dispatch across all five containers the JDK
    * ships readers for) encoded on the executors from index-derived
    * dims and pixels. Decoding these through [[decodeFeatures]]
    * exercises the real `javax.imageio` path, and the dims are pure
    * arithmetic on the index, so an oracle can replay them without
    * seeing the bytes: width = 16 + (i%8)·4, height = 12 + (i%5)·4.
    * (JPEG is lossy and GIF quantizes, but dimensions live in the
    * container header, so the oracle contract is unaffected; TIFF,
    * like PNG/BMP, round-trips pixels losslessly.) */
  def syntheticImageAssets(spark: SparkSession, n: Int): DataFrame = {
    val formats = Seq("png", "jpeg", "gif", "bmp", "tiff")
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val w = 16 + (i % 8).toInt * 4
      val h = 12 + (i % 5).toInt * 4
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((i * 2654435761L + y * w + x) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val format = formats((i % formats.length).toInt)
      Row(i, "image", ImageCodec.encode(img, format),
        Row(s"src${i % formats.length}", s"image/$format"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Synthesize a deterministic REAL-audio asset table: every row a
    * 16-bit PCM WAV encoded on the executors with index-derived
    * properties an oracle can replay without the bytes: sample_rate ∈
    * {8000,11025,16000,22050}[i%4], channels 1+(i%2), pcm frames
    * 500 + (i%7)·250. */
  def syntheticAudioAssets(spark: SparkSession, n: Int): DataFrame = {
    val rates = Seq(8000, 11025, 16000, 22050)
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val rate = rates((i % 4).toInt)
      val channels = 1 + (i % 2).toInt
      val frames = 500 + (i % 7).toInt * 250
      Row(i, "audio", AudioCodec.encodeWav(rate, channels, frames, seed = i),
        Row(s"src${i % 4}", "audio/wav"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Synthesize a deterministic REAL-video asset table: every row an
    * uncompressed DIB AVI encoded on the executors with index-derived
    * properties an oracle can replay without the bytes: width =
    * 16 + (i%6)·4, height = 12 + (i%4)·4, frames = 6 + (i%5)·3.
    * Pixels are index-derived so resize tests have real content. */
  def syntheticVideoAssets(spark: SparkSession, n: Int): DataFrame = {
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val w = 16 + (i % 6).toInt * 4
      val h = 12 + (i % 4).toInt * 4
      val frames = 6 + (i % 5).toInt * 3
      val avi = VideoCodec.encodeAvi(w, h, frames,
        (f, x, y) => ((i * 2654435761L + f * 8191 + y * w + x) & 0xffffff).toInt)
      Row(i, "video", avi, Row(s"src${i % 4}", "video/avi"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Synthesize a deterministic REAL MJPEG asset table: every frame
    * an actual ImageIO-encoded JPEG inside a '00dc' chunk, and the
    * container header deliberately advertises NOTHING (zeroed avih /
    * strf dims and frame counts) — decoding must recover width and
    * height from the first frame's JPEG SOF marker and the frame
    * count from the '00dc' chunks, i.e. from the compressed stream
    * itself. Properties are index-derived so an oracle replays them
    * without the bytes: width 16+(i%6)·4, height 12+(i%4)·4, frames
    * 4+(i%3)·2. */
  def syntheticMjpegAssets(spark: SparkSession, n: Int): DataFrame = {
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val w = 16 + (i % 6).toInt * 4
      val h = 12 + (i % 4).toInt * 4
      val frames = 4 + (i % 3).toInt * 2
      val avi = VideoCodec.encodeMjpegAvi(w, h, frames,
        (f, x, y) => ((i * 2654435761L + f * 8191 + y * w + x) & 0xffffff).toInt,
        advertiseDims = false)
      Row(i, "video", avi, Row(s"src${i % 4}", "video/avi"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Compressed-video container metadata as a relation: (asset_id,
    * width, height, n_frames, codec, duration_ms) from each payload's
    * container structure — ISO-BMFF box tree ([[VideoCodec.mp4Meta]])
    * or Matroska/WebM EBML tree ([[VideoCodec.webmMeta]]), dispatched
    * per record by magic bytes; NULL-dim rows for payloads neither
    * parser recognizes. Same iterator-to-iterator partition-local
    * shape as [[decodeFeatures]] — constant memory, no closure UDF,
    * survives 100 TB of video. */
  val containerMetaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("codec", StringType),
    StructField("duration_ms", LongType)))

  def containerMetadata(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "bytes").rdd.mapPartitions(_.map { r =>
      val id = r.getAs[Long]("asset_id")
      val bytes = r.getAs[Array[Byte]]("bytes")
      VideoCodec.mp4Meta(bytes).orElse(VideoCodec.webmMeta(bytes)) match {
        case Some((w, h, f, codec, durMs)) => Row(id, w, h, f, codec, durMs)
        case None => Row(id, null, null, null, null, null)
      }
    })
    spark.createDataFrame(rdd, containerMetaSchema)
  }

  /** Synthesize a deterministic MP4 asset table: every row a real
    * ISO-BMFF box tree ([[VideoCodec.encodeMp4]]) whose properties
    * are index-derived so an oracle replays them without the bytes:
    * width 16+(i%6)·4, height 12+(i%4)·4, frames 5+(i%4)·3, codec
    * {avc1,hev1,vp09,mp4v}[i%4], duration frames·40 ms (25 fps at
    * movie timescale 1000). Sample data is absent by design — no
    * pure-JDK H.264/H.265/VP9 decoder exists, so the fixture proves
    * the container walk, never pretends to decode. */
  def syntheticMp4Assets(spark: SparkSession, n: Int): DataFrame = {
    val codecs = Seq("avc1", "hev1", "vp09", "mp4v")
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val w = 16 + (i % 6).toInt * 4
      val h = 12 + (i % 4).toInt * 4
      val frames = 5 + (i % 4).toInt * 3
      val mp4 = VideoCodec.encodeMp4(w, h, frames, codecs((i % 4).toInt))
      Row(i, "video", mp4, Row(s"src${i % 4}", "video/mp4"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Synthesize a deterministic MP3 asset table: every row a real
    * MPEG-1 Layer III frame stream ([[AudioCodec.encodeMp3]]) behind
    * an ID3v2 tag, with index-derived properties an oracle replays
    * without the bytes: sample_rate {44100,48000,32000}[i%3],
    * channels 1+(i%2), mpeg frames 10+(i%5)·4 (→ PCM frames ×1152),
    * bitrate {64,128,192,320}[i%4] kbps. */
  def syntheticMp3Assets(spark: SparkSession, n: Int): DataFrame = {
    val rates = Seq(44100, 48000, 32000)
    val bitrates = Seq(64, 128, 192, 320)
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val rate = rates((i % 3).toInt)
      val channels = 1 + (i % 2).toInt
      val frames = 10 + (i % 5).toInt * 4
      val mp3 = AudioCodec.encodeMp3(rate, channels, frames, bitrates((i % 4).toInt))
      Row(i, "audio", mp3, Row(s"src${i % 4}", "audio/mpeg"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Synthesize a deterministic FLAC asset table: every row a real
    * STREAMINFO header ([[AudioCodec.encodeFlac]]) with index-derived
    * properties an oracle replays without the bytes: sample_rate
    * {44100,48000,96000}[i%3], channels 1+(i%2), total samples
    * 1000+(i%7)·500. */
  def syntheticFlacAssets(spark: SparkSession, n: Int): DataFrame = {
    val rates = Seq(44100, 48000, 96000)
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val rate = rates((i % 3).toInt)
      val channels = 1 + (i % 2).toInt
      val samples = 1000 + (i % 7).toInt * 500
      Row(i, "audio", AudioCodec.encodeFlac(rate, channels, samples),
        Row(s"src${i % 4}", "audio/flac"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Synthesize a deterministic Matroska/WebM asset table: every row
    * a real EBML element tree ([[VideoCodec.encodeWebm]]) whose
    * properties are index-derived so an oracle replays them without
    * the bytes: width 16+(i%6)·4, height 12+(i%4)·4, frames
    * 3+(i%5)·2, codec {V_VP8,V_VP9,V_AV1}[i%3], duration frames·40
    * ms. Block payloads are placeholders — the fixture proves the
    * EBML walk, never pretends to decode VP8/VP9/AV1. */
  def syntheticWebmAssets(spark: SparkSession, n: Int): DataFrame = {
    val codecs = Seq("V_VP8", "V_VP9", "V_AV1")
    val rdd = spark.range(n.toLong).rdd.map { i =>
      val w = 16 + (i % 6).toInt * 4
      val h = 12 + (i % 4).toInt * 4
      val frames = 3 + (i % 5).toInt * 2
      val webm = VideoCodec.encodeWebm(w, h, frames, codecs((i % 3).toInt))
      Row(i, "video", webm, Row(s"src${i % 4}", "video/webm"))
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Synthesize a deterministic asset table for tests/demos. */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val w = 64 + (i % 8) * 16
      val h = 48 + (i % 5) * 16
      val frames = if (i % 3 == 2) 24 + i % 10 else 1
      val payload = Array.tabulate[Byte](32)(j => ((i * 31 + j) % 127).toByte)
      Row(i.toLong,
        Seq("image", "audio", "video")(i % 3),
        StubCodec.encodeHeader(w, h, frames, payload),
        Row(s"src${i % 4}", Seq("image/png", "audio/wav", "video/mp4")(i % 3)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), assetSchema)
  }
}
