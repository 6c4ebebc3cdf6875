package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dims, Quality}

/** Property-based checks (SURVEY.md §5.4): sentinel∘cast totality,
  * decode-map semantics, top-k ≡ sort-limit. ScalaCheck generators
  * driven directly (the scalatestplus bridge isn't in the offline
  * dependency cache), fixed seed for reproducibility. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Evaluate `f` over `n` deterministic samples of `gen`. */
  private def forSamples[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var seed = rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val junkGen: Gen[String] = Gen.oneOf(
    Gen.numStr.map(s => s.take(9)), Gen.alphaStr.map(_.take(6)),
    Gen.const("-8"), Gen.const("0"), Gen.const(""), Gen.const("J"))

  test("sentinelCast never throws; sentinels → NULL exactly; numerics survive") {
    forSamples(Gen.listOfN(30, junkGen), 20) { values =>
      val sentinels = Seq("-8", "J")
      val out = values.toDF("c")
        .select(col("c"), Quality.sentinelCast(col("c"), sentinels, LongType).as("r"))
        .as[(String, Option[Long])].collect()
      out.foreach { case (in, res) =>
        if (sentinels.contains(in)) assert(res.isEmpty)
        else if (in.nonEmpty && in.forall(_.isDigit) && in.length <= 9)
          assert(res.contains(in.toLong))
        else if (!in.forall(_.isDigit) || in.isEmpty) assert(res.isEmpty)
      }
    }
  }

  test("decode: mapped keys decode, unmapped keys → NULL (totality)") {
    val mapping = Seq[(Any, String)](1 -> "one", 2 -> "two", 7 -> "seven")
    forSamples(Gen.listOfN(25, Gen.chooseNum(-5, 15)), 20) { keys =>
      val out = keys.toDF("k")
        .select(col("k"), Dims.decode(col("k"), mapping).as("r"))
        .as[(Int, Option[String])].collect()
      val m = mapping.map { case (k, v) => k.asInstanceOf[Int] -> v }.toMap
      out.foreach { case (k, r) => assert(r == m.get(k)) }
    }
  }

  test("container metadata parsers never throw on arbitrary bytes") {
    import graft.operators.Multimodal.VideoCodec
    // payloads are untrusted record content: random bytes, random
    // mutations of VALID containers (flipped sizes/ids/truncations),
    // and pathological prefixes must all return None or a value —
    // never throw. Driver-side loop: these are plain byte parsers.
    import graft.operators.Multimodal.AudioCodec
    val valid = Seq(
      VideoCodec.encodeMp4(64, 48, 12, "avc1"),
      VideoCodec.encodeWebm(64, 48, 12, "V_VP9"),
      VideoCodec.encodeAvi(8, 4, 2, (_, _, _) => 0),
      AudioCodec.encodeMp3(44100, 2, 6, 128),
      AudioCodec.encodeFlac(44100, 2, 1000))
    val mutGen = for {
      base <- Gen.oneOf(valid)
      nMut <- Gen.choose(1, 8)
      muts <- Gen.listOfN(nMut, for {
        pos <- Gen.choose(0, base.length - 1)
        b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
      } yield (pos, b))
      cut <- Gen.choose(1, base.length)
    } yield {
      val arr = base.take(cut)
      muts.foreach { case (p, b) => if (p < arr.length) arr(p) = b }
      arr
    }
    // BMFF boxes with size0==1 and a hostile 64-bit largesize near
    // 2^63: positive, so it passes a `size < hdr` check, but would
    // wrap `off + size` negative without the overflow-safe bound
    val hugeBoxGen = for {
      typ <- Gen.oneOf("ftyp", "moov", "trak", "mdia")
      largesize <- Gen.choose(Long.MaxValue - Int.MaxValue, Long.MaxValue)
      tail <- Gen.choose(0, 48)
    } yield {
      val bb = java.nio.ByteBuffer.allocate(16 + tail)
      bb.putInt(1).put(typ.getBytes).putLong(largesize)
      bb.array()
    }
    val junkBytes = Gen.oneOf(
      mutGen,
      hugeBoxGen,
      Gen.choose(0, 200).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))
    forSamples(junkBytes, 400) { bytes =>
      // besides never throwing, any parsed metadata must be sane:
      // hostile 64-bit duration/size fields must saturate, not wrap
      // into negative dims/frames/durations
      VideoCodec.mp4Meta(bytes).foreach { case (w, h, f, _, durMs) =>
        assert(w >= 0 && h >= 0 && f >= 0 && durMs >= 0L, s"mp4 wrap: $w $h $f $durMs")
      }
      VideoCodec.webmMeta(bytes).foreach { case (w, h, f, _, durMs) =>
        assert(w >= 0 && h >= 0 && f >= 0 && durMs >= 0L, s"webm wrap: $w $h $f $durMs")
      }
      VideoCodec.decodeMeta(bytes)
      VideoCodec.mjpegMeta(bytes)
      AudioCodec.mp3Meta(bytes).foreach { case (sr, ch, fr) =>
        assert(sr >= 0 && ch >= 0 && fr >= 0, s"mp3 wrap: $sr $ch $fr")
      }
      AudioCodec.flacMeta(bytes).foreach { case (sr, ch, ns) =>
        assert(sr >= 0 && ch >= 0 && ns >= 0, s"flac wrap: $sr $ch $ns")
      }
      ()
    }
  }

  test("window top-k per key ≡ per-key sort-take") {
    val rowGen = for {
      k <- Gen.chooseNum(0, 4)
      v <- Gen.chooseNum(-1000, 1000)
      id <- Gen.chooseNum(0, 1000000)
    } yield (k, v, id)
    forSamples(Gen.listOfN(60, rowGen), 10) { rows =>
      val distinctRows = rows.distinct
      val df = distinctRows.toDF("k", "v", "id")
      val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
      val got = df.withColumn("rnk", row_number().over(w))
        .where($"rnk" <= 3).select("k", "v", "id")
        .as[(Int, Int, Int)].collect().toSet
      val expect = distinctRows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(t => (-t._2, t._3)).take(3)
      }.toSet
      assert(got == expect)
    }
  }

  test("fingerprint is whitespace/case-invariant (normalization property)") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(8))
    forSamples(Gen.listOfN(6, wordGen), 15) { words =>
      val canonical = words.mkString(" ")
      val noisy = words.mkString("  ") + " "
      val upper = canonical.toUpperCase
      val fps = Seq(canonical, noisy, upper).toDF("t")
        .select(graft.functions.Text.fingerprint(col("t"))).as[Long].collect()
      assert(fps(0) == fps(1) && fps(0) == fps(2))
    }
  }

  test("mdy: parse ∘ format = identity on the valid domain; junk never throws") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.NativeDates
    // round trip: every epoch day whose year fits 4 digits formats to
    // MM/dd/yyyy and parses back to exactly itself (driver-side evals
    // — the same static methods codegen calls)
    forSamples(Gen.choose(-719162, 2932896), 400) { ed => // 0001-01-01..9999-12-31
      val s = NativeDates.formatMdyEval(ed)
      val back = NativeDates.parseMdyEval(s)
      assert(back != null && back.asInstanceOf[Integer].intValue() == ed,
        s"round trip broke at epochDay=$ed ($s -> $back)")
    }
    // totality: arbitrary strings (incl date-like junk) never throw,
    // and any non-null parse re-formats to a string that parses back
    // to the same day (internal consistency on accepted inputs)
    val junkDate = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(12)),
      for (m <- Gen.choose(0, 19); d <- Gen.choose(0, 40);
           y <- Gen.choose(0, 99999)) yield s"$m/$d/$y",
      Gen.const("2/29/1900"), Gen.const("2/29/2000"), Gen.const("12/31/9999"),
      Gen.const("-8"), Gen.const(""), Gen.const("1/1/1/1"), Gen.const("//"))
    forSamples(junkDate, 500) { s =>
      val r = NativeDates.parseMdyEval(UTF8String.fromString(s))
      if (r != null) {
        val ed = r.asInstanceOf[Integer].intValue()
        val back = NativeDates.parseMdyEval(NativeDates.formatMdyEval(ed))
        assert(back != null && back.asInstanceOf[Integer].intValue() == ed)
      }
    }
  }

  test("span dedup ≡ brute-force duplicated-window reference on random corpora") {
    // tiny alphabet forces plenty of duplicated windows; the reference
    // recomputes spans from first principles (count every k-window by
    // its token sequence, cover, merge with the pos > prev + k rule)
    val corpusGen: Gen[List[String]] = for {
      nDocs <- Gen.choose(3, 8)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 12)
        ts <- Gen.listOfN(len, Gen.oneOf("ga", "bu", "zo", "meu"))
      } yield ts.mkString(" "))
    } yield docs
    def refSpans(docs: Seq[(Long, String)], k: Int): Set[(Long, Int, Int, Int)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
      val counts = scala.collection.mutable.Map[Seq[String], Int]().withDefaultValue(0)
      for ((_, ts) <- toks; i <- 0 to ts.length - k) counts(ts.slice(i, i + k)) += 1
      toks.flatMap { case (id, ts) =>
        val cov = (0 to ts.length - k).filter(i => counts(ts.slice(i, i + k)) >= 2)
        val islands = cov.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p <= e => (s, p + k) :: rest
          case (acc, p) => (p, p + k) :: acc
        }.reverse
        islands.map { case (s, e) => (id, s, e, e - s) }
      }.toSet
    }
    var tested = 0
    forSamples(corpusGen, 25) { docs =>
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = ids.toDF("doc_id", "text")
      for (k <- Seq(2, 3)) {
        val got = graft.operators.SpanDedup.duplicatedSpans(df, k)
          .as[(Long, Int, Int, Int)].collect().toSet
        val want = refSpans(ids, k)
        assert(got == want,
          s"k=$k corpus=$ids\nonlyGot=${got -- want}\nonlyWant=${want -- got}")
        if (want.nonEmpty) tested += 1
        // rewrite parity: cut the reference spans by hand
        val kept = graft.operators.SpanDedup.dedupSpans(df, k)
          .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        ids.foreach { case (id, t) =>
          val ts = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
          val covered = want.collect { case (`id`, s, e, _) => (s, e) }
          val keep = ts.indices.filterNot(i => covered.exists { case (s, e) => i >= s && i < e })
          assert(kept(id) == ((keep.map(ts).mkString(" "),
            (ts.length - keep.length).toLong)), s"rewrite broke for doc $id k=$k in $ids")
        }
      }
    }
    assert(tested >= 10, s"generator produced too few duplicated corpora ($tested)")
  }

  test("dupNgramCharFrac ≡ naive all-window reference (coverage union)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.NativeText
    // tiny mixed-length vocabulary: duplicates are common AND token
    // lengths differ, so both the union and the char weighting are
    // exercised on every sample
    val toksGen: Gen[List[String]] = Gen.choose(0, 30).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "bc", "def", "gh", "i", "jklm")))
    var nonzero = 0
    forSamples(toksGen, 60) { toks =>
      for (n <- Seq(1, 2, 3, 5)) {
        val arr = new GenericArrayData(
          toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
        val got = NativeText.dupNgramCharFracEval(arr, n)
        val total = toks.length
        val want =
          if (total < n || total == 0) 0.0
          else {
            val grams = (0 to total - n).map(i => toks.slice(i, i + n).mkString(" "))
            val covered = grams.zipWithIndex
              .collect { case (g, i) if grams.count(_ == g) >= 2 => i }
              .flatMap(s => s until s + n).toSet
            val totalChars = toks.map(_.length).sum
            if (totalChars == 0) 0.0
            else math.floor(covered.toSeq.map(toks(_).length).sum.toDouble /
              totalChars * 10000 + 0.5) / 10000
          }
        assert(got == want, s"n=$n toks=$toks got=$got want=$want")
        if (want > 0) nonzero += 1
      }
    }
    assert(nonzero >= 40, s"generator produced too few duplicated samples ($nonzero)")
  }
}
