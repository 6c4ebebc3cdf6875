package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** Randomized equivalence: each native expression must agree with the
  * (slower) Spark-built-in formulation it replaced, across generated
  * inputs including edge shapes (empty, single, duplicates, unicode).
  * Seeds are fixed — failures reproduce.
  */
class NativeEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(97)
  private def randToken: String = {
    val alphabets = Seq("abc", "xyz", "日本語中文", "αβγ", "0123")
    val a = alphabets(rnd.nextInt(alphabets.length))
    (0 until 1 + rnd.nextInt(6)).map(_ => a(rnd.nextInt(a.length))).mkString
  }

  test("intersectCount equals size(array_intersect) on random distinct arrays") {
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(randToken).distinct
      val b = Seq.fill(rnd.nextInt(30))(randToken).distinct
      (a, b)
    } :+ ((Seq.empty[String], Seq.empty[String])) :+ ((Seq("x"), Seq.empty[String]))
    val df = rows.toDF("a", "b")
      .select(
        graft.expressions.NativeText.intersectCount($"a", $"b").as("native"),
        size(array_intersect($"a", $"b")).cast("long").as("builtin"))
    assert(df.where($"native" =!= $"builtin").count() == 0)
  }

  test("fused minhashText equals minhash over distinct char shingles") {
    // MinHash is duplicate-invariant, so the fused sliding-window path
    // (no distinct-set, no substring allocation) must be bit-identical
    // to the composed one — including multibyte text, mixed case,
    // heavy repetition, and below-shingle-size strings (the empty-set
    // sentinel signature)
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => randToken).mkString(" ")
    } ++ Seq("", "ab", "abcd", "ABBA ABBA ABBA", "日本語のテキスト断片",
      "aaaaaaaaaaaaaaaaaaaa", "αβγδ ΑΒΓΔ mixed Περίπτωση")
    for (n <- Seq(3, 5)) {
      val df = texts.toDF("t").select(
        graft.expressions.NativeSignatures.minhashText($"t", n, 32).as("fused"),
        graft.expressions.NativeSignatures.minhashSignature(
          Text.charShingles($"t", n), 32).as("composed"))
      assert(df.where(not($"fused" <=> $"composed")).count() == 0,
        s"fused/composed minhash disagree at shingle size $n")
    }
  }

  test("cosineSim equals the HOF dot/norm formulation on random vectors") {
    val rows = (0 until 200).map { _ =>
      val dim = 1 + rnd.nextInt(32)
      (Seq.fill(dim)(rnd.nextGaussian()), Seq.fill(dim)(rnd.nextGaussian()))
    }
    val df = rows.toDF("a", "b")
      .select(
        graft.expressions.NativeVector.cosineSim($"a", $"b").as("native"),
        (graft.functions.Sim.dot($"a", $"b") /
          (graft.functions.Sim.norm($"a") * graft.functions.Sim.norm($"b"))).as("hof"))
      .as[(Double, Double)].collect()
    df.foreach { case (n, h) =>
      assert(n == h || math.abs(n - h) < 1e-12, s"$n vs $h")
    }
  }

  test("chunks reassemble to the original token stream (overlap removed)") {
    val docs = (0 until 100).map { _ =>
      (0 until rnd.nextInt(300)).map(_ => randToken).mkString(" ")
    }
    for (doc <- docs; (size, overlap) <- Seq((7, 2), (80, 20), (3, 0))) {
      val step = size - overlap
      val chunks = Seq(doc).toDF("t")
        .select(Text.chunks($"t", size, overlap).as("c"))
        .as[Seq[String]].head()
      val toks = doc.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) assert(chunks.isEmpty)
      else {
        // stitch: first chunk whole, later chunks minus the
        // `overlap`-token prefix they share with their predecessor
        val stitched = chunks.zipWithIndex.flatMap { case (c, i) =>
          val ct = c.split(" ").toSeq
          if (i == 0) ct else ct.drop(overlap)
        }
        // every chunk except possibly the last has exactly `size` tokens
        chunks.dropRight(1).foreach(c => assert(c.split(" ").length == size))
        assert(stitched == toks, s"size=$size overlap=$overlap")
      }
    }
  }

  test("wordHits equals the filter+isin formulation on random token arrays") {
    val words = Text.enStopwords
    val rows = (0 until 200).map { _ =>
      Seq.fill(rnd.nextInt(50))(
        if (rnd.nextBoolean()) words(rnd.nextInt(words.length)) else randToken)
    }
    val df = rows.toDF("ts")
      .select(
        graft.expressions.NativeText.wordHits($"ts", words).as("native"),
        size(filter($"ts", t => t.isin(words.map(lit): _*))).cast("long").as("hof"))
    assert(df.where($"native" =!= $"hof").count() == 0)
  }

  test("dupLineFrac equals the HOF split/filter/array_distinct formulation") {
    def hof(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val lines = filter(split(c, "\n"), l => trim(l) =!= lit(""))
      val total = size(lines).cast("double")
      when(total > 0,
        round(lit(1.0) - size(array_distinct(lines)).cast("double") / total, 4))
        .otherwise(lit(0.0))
    }
    val docs = (0 until 200).map { _ =>
      val pool = Seq.fill(1 + rnd.nextInt(5))(randToken)
      (0 until rnd.nextInt(20)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => "   "
          case 1 => "\t"    // NOT blank under SQL trim (space-only)
          case 2 => " \r "  // ditto — CRLF remnants count as content
          case _ => pool(rnd.nextInt(pool.length))
        }
      }.mkString("\n")
    } :+ "" :+ "\n\n" :+ "a\na\na" :+ "a\na\n\t\nb"
    val df = docs.toDF("t")
      .select(
        graft.expressions.NativeText.dupLineFrac($"t").as("native"),
        hof($"t").as("builtin"))
    assert(df.where($"native" =!= $"builtin").count() == 0)
  }

  test("quantize/dequantize: reconstruction error bounded by scale/2 on random vectors") {
    import graft.functions.Sim
    val rows = (0 until 200).map { _ =>
      val dim = 1 + rnd.nextInt(48)
      Seq.fill(dim)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(4) - 1))
    } :+ Seq(0.0, 0.0, 0.0) // zero vector: scale 0, codes 0, error 0
    val df = rows.toDF("v")
      .withColumn("sc", Sim.quantScale($"v"))
      .select($"sc",
        aggregate(
          zip_with($"v", Sim.dequantize(Sim.quantize($"v", $"sc"), $"sc"),
            (a, r) => abs(a - r)),
          lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"))
      .as[(Double, Double)].collect()
    df.foreach { case (sc, err) =>
      assert(err <= sc / 2 + 1e-12, s"err $err exceeds scale/2 (${sc / 2})")
    }
  }
}
