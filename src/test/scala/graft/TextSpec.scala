package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

class TextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tokens: lowercased, whitespace split, empties dropped") {
    val r = Seq("  Hello   World  ").toDF("t")
      .select(Text.tokens($"t").as("r")).as[Seq[String]].head()
    assert(r == Seq("hello", "world"))
  }

  test("tokenCount handles empty and multi-space strings") {
    val r = Seq("", "a b  c", "   ").toDF("t")
      .select(Text.tokenCount($"t").as("r")).as[Long].collect().toSeq
    assert(r == Seq(0L, 3L, 0L))
  }

  test("punctRatio and stopwordRatio in [0,1]") {
    val r = Seq("the cat, the hat!").toDF("t")
      .select(Text.punctRatio($"t").as("p"), Text.stopwordRatio($"t").as("s"))
      .head()
    assert(r.getDouble(0) > 0 && r.getDouble(0) < 1)
    assert(r.getDouble(1) == 0.5) // 'the' twice of 4 tokens
  }

  test("langId identifies hand-made samples; CJK fast path; und fallback") {
    val samples = Seq(
      ("the quick brown fox is on the hill and it was fine", "en"),
      ("el perro y la casa es una de las cosas que no se", "es"),
      ("le chien est dans la maison et il est pour le chat", "fr"),
      ("der hund ist nicht in der stadt und das ist ein haus", "de"),
      ("这是一个中文句子", "zh"),
      ("zzz qqq xxx", "und"))
    val got = samples.map(_._1).toDF("t")
      .select(Text.langId($"t").as("r")).as[String].collect().toSeq
    assert(got == samples.map(_._2))
  }

  test("charEntropy: zero for uniform repetition, higher for diverse text") {
    val r = Seq("aaaaaaaa", "abababab", "the quick brown fox", "")
      .toDF("t").select(Text.charEntropy($"t").as("h")).as[Double].collect()
    assert(r(0) == 0.0)
    assert(r(1) == 1.0) // two equiprobable symbols = exactly 1 bit
    assert(r(2) > 3.0)
    assert(r(3) == 0.0)
  }

  test("topNgramFrac: looping text ~1, prose low") {
    val r = Seq("spam ham spam ham spam ham spam ham",
      "the quick brown fox jumps over a lazy dog near the river bank")
      .toDF("t")
      .select(graft.expressions.NativeText.topNgramFrac(Text.tokens($"t"), 2).as("f"))
      .as[Double].collect()
    assert(r(0) > 0.8)
    assert(r(1) < 0.3)
  }

  test("dupNgramCharFrac: coverage union, char weighting, Gopher n=5") {
    def f(n: Int, texts: String*): Seq[Double] =
      texts.toDF("t").select(Text.dupNgramCharFrac($"t", n).as("f"))
        .as[Double].collect().toSeq
    // "a b a b": the duplicated bigram "a b" covers every position
    assert(f(2, "a b a b") == Seq(1.0))
    // unique prefix token stays uncovered: 4 of 5 chars
    assert(f(2, "x a b a b") == Seq(0.8))
    // character weighting: the uncovered token is 2 chars of 6
    assert(f(2, "xx a b a b") == Seq(0.6667))
    // coverage UNION: 5 overlapping duplicated windows still cap at 1
    assert(f(2, "a a a a a a") == Seq(1.0))
    // the Gopher n=5 case: a 6-token phrase repeated twice is fully
    // covered by its duplicated 5-grams; clean prose has none
    assert(f(5, "one two three four five six one two three four five six",
      "the quick brown fox jumps over a lazy dog near the river") ==
      Seq(1.0, 0.0))
    // fewer tokens than n, and empty text → 0.0
    assert(f(5, "a b c d", "") == Seq(0.0, 0.0))
    // whitespace-run and case invariance (token view both sides)
    assert(f(2, "A  b\ta B") == f(2, "a b a b"))
  }

  test("Curation: clean doc kept, degenerate docs dropped with reasons") {
    import graft.operators.Curation
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog while the sun " +
        "sets slowly behind the mountains and the river runs to the sea."),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "ab"),
      (4L, "line one\nline one\nline one\nline one\nline two with more words here"),
      // a 6-token phrase repeated verbatim amid unique filler: the
      // duplicated-3-gram coverage fires while top-bigram (max count
      // 2 of 29 bigrams) stays under its threshold
      (5L, "alpha beta gamma delta epsilon zeta " +
        "alpha beta gamma delta epsilon zeta " +
        "every remaining word appears exactly once keeping entropy high " +
        "and the tail diverse enough for all other quality rules"))
      .toDF("doc_id", "text")
    val r = Curation.annotate(docs)
      .select($"doc_id", $"keep", $"drop_reasons")
      .as[(Long, Boolean, Seq[String])].collect().map(x => x._1 -> x).toMap
    assert(r(1L)._2, r(1L)._3.toString)               // clean → kept
    assert(!r(2L)._2 && r(2L)._3.contains("repetitive_ngrams"))
    assert(!r(3L)._2 && r(3L)._3.contains("too_short"))
    assert(!r(4L)._2 && r(4L)._3.contains("duplicate_lines"))
    assert(r(5L)._3 == Seq("duplicate_ngrams"), r(5L)._3.toString)
  }

  test("Boilerplate: cross-doc frequent lines stripped; blanks, unique lines, untrimmed match") {
    import graft.operators.Boilerplate
    val docs = (0 until 8).map(i =>
      (i.toLong, s"shared header\nunique body $i\n  \n shared header\ntail $i"))
      .toDF("doc_id", "text")
    // exact-text (untrimmed) matching: the leading-space variant is a
    // DIFFERENT frequent line, counted separately
    val freq = Boilerplate.frequentLines(docs, minDocs = 5)
      .as[(String, Long)].collect().toMap
    assert(freq == Map("shared header" -> 8L, " shared header" -> 8L))
    val r = Boilerplate.stripFrequentLines(docs, minDocs = 5)
      .as[(Long, String, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(3L) == (("unique body 3\n  \ntail 3", 2L)))
    // below the document-frequency bar: nothing stripped
    val r2 = Boilerplate.stripFrequentLines(docs, minDocs = 9)
      .as[(Long, String, Long)].collect()
    assert(r2.forall(_._3 == 0L))
    // every within-doc OCCURRENCE of a frequent line is removed
    val docs3 = (0 until 6).map(i => (i.toLong, s"x\nx\nbody $i"))
      .toDF("doc_id", "text")
    val r3 = Boilerplate.stripFrequentLines(docs3, minDocs = 6)
      .as[(Long, String, Long)].collect().head
    assert(r3._2.startsWith("body") && r3._3 == 2L)
  }

  test("fingerprint: whitespace/case-insensitive identity, order-sensitive") {
    val fps = Seq("Hello  World", "hello world", "world hello")
      .toDF("t").select(Text.fingerprint($"t").as("r")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("simhash: near-identical docs are close, different docs far") {
    val base = "spark makes distributed data processing fast and expressive " +
      "with catalyst and tungsten and whole stage codegen for queries"
    val near = base.replace("fast", "quick")
    val far = "completely unrelated text about cooking pasta with tomato " +
      "sauce basil garlic olive oil and fresh parmesan cheese on top"
    val df = Seq(base, near, far).toDF("t")
      .select(Text.simhash64($"t").as("h")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(df(0), df(1)) < ham(df(0), df(2)))
    assert(ham(df(0), df(1)) <= 16)
  }

  test("shingles and jaccard") {
    val df = Seq(("abcd", "abcd"), ("abcd", "bcde")).toDF("a", "b")
      .select(Text.jaccard(
        Text.charShingles($"a", 2), Text.charShingles($"b", 2)).as("j"))
      .as[Double].collect()
    assert(df(0) == 1.0)
    assert(df(1) > 0 && df(1) < 1)
  }

  test("wordShingles produce n-grams in order") {
    val r = Seq("a b c d").toDF("t")
      .select(Text.wordShingles($"t", 2).as("r")).as[Seq[String]].head()
    assert(r == Seq("a b", "b c", "c d"))
  }

  test("sentenceSplit: boundary rule, punctuation kept left, no false splits") {
    def ss(t: String): Seq[String] =
      Seq(t).toDF("t").select(graft.functions.Text.sentenceSplit(col("t")))
        .head().getSeq[String](0)
    assert(ss("One two. Three four! Five?") ==
      Seq("One two.", "Three four!", "Five?"))
    assert(ss("Wait... Really?! Yes.") == Seq("Wait...", "Really?!", "Yes."))
    // lowercase continuation and abbreviations-without-space never split
    assert(ss("approx. value is 3.14 e.g. here") ==
      Seq("approx. value is 3.14 e.g. here"))
    // digits can open a sentence; multiple spaces collapse away
    assert(ss("Done.  2 more left.") == Seq("Done.", "2 more left."))
    // adjacent one-char sentences (non-overlapping scan still finds both)
    assert(ss("Hi. A. Go.") == Seq("Hi.", "A.", "Go."))
    assert(ss("no boundary here") == Seq("no boundary here"))
    assert(ss("") == Seq.empty)
  }

  test("chunks: overlapping token windows, short tail, case preserved") {
    def chunksOf(t: String, size: Int, overlap: Int): Seq[String] =
      Seq(t).toDF("t").select(Text.chunks($"t", size, overlap).as("c"))
        .as[Seq[String]].head()
    // 7 tokens, size 3, overlap 1 (step 2): [0..2],[2..4],[4..6] —
    // the last window reaches the end, so no short tail is emitted
    assert(chunksOf("A b c d e f g", 3, 1) ==
      Seq("A b c", "c d e", "e f g"))
    // 8 tokens: [0..2],[2..4],[4..6],[6..7] — short tail
    assert(chunksOf("a b c d e f g h", 3, 1) ==
      Seq("a b c", "c d e", "e f g", "g h"))
    // doc shorter than a window → single chunk, canonical whitespace
    assert(chunksOf("  x \n y  ", 80, 20) == Seq("x y"))
    // exact fit → one chunk, no empty tail
    assert(chunksOf("a b c", 3, 1) == Seq("a b c"))
    // empty/whitespace doc → no chunks
    assert(chunksOf("   ", 3, 1) == Seq.empty)
  }

  test("scrubPii redacts emails, IPs, and phones with typed placeholders") {
    val doc = "Contact bob.smith+x@corp.example.co from 10.0.12.7, " +
      "call +1 (555) 123-4567 or 555-123-4567; v1.2 unchanged, pi 3.14"
    val r = Seq(doc).toDF("t")
      .select(Text.scrubPii($"t").as("s"), Text.piiCounts($"t").as("c"))
      .select($"s", $"c.emails", $"c.ips", $"c.phones")
      .as[(String, Int, Int, Int)].head()
    assert(r._1 == "Contact <EMAIL> from <IP>, " +
      "call <PHONE> or <PHONE>; v1.2 unchanged, pi 3.14")
    assert((r._2, r._3, r._4) == ((1, 1, 2)))
  }

  test("dedupLines: first occurrence kept in order, blanks preserved, no-newline passthrough") {
    import graft.expressions.NativeText
    def run(t: String): (String, Long) = Seq(t).toDF("t")
      .select(NativeText.dedupLines($"t").as("r"))
      .select($"r.kept_text", $"r.n_removed").as[(String, Long)].head()
    // repeats dropped wherever they recur; blank lines always survive
    assert(run("a\nb\n\na\nc\nb\n \nc") == (("a\nb\n\nc\n ", 3L)))
    // a tab-only line is CONTENT (SQL trim strips spaces only), so
    // its repeat is removed like any other line
    assert(run("\t\nx\n\t") == (("\t\nx", 1L)))
    // no newlines -> identity
    assert(run("just one line") == (("just one line", 0L)))
    // all-blank and empty docs pass through untouched
    assert(run("") == (("", 0L)))
    assert(run(" \n \n ") == ((" \n \n ", 0L)))
  }

  test("chunksWithCounts: chunk text parity with chunks(); counts need no re-tokenize") {
    val doc = (1 to 203).map(i => s"tok$i").mkString(" ")
    val rows = Seq(doc).toDF("t")
      .select(org.apache.spark.sql.functions.explode(
        Text.chunksWithCounts($"t", 80, 20)).as("c"))
      .select($"c.chunk", $"c.n_tok").as[(String, Long)].collect().toSeq
    val plain = Seq(doc).toDF("t")
      .select(Text.chunks($"t", 80, 20)).as[Seq[String]].head()
    assert(rows.map(_._1) == plain)
    rows.foreach { case (c, n) => assert(n == c.split(" ").length.toLong) }
    // 203 tokens, size 80 step 60 -> windows 80/80/80 tail 23
    assert(rows.map(_._2) == Seq(80L, 80L, 80L, 23L))
    // empty doc -> empty array
    assert(Seq("  ").toDF("t")
      .select(org.apache.spark.sql.functions.size(
        Text.chunksWithCounts($"t", 80, 20)).as("n")).as[Int].head() == 0)
  }

  test("nfc: composes decomposed sequences; identity on composed and ASCII") {
    val rows = Seq(
      "Cafe\u0301",          // e + combining acute
      "A\u030a",             // A + combining ring
      "caf\u00e9",           // already composed
      "plain ascii",
      "\u0645\u0631\u062d")  // Arabic, NFC-invariant
      .toDF("t").select(Text.nfc($"t").as("r")).as[String].collect().toSeq
    assert(rows(0) == "Caf\u00e9")
    assert(rows(1) == "\u00c5")
    assert(rows(2) == "caf\u00e9")
    assert(rows(3) == "plain ascii")
    assert(rows(4) == "\u0645\u0631\u062d")
    // composes to FEWER codepoints
    assert("Cafe\u0301".length == 5 && rows(0).length == 4)
  }

  test("normalizeText: controls stripped (keep \\n \\t->space), runs collapse, edge spaces trim") {
    val got = Seq(
      " a\u0001b  c\td ",       // control dropped, runs collapse, edges trim
      "line1\r\nline2",          // CRLF -> LF
      "a \n b",                  // single spaces around newline survive
      "\n padded \n",            // newline is structure: NOT trimmed
      "\t\t",                    // collapses to one space, then trims to empty
      "Cafe\u0301  x")           // NFC applies before cleanup
      .toDF("t").select(Text.normalizeText($"t").as("r")).as[String].collect().toSeq
    assert(got(0) == "ab c d")
    assert(got(1) == "line1\nline2")
    assert(got(2) == "a \n b")
    assert(got(3) == "\n padded \n")
    assert(got(4) == "")
    assert(got(5) == "Caf\u00e9 x")
  }

  test("htmlExtract: elements with content, comments, tags, entities, cleanup") {
    val html = "<!DOCTYPE html><head><style a=\"b\">h1 {x}</style>" +
      "<script>if (a<b && c>d) {}</script></head>" +
      "<body><!-- hi --><h1>A &amp; B</h1><p>text&nbsp;here</p>" +
      "<p>5 &lt; 6</p>unclosed <tag"
    val got = Seq(html).toDF("t")
      .select(Text.htmlExtract($"t").as("r")).as[String].head()
    assert(got == "A & B text here 5 < 6 unclosed <tag")
    // case-insensitive element removal; attributes on the opener
    val got2 = Seq("<SCRIPT type=\"x\">alert(1)</SCRIPT>keep").toDF("t")
      .select(Text.htmlExtract($"t").as("r")).as[String].head()
    assert(got2 == "keep")
    // unclosed script: regex fails to match, generic strip takes the
    // tags, the BODY survives (never silently swallow to EOF)
    val got3 = Seq("<script>var a = 1;").toDF("t")
      .select(Text.htmlExtract($"t").as("r")).as[String].head()
    assert(got3 == "var a = 1;")
    // double-escaped entity renders the literal entity text
    val got4 = Seq("x &amp;lt; y").toDF("t")
      .select(Text.htmlExtract($"t").as("r")).as[String].head()
    assert(got4 == "x &lt; y")
    // scriptx is NOT a script element (word boundary)
    val got5 = Seq("<scriptx>body</scriptx>").toDF("t")
      .select(Text.htmlExtract($"t").as("r")).as[String].head()
    assert(got5 == "body")
  }

  test("htmlExtract equals the regex-pipeline specification on generated inputs") {
    import java.util.regex.Pattern
    def rr(in: String, p: String): String =
      Pattern.compile(p).matcher(in).replaceAll(" ")
    def cleanSpec(s: String): String = {
      val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      n.replaceAll("[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
        .replaceAll("[ \\t]+", " ").replaceAll("\\A +| +\\z", "")
    }
    def spec(s: String): String = {
      val a = rr(s, "(?s)<!--.*?-->")
      val b = rr(a, "(?is)<script\\b[^>]*>.*?</script>")
      val c = rr(b, "(?is)<style\\b[^>]*>.*?</style>")
      val d = rr(c, "<[^>]*>")
      cleanSpec(d.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
        .replace("&nbsp;", " ").replace("&amp;", "&"))
    }
    val snippets = Array("<", ">", "a", "b ", " ", "<script>", "</script>",
      "<SCRIPT t='x'>", "</SCRIPT>", "<style>", "</style>", "<!--", "-->",
      "<p>", "</p>", "&amp;", "&lt;", "&amp;lt;", "x<y", "x>y", "<scripty>",
      "\t", "\n", "<script", "script>")
    val rnd = new scala.util.Random(7)
    val inputs = (0 until 300).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => snippets(rnd.nextInt(snippets.length))).mkString
    }
    val got = inputs.toDF("t")
      .select(Text.htmlExtract($"t").as("r")).as[String].collect().toSeq
    inputs.zip(got).foreach { case (in, g) =>
      assert(g == spec(in), s"input=<<$in>>")
    }
  }

  test("normalizeText equals the regex-pipeline specification on generated inputs") {
    // the spec the native walk must match: strip -> collapse -> trim(' ')
    def spec(s: String): String = {
      val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      val stripped = n.replaceAll("[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
      val collapsed = stripped.replaceAll("[ \\t]+", " ")
      collapsed.replaceAll("\\A +| +\\z", "")
    }
    val alphabet = Array(' ', '\t', '\n', '\r', '\u0001', '\u007f', 'a', 'b',
      '\u0301', '\u00e9', '\u0645')
    val rnd = new scala.util.Random(42)
    val inputs = (0 until 200).map { _ =>
      (0 until rnd.nextInt(20)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val got = inputs.toDF("t")
      .select(Text.normalizeText($"t").as("r")).as[String].collect().toSeq
    inputs.zip(got).foreach { case (in, g) =>
      assert(g == spec(in), s"input=${in.map(_.toInt.toHexString).mkString(",")}")
    }
  }
}
