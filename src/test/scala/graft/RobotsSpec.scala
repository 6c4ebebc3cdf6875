package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.NativeRobots.robotsMatchEval
import graft.expressions.NativeUrl
import graft.operators.Robots
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 robots matching + the verdict operator: wildcard/anchor
  * semantics, longest-match, allow-wins-ties, rule-less hosts,
  * malformed URLs. */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def m(path: String, pat: String): Boolean =
    robotsMatchEval(UTF8String.fromString(path), UTF8String.fromString(pat))

  test("pattern matching: prefix, wildcard, anchor, literal $") {
    assert(m("/a/b/c", "/a/"))          // plain prefix
    assert(!m("/x/a/", "/a/"))          // prefix means FROM THE START
    assert(m("/a/b", ""))               // empty pattern = empty prefix
    assert(m("/fish/salmon.html", "/fish"))
    assert(m("/a/b.php?x=1", "/*.php")) // wildcard spans segments
    assert(!m("/a/b.phx", "/*.php"))
    assert(m("/a/b.php", "/*.php$"))    // anchored: must END there
    assert(!m("/a/b.php?x=1", "/*.php$"))
    assert(m("/p/item20", "/p/item*0$"))
    assert(!m("/p/item20/", "/p/item*0$"))
    assert(m("/a**b", "/a*b"))          // * matches literal stars too
    assert(m("/ab", "/a*b"))            // and the empty sequence
    assert(m("/a$b/c", "/a$b"))         // mid-pattern $ is a literal
    assert(!m("/axb/c", "/a$b"))
    assert(m("/a/b/x/y/z", "/a/*/x/*z"))// multi-star backtracking
    assert(!m("/a/b/x/y/w", "/a/*/x/*z$"))
    assert(m("", "$"))                  // bare anchor = empty path only
    assert(!m("/", "$"))
  }

  test("verdicts: longest wins, allow wins ties, no rule = allowed, malformed = NULL") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://h1.com/private/item9"),   // disallow /private/ wins
      (2L, "https://h1.com/private/item22"),  // longer allow wins
      (3L, "https://h1.com/public/x"),        // no matching rule
      (4L, "https://h2.com/any"),             // tie at equal length -> allow
      (5L, "https://h3.com/whatever"),        // host with no rules
      (6L, "not a url")                       // malformed -> NULL
    ).toDF("doc_id", "url")
    val rules = Seq(
      ("h1.com", "disallow", "/private/"),
      ("h1.com", "allow", "/private/item2"),
      ("h2.com", "disallow", "/any"),
      ("h2.com", "allow", "/an*"), // same length (4), allow wins
      ("h2.com", "disallow", "/x")
    ).toDF("host", "directive", "pattern")

    val got = Robots.verdicts(urls, rules)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Boolean])).toMap
    assert(got == Map(
      1L -> Some(false), 2L -> Some(true), 3L -> Some(true),
      4L -> Some(true), 5L -> Some(true), 6L -> None))

    val kept = Robots.filterAllowed(urls, rules)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L, 4L, 5L)) // denied and malformed drop
  }

  test("property: matcher agrees with an independent regex reference") {
    // reference: pattern -> anchored regex, matched with lookingAt
    // semantics (prefix) via a leading ^; trailing $ keeps its anchor
    def toRegex(p: String): java.util.regex.Pattern = {
      val anchored = p.nonEmpty && p.endsWith("$")
      val core = if (anchored) p.dropRight(1) else p
      val body = core.map {
        case '*' => ".*"
        case c if "\\^$.|?+()[]{}".contains(c) => "\\" + c
        case c => c.toString
      }.mkString
      java.util.regex.Pattern.compile("^" + body + (if (anchored) "$" else ""))
    }
    val alphabet = "/ab$*.x?="
    val rnd = new scala.util.Random(19)
    def randStr(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    var checked = 0
    for (_ <- 1 to 4000) {
      val path = randStr(12)
      val pat = randStr(8)
      val want = toRegex(pat).matcher(path).find()
      assert(m(path, pat) == want,
        s"path='$path' pattern='$pat' want=$want")
      checked += 1
    }
    assert(checked == 4000)
  }

  test("edge inputs: empty rule table, empty urls, all-malformed urls") {
    import spark.implicits._
    val urls = Seq((1L, "https://h.com/a"), (2L, "junk")).toDF("doc_id", "url")
    val noRules = Seq.empty[(String, String, String)]
      .toDF("host", "directive", "pattern")
    val got = Robots.verdicts(urls, noRules).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(true), 2L -> None)) // no rules = allowed
    assert(Robots.verdicts(urls.limit(0), noRules).count() == 0)
    val allJunk = Seq((1L, "::"), (2L, "")).toDF("doc_id", "url")
    assert(Robots.filterAllowed(allJunk,
      Seq(("h.com", "allow", "/")).toDF("host", "directive", "pattern"))
      .count() == 0) // malformed never fetches
  }

  test("query string participates in matching; fragment does not") {
    val pq = NativeUrl.urlPathQueryEval(
      UTF8String.fromString("https://h.com/a/b?q=1&r=2#frag"))
    assert(pq.toString == "/a/b?q=1&r=2")
    assert(m(pq.toString, "/a/b?q=*"))
    assert(!m(pq.toString, "/a/b#"))
    // empty path reads as '/'
    assert(NativeUrl.urlPathQueryEval(
      UTF8String.fromString("https://h.com")).toString == "/")
    assert(NativeUrl.urlPathQueryEval(
      UTF8String.fromString("https://h.com?x=1")).toString == "/?x=1")
  }

  test("specificity ranks by OCTETS, not characters (RFC 9309 §2.2.2)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // path /caféz: allow '/café' is 5 chars / 6 OCTETS; disallow
    // '/caf*z' is 6 chars / 6 octets. Octet ranking → tie → allow
    // wins; character ranking would wrongly pick the disallow.
    val urls = Seq((1L, "https://h.io/caféz")).toDF("doc_id", "url")
    val rules = Seq(
      ("h.io", "allow", "/café"),
      ("h.io", "disallow", "/caf*z")).toDF("host", "directive", "pattern")
    val v = Robots.verdicts(urls, rules).as[(Long, Boolean)].collect()
    assert(v.toSeq == Seq((1L, true)))
    // and multi-byte patterns match byte-wise (é both sides)
    assert(m("/caféz", "/café"))
    assert(m("/café", "/caf*é$"))
    assert(!m("/cafe", "/café"))
  }
}
