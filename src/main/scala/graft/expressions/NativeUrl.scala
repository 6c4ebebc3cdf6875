package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native URL expressions for web-corpus curation — the first step of
  * every crawl pipeline (CCNet/RefinedWeb/Dolma all filter and dedup
  * by URL before touching the text). Map-only one-pass string walks;
  * the normalization is SPECIFIED as the regex/list pipeline the x66
  * oracle replays, so the two stay provably in sync:
  *
  *  - scheme and host lowercased; userinfo not handled (crawl URLs);
  *  - default ports stripped (http:80, https:443), others kept;
  *  - fragment dropped;
  *  - query params with tracking NAMES dropped (`utm_` prefix,
  *    `fbclid`, `gclid`, `msclkid`, `ref` — matched as `name=`),
  *    the rest sorted lexicographically and rejoined, empty query
  *    dropped entirely;
  *  - trailing `/` runs stripped from the path, empty path → `/`.
  *
  * Percent-encoding and IDN/punycode are passed through untouched —
  * at corpus scale a conservative normalizer that never rewrites
  * encodings beats an aggressive one that merges distinct resources.
  * Malformed input (no `scheme://`, empty host, non-numeric or
  * out-of-range port) returns NULL so junk never aliases a real URL.
  * Userinfo (`user[:pass]@host`) is split off at the last `@` before
  * any port parsing (so a `:` inside credentials is never mistaken
  * for a port) and preserved VERBATIM in the normalized form — RFC
  * 3986 userinfo is case-sensitive, only scheme and host case-fold.
  * Bracketed IPv6 with an explicit port keeps its host verbatim; a
  * portless `[::1]` reads its inner colon as a non-numeric port and
  * returns NULL — a conservative failure mode. Registrable-domain
  * extraction strips DNS absolute-form trailing dots first
  * (`example.net.` IS example.net — a blocklist must not be
  * bypassable by one appended dot) and refuses to invent a domain
  * from hosts with empty interior labels.
  */
object NativeUrl {

  /** Multi-part public suffixes the registrable-domain heuristic
    * recognizes (the full public-suffix list is a runtime data file;
    * these cover the common ccTLD second-level registries and the
    * fixture set — swap in the full PSL as a reference object for
    * production crawls). */
  val multiPartTlds: Set[String] =
    Set("co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp",
      "com.br", "co.in", "co.nz", "com.mx", "com.cn", "com.sg")

  private val trackingNames: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("fbclid", "gclid", "msclkid", "ref").foreach(s.add)
    s
  }

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = if (eq < 0) param else param.substring(0, eq)
    name.startsWith("utm_") || trackingNames.contains(name)
  }

  private def validScheme(s: String): Boolean = {
    if (s.isEmpty) return false
    val c0 = s.charAt(0)
    if (c0 < 'a' || c0 > 'z') return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '+' || c == '.' || c == '-'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Parsed URL parts; `userinfo` is "" when absent (it is preserved
    * VERBATIM — RFC 3986 userinfo is case-sensitive, so lowercasing
    * it would merge distinct resources); `port == -1` means none. */
  private final case class Parsed(scheme: String, userinfo: String,
                                  host: String, port: Int,
                                  path: String, query: String)

  private def parse(s: String): Parsed = {
    val sep = s.indexOf("://")
    if (sep <= 0) return null
    val scheme = s.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    if (!validScheme(scheme)) return null
    val rest = s.substring(sep + 3)
    var i = 0
    while (i < rest.length && rest.charAt(i) != '/' && rest.charAt(i) != '?' &&
      rest.charAt(i) != '#') i += 1
    val authority = rest.substring(0, i)
    if (authority.isEmpty) return null
    // userinfo@host:port — userinfo split FIRST (at the last '@'), so
    // a ':' inside user:pass is never mistaken for a port separator
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at) else ""
    val hostport = authority.substring(at + 1)
    val colon = hostport.lastIndexOf(':')
    var host = hostport
    var port = -1
    if (colon >= 0) {
      val p = hostport.substring(colon + 1)
      if (p.isEmpty || !p.forall(c => c >= '0' && c <= '9')) return null
      // bounds-checked parse: a silly-long digit run must map to
      // "malformed", not a NumberFormatException in the executor;
      // valid TCP ports are <= 65535
      var v = 0L
      var k = 0
      while (k < p.length && v <= 65535L) { v = v * 10 + (p.charAt(k) - '0'); k += 1 }
      if (v > 65535L) return null
      host = hostport.substring(0, colon)
      port = v.toInt
    }
    if (host.isEmpty) return null
    host = host.toLowerCase(java.util.Locale.ROOT)
    // path = up to '?' or '#'; query = between '?' and '#'
    var j = i
    while (j < rest.length && rest.charAt(j) != '?' && rest.charAt(j) != '#') j += 1
    val path = rest.substring(i, j)
    var query = ""
    if (j < rest.length && rest.charAt(j) == '?') {
      var k = j + 1
      while (k < rest.length && rest.charAt(k) != '#') k += 1
      query = rest.substring(j + 1, k)
    }
    Parsed(scheme, userinfo, host, port, path, query)
  }

  def normalizeUrlEval(str: UTF8String): UTF8String = {
    val p = parse(str.toString)
    if (p == null) return null
    val Parsed(scheme, userinfo, host, port, path, query) = p
    val sb = new java.lang.StringBuilder(str.numBytes())
    sb.append(scheme).append("://")
    if (userinfo.nonEmpty) sb.append(userinfo).append('@')
    sb.append(host)
    val default = (scheme == "http" && port == 80) ||
      (scheme == "https" && port == 443)
    if (port >= 0 && !default) sb.append(':').append(port)
    var pe = path.length
    while (pe > 0 && path.charAt(pe - 1) == '/') pe -= 1
    if (pe == 0) sb.append('/') else sb.append(path, 0, pe)
    if (query.nonEmpty) {
      val kept = new java.util.ArrayList[String]()
      query.split("&", -1).foreach { q =>
        if (q.nonEmpty && !isTracking(q)) kept.add(q)
      }
      if (!kept.isEmpty) {
        java.util.Collections.sort(kept)
        sb.append('?')
        var i = 0
        while (i < kept.size()) {
          if (i > 0) sb.append('&')
          sb.append(kept.get(i))
          i += 1
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  def urlHostEval(str: UTF8String): UTF8String = {
    val p = parse(str.toString)
    if (p == null) null else UTF8String.fromString(p.host)
  }

  /** Path + query of a URL (`/a/b?q=1`), fragment excluded, empty
    * path → `/`. This is the string robots.txt rules match against
    * (RFC 9309 §2.2.2: the path and, if present, the query). NULL on
    * malformed — an unparseable URL gets no politeness verdict. */
  def urlPathQueryEval(str: UTF8String): UTF8String = {
    val p = parse(str.toString)
    if (p == null) return null
    val path = if (p.path.isEmpty) "/" else p.path
    UTF8String.fromString(
      if (p.query.isEmpty) path else path + "?" + p.query)
  }

  /** Registrable domain of a HOST: last two labels, or last three
    * when the two-label suffix is a recognized multi-part public
    * suffix; single-label hosts return themselves. */
  def registrableDomainEval(host: UTF8String): UTF8String = {
    var h = host.toString.toLowerCase(java.util.Locale.ROOT)
    // DNS absolute form: 'example.net.' IS example.net — trailing
    // dots must strip BEFORE label extraction or the registrable
    // domain comes out as the bogus 'net.' and a blocklisted domain
    // sails through Url.curate
    var e = h.length
    while (e > 0 && h.charAt(e - 1) == '.') e -= 1
    if (e < h.length) h = h.substring(0, e)
    if (h.isEmpty) return UTF8String.fromString(host.toString.toLowerCase(java.util.Locale.ROOT))
    val parts = h.split("\\.", -1)
    val n = parts.length
    // an interior empty label ('a..com') is not a valid DNS name —
    // return the (dot-stripped) host itself rather than inventing a
    // registrable domain from garbage
    if (parts.exists(_.isEmpty)) return UTF8String.fromString(h)
    if (n < 2) return UTF8String.fromString(h)
    val last2 = parts(n - 2) + "." + parts(n - 1)
    val d =
      if (n >= 3 && multiPartTlds.contains(last2)) parts(n - 3) + "." + last2
      else last2
    UTF8String.fromString(d)
  }

  case class NormalizeUrlExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "normalize_url_native"

    override def nullSafeEval(v: Any): Any =
      normalizeUrlEval(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.expressions.NativeUrl.normalizeUrlEval($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

    override protected def withNewChildInternal(c: Expression): NormalizeUrlExpr =
      copy(child = c)
  }

  case class UrlHostExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "url_host_native"

    override def nullSafeEval(v: Any): Any = urlHostEval(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.expressions.NativeUrl.urlHostEval($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

    override protected def withNewChildInternal(c: Expression): UrlHostExpr =
      copy(child = c)
  }

  case class RegistrableDomainExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "registrable_domain_native"

    override def nullSafeEval(v: Any): Any =
      registrableDomainEval(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.NativeUrl.registrableDomainEval($c);")

    override protected def withNewChildInternal(c: Expression): RegistrableDomainExpr =
      copy(child = c)
  }

  case class UrlPathQueryExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "url_path_query_native"

    override def nullSafeEval(v: Any): Any =
      urlPathQueryEval(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.expressions.NativeUrl.urlPathQueryEval($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

    override protected def withNewChildInternal(c: Expression): UrlPathQueryExpr =
      copy(child = c)
  }

  def normalizeUrl(url: Column): Column =
    ColumnBridge.column(NormalizeUrlExpr(ColumnBridge.expression(url)))

  def urlPathQuery(url: Column): Column =
    ColumnBridge.column(UrlPathQueryExpr(ColumnBridge.expression(url)))

  def urlHost(url: Column): Column =
    ColumnBridge.column(UrlHostExpr(ColumnBridge.expression(url)))

  def registrableDomain(host: Column): Column =
    ColumnBridge.column(RegistrableDomainExpr(ColumnBridge.expression(host)))
}
