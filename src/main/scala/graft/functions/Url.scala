package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation for web corpora — the step every crawl pipeline runs
  * before the text is even read: canonicalize URLs (so byte-different
  * spellings of one resource dedup together), extract the registrable
  * domain (the unit domain blocklists, per-domain caps and mixing
  * weights operate on), and apply a blocklist verdict.
  *
  * All map-only native expressions (one string walk per row, inside
  * whole-stage codegen) — at 100 TB this is scan-throughput work with
  * zero exchanges; the downstream consumers (exact dedup on
  * `urlNormalized`, `Mixing.capPerDomain` on `domain`) reuse the
  * existing shuffle-shaped operators.
  */
object Url {

  /** Canonical URL: lowercased scheme/host, default ports stripped,
    * fragment dropped, tracking params (utm_*, fbclid, gclid,
    * msclkid, ref) removed, remaining params sorted, trailing path
    * slashes stripped. NULL for malformed input — junk never aliases
    * a real URL. See [[graft.expressions.NativeUrl]] for the exact
    * specification the x66 oracle replays. */
  def normalizeUrl(url: Column): Column =
    graft.expressions.NativeUrl.normalizeUrl(url)

  /** Lowercased host of a URL (port stripped), NULL when malformed. */
  def host(url: Column): Column =
    graft.expressions.NativeUrl.urlHost(url)

  /** Registrable domain of a host by the publicsuffix.org algorithm
    * (longest matching rule + one label; wildcard and exception rules
    * honored). The built-in rule set is a static ICANN-section
    * snapshot of the common ccTLD registries — pass the full current
    * PSL for production crawls, where an unlisted registry would make
    * a domain blocklist bypassable. */
  def registrableDomain(host: Column): Column =
    graft.expressions.NativeUrl.registrableDomain(host)

  /** Registrable domain under a caller-supplied public-suffix list
    * (`NativeUrl.SuffixRules.parse(<PSL file text>)`); the rules ride
    * the expression tree to every executor. */
  def registrableDomain(host: Column,
                        rules: graft.expressions.NativeUrl.SuffixRules): Column =
    graft.expressions.NativeUrl.registrableDomain(host, rules)

  /** Annotate a corpus with URL curation columns: `url_norm`, `host`,
    * `domain`, and `keep` (scheme is http/https AND the registrable
    * domain is not blocklisted; malformed URLs are dropped). The
    * blocklist rides the plan as a literal set — corpus-scale
    * blocklists belong in a broadcast semi/anti join instead
    * ([[graft.operators.Decontaminate]] shape); this form is for the
    * curated lists (spam/SEO domains) that fit in a closure. */
  def curate(df: DataFrame, urlCol: String,
             blockedDomains: Seq[String],
             suffixRules: Option[graft.expressions.NativeUrl.SuffixRules] =
               None): DataFrame = {
    val norm = normalizeUrl(col(urlCol))
    val h = host(col(urlCol))
    val d = suffixRules match {
      case Some(r) => registrableDomain(h, r)
      case None => registrableDomain(h)
    }
    df.withColumn("url_norm", norm)
      .withColumn("host", h)
      .withColumn("domain", d)
      .withColumn("keep",
        col("url_norm").isNotNull &&
          (col("url_norm").startsWith("http://") ||
            col("url_norm").startsWith("https://")) &&
          !col("domain").isin(blockedDomains: _*))
  }
}
