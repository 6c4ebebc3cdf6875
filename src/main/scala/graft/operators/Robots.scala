package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{NativeRobots, NativeUrl}

/** Crawl politeness: robots.txt allow/deny verdicts per URL
  * (RFC 9309 — the step between URL discovery and fetch in every
  * crawl pipeline; a 100 TB corpus that ignores it is legally and
  * operationally unusable). The rule set is the already-parsed
  * per-host table a fetcher maintains: one row per
  * `(host, directive, pattern)` for the crawler's user-agent group.
  *
  * Decision per RFC 9309 §2.2.2: among the host's rules whose pattern
  * matches the URL's path+query ([[NativeRobots]] byte-wise match,
  * `*` wildcard, trailing `$` anchor), the MOST SPECIFIC — most
  * OCTETS, the RFC ranks by byte count, not characters — wins; an
  * allow/disallow tie at equal length resolves to
  * ALLOW (least restrictive); a URL with no matching rule (or no
  * rules for its host at all) is allowed.
  *
  * Plan shape: one equi join on host with the match predicate fused
  * into the join condition, then ONE partial-aggregated groupBy — the
  * winning rule is `max(struct(len, is_allow))`, whose lexicographic
  * struct order IS the longest-then-allow rule, so no window sort and
  * no second shuffle. Rule tables are hosts×rules-bounded (small next
  * to a corpus); Catalyst broadcasts when they fit, hash-joins
  * otherwise. Malformed URLs (NULL host/path) get verdict NULL —
  * junk is neither allowed nor denied silently.
  */
object Robots {

  /** (idCol, allowed) for every row of `urls`; `rules` columns:
    * `host`, `directive` ('allow' | 'disallow'), `pattern`. */
  def verdicts(urls: DataFrame, rules: DataFrame,
               idCol: String = "doc_id", urlCol: String = "url"): DataFrame = {
    val u = urls.select(col(idCol),
      NativeUrl.urlHost(col(urlCol)).as("__host"),
      NativeUrl.urlPathQuery(col(urlCol)).as("__pathq"))
    val r = rules.select(col("host").as("__host"),
      (col("directive") === "allow").as("__is_allow"),
      col("pattern").as("__pattern"))
    u.join(r,
        u("__host") === r("__host") &&
          NativeRobots.robotsMatch(col("__pathq"), col("__pattern")),
        "left")
      .groupBy(col(idCol), col("__pathq"))
      .agg(max(struct(
        octet_length(col("__pattern")).as("len"),
        col("__is_allow").as("is_allow"))).as("win"))
      .select(col(idCol),
        when(col("__pathq").isNull, lit(null).cast("boolean"))
          .when(col("win.len").isNull, lit(true)) // no rule matched
          .otherwise(col("win.is_allow")).as("allowed"))
  }

  /** The filter composition: keep URLs the host's robots rules allow
    * (malformed URLs drop — no verdict, no fetch). */
  def filterAllowed(urls: DataFrame, rules: DataFrame,
                    idCol: String = "doc_id",
                    urlCol: String = "url"): DataFrame =
    urls.join(
      verdicts(urls, rules, idCol, urlCol)
        .where(col("allowed") === true)
        .select(col(idCol)),
      Seq(idCol), "left_semi")
}
