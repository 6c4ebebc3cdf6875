package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic domain mixing for training pipelines: per-domain
  * sampling rates (upweight curated sources, downweight crawl) and a
  * seeded corpus shuffle, both pure functions of (salt, key).
  *
  * Same design rules as [[Splits]] (they share the md5-hex-bucket
  * construction): map-only, no RNG state, reproducible across runs /
  * engines / partitionings, and growth-stable — a document's fate
  * never depends on what else is in the corpus. The keep-decision is
  * a LEXICOGRAPHIC compare of the first 8 md5 hex chars against a
  * per-domain cut string (fixed-width hex compares like the number it
  * spells), so the identical predicate is expressible in any SQL
  * engine without hex→int conversion. Rate granularity 1/2^32.
  *
  * Rates > 1.0 (true upsampling) are out of scope here — repeat a
  * domain by unioning extra salted passes (`salt = "mix:rep2"`, rate
  * = fraction beyond 1.0) so repetitions stay deterministic too.
  */
object Mixing {

  /** 8-hex-char cut for rate r: keys whose md5 prefix sorts below it
    * are kept. "g" > every hex char, so r ≥ 1.0 keeps ALL rows (an
    * "ffffffff" cut would drop ~1/2^32 of them). */
  private[operators] def rateCut(r: Double): String = {
    require(r >= 0.0, s"rate $r must be non-negative")
    if (r >= 1.0) "g"
    else f"${math.round(r * 4294967296.0).min(4294967295L)}%08x"
  }

  private def hash8(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** Keep each row with its domain's rate. Unlisted domains get
    * `defaultRate`. */
  def weightedSample(df: DataFrame, domainCol: String, keyCol: String,
                     rates: Seq[(String, Double)], defaultRate: Double = 0.0,
                     salt: String = "mix"): DataFrame = {
    val cut = rates.foldRight(lit(rateCut(defaultRate)): Column) {
      case ((dom, r), rest) =>
        when(col(domainCol) === lit(dom), lit(rateCut(r))).otherwise(rest)
    }
    df.where(hash8(col(keyCol), salt) < cut)
  }

  /** The equivalent SQL predicate (same cuts, same md5 prefix) — the
    * auditable cross-engine form of [[weightedSample]]. */
  def sampleSql(domainExpr: String, keyExpr: String,
                rates: Seq[(String, Double)], defaultRate: Double = 0.0,
                salt: String = "mix"): String = {
    val cutExpr = rates.foldRight(s"'${rateCut(defaultRate)}'") {
      case ((dom, r), rest) =>
        s"CASE WHEN $domainExpr = '$dom' THEN '${rateCut(r)}' ELSE $rest END"
    }
    s"substr(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 8) < $cutExpr"
  }

  /** Deterministic corpus shuffle: order by seeded md5 of the key.
    * Spark executes the global sort as range-partition + per-partition
    * sort — the scale-correct shuffle (no single task ever sees the
    * corpus, no RNG state to coordinate), and the order is re-derivable
    * from the salt alone. */
  def shuffled(df: DataFrame, keyCol: String,
               salt: String = "shuf"): DataFrame =
    df.withColumn("shuffle_key", md5(concat(lit(salt), col(keyCol).cast("string"))))
      .orderBy(col("shuffle_key"))
}
