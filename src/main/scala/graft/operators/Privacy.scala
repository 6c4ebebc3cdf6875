package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity tooling (Sweeney 2002, public) — the privacy audit
  * that pairs with PII scrubbing (x31) and keyed erasure (x93): a
  * table is k-anonymous over its QUASI-IDENTIFIER columns when every
  * combination of their values is shared by at least k rows, so no
  * released record narrows to fewer than k individuals.
  *
  * Scale shape: everything here is one map-side-combined groupBy on
  * the quasi-identifier tuple; the audit output is bounded by the
  * number of VIOLATING groups (release-ready data has few), and
  * suppression is a broadcast-friendly anti join of those groups back
  * onto the corpus — the corpus shuffles once, on the same key. */
object Privacy {

  /** Quasi-identifier groups smaller than k: `(quasiCols..., n)` —
    * the rows a release would have to suppress or generalize. NULL
    * quasi values group together (SQL GROUP BY semantics — a NULL
    * cohort is a cohort). */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs quasi-identifier columns")
    require(k >= 2, s"k must be at least 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }

  /** The k the table actually satisfies: the size of its smallest
    * quasi-identifier cohort (1-row result; an empty table satisfies
    * no k — NULL). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String]): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("k_satisfied"))

  /** l-diversity audit (Machanavajjhala 2007, public): k-anonymity's
    * companion — a cohort of k rows still leaks the sensitive value
    * if all k SHARE it. A table is l-diverse when every
    * quasi-identifier cohort contains at least l DISTINCT sensitive
    * values. One row per cohort: `(quasiCols..., n_rows,
    * distinct_sensitive, meets_l)`.
    *
    * Shape: countDistinct would carry an expanding distinct-agg
    * buffer through the merge; two stacked partial-aggregating
    * groupBys (quasi+sensitive → quasi) keep every buffer a counter.
    * NULL sensitive values count as ONE value (a cohort of all-NULL
    * sensitive is 1-diverse — NULL is exactly as disclosive as any
    * shared constant). */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs quasi-identifier columns")
    require(l >= 2, s"l must be at least 2, got $l")
    val qs = quasiCols.map(col)
    df.groupBy((qs :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(qs: _*)
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("distinct_sensitive"))
      .withColumn("meets_l", col("distinct_sensitive") >= l)
  }

  /** Suppression enforcement: drop every row of every violating
    * cohort, so the survivor table IS k-anonymous over `quasiCols`
    * (the baseline release action; generalization hierarchies that
    * save more rows are domain-specific and sit above this). Null-safe
    * on the cohort join — NULL cohorts suppress like any other. */
  def suppressToK(df: DataFrame, quasiCols: Seq[String],
                  k: Long): DataFrame = {
    val bad = kAnonymityViolations(df, quasiCols, k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
    df.join(bad,
      quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _),
      "left_anti")
  }
}
