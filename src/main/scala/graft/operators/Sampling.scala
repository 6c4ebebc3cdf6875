package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training pipelines: exact-N stratified
  * selection and weighted sampling without replacement.
  *
  * Both are pure functions of (salt, key) — no RNG, no sampling
  * state — so a sample is reproducible across runs, engines, and
  * partitionings, and AUDITABLE: the DuckDB oracles replay the same
  * md5 arithmetic and must select the identical rows. That is the
  * property `df.sample()` / `rand()` can never give a 100 TB corpus
  * build (re-runs of a failed stage would silently change the
  * sample; Spark's own docs warn `sample` is not guaranteed stable).
  *
  * Scale shape:
  *  - stratified: NO per-stratum window sort (3 hot strata would be
  *    3 single-task sorts — the trap x104's grouped audit avoids).
  *    One global range-rank over (stratum, hash) via
  *    [[Ranks.globalRowNumber]], in-stratum rank by subtracting the
  *    stratum's min global rank (groups × 1 row, broadcast).
  *  - weighted: one map pass computing the selection score + a
  *    global top-n (TakeOrderedAndProject — per-partition heaps, no
  *    global sort, n rows to the driver side of the exchange).
  */
object Sampling {

  private val HexDigits = "0123456789abcdef"

  /** Deterministic uniform in (0, 1]: the first 8 hex chars of
    * md5(salt || key) read as a 32-bit integer u32, mapped to
    * (u32 + 1) / 2^32. Spark side uses `conv(hex,16,10)`; the SQL
    * form (DuckDB has no conv) spells the same integer with nibble
    * arithmetic — verified byte-identical (same md5, same grid).
    *
    * Granularity: u has 2^32 distinct values (the [[Splits]] grid is
    * coarser still at 1/65536). At billion-row strata, birthday
    * collisions on u are routine and ordering falls to the raw-key
    * tiebreak — deterministically favoring low key values AMONG THE
    * COLLIDING ROWS. The bias is bounded by the collision mass
    * (≈ n²/2^33 rows) and keeps every replay property; callers needing
    * collision-free order at that scale can salt per epoch. */
  def uniform(key: Column, salt: String): Column =
    (conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8),
      16, 10).cast("double") + lit(1.0)) / lit(4294967296.0)

  /** The DuckDB replay of [[uniform]] — same md5 prefix, nibble
    * arithmetic instead of conv. */
  def uniformSql(keyExpr: String, salt: String): String = {
    val hx = s"substr(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 8)"
    val u32 = (2 to 8).foldLeft(
      s"(instr('$HexDigits', substr($hx,1,1)) - 1)") { (acc, i) =>
      s"($acc * 16 + (instr('$HexDigits', substr($hx,$i,1)) - 1))"
    }
    s"((CAST($u32 AS DOUBLE) + 1) / 4294967296.0)"
  }

  /** Exactly min(n, |stratum|) rows per stratum, selected by
    * md5-hash order (tie-broken by the key itself, so the rank order
    * is total). Adds `in_stratum_rank` (1-based). NULL strata are
    * sampled like any other (the stratum rides in a struct — bare
    * NULL keys would fall out of the groupBy/join). The sample KEY
    * must be non-NULL: a NULL key hashes to a NULL uniform, and
    * engines disagree on where NULLs sort (Spark ASC = first, DuckDB
    * = last) — a row without identity has no deterministic sample
    * membership.
    *
    * The selection is stable under corpus growth ONLY in hash order:
    * adding documents can displace previously selected rows past
    * rank n (exact-N and insertion-stability are mutually exclusive
    * — [[Splits]] gives the stable-fraction form). */
  def stratifiedExact(df: DataFrame, stratumCol: String, keyCol: String,
                      n: Int, salt: String = ""): DataFrame = {
    require(n > 0, s"sample size $n must be positive")
    stratifiedRanks(df, stratumCol, keyCol, salt)
      .where(col("in_stratum_rank") <= n)
      .drop("__n")
  }

  /** Stratified EXACT-FRACTION split: within every stratum, assign
    * splits by md5-hash rank against the cumulative-weight
    * boundaries ⌈c_i · n_stratum⌉ — each stratum lands within one
    * row of its exact proportions (the balanced-eval-set guarantee
    * [[Splits.hashSplit]]'s global-hash form cannot give on small or
    * skewed strata: its per-stratum fractions only converge in
    * expectation). Same determinism contract as [[stratifiedExact]]
    * (pure function of (salt, key), non-NULL keys), same scale shape
    * (one global range-rank, no per-stratum window); like exact-N
    * selection, exact fractions are NOT insertion-stable — corpus
    * growth moves boundaries. */
  def stratifiedSplit(df: DataFrame, stratumCol: String, keyCol: String,
                      splits: Seq[(String, Double)],
                      salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "split weights must be positive")
    val total = splits.map(_._2).sum
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val ranked = stratifiedRanks(df, stratumCol, keyCol, salt)
    val rank = col("in_stratum_rank")
    val n = col("__n")
    val splitCol = cum.init.zip(splits.map(_._1).init)
      .foldRight(lit(splits.last._1): Column) { case ((c, name), rest) =>
        when(rank <= ceil(lit(c) * n), lit(name)).otherwise(rest)
      }
    ranked.withColumn("split", splitCol).drop("__n")
  }

  /** The DuckDB CASE replaying [[stratifiedSplit]]'s boundary
    * arithmetic over `(rnExpr, nExpr)`: the cumulative weights are
    * printed with round-trip precision from the SAME Scala doubles
    * the Column form folds in — 0.8 + 0.1 is 0.9000000000000001 in
    * IEEE, and an oracle writing the literal 0.9 would ceil() one row
    * differently whenever c·n lands integral. */
  def stratifiedSplitCaseSql(rnExpr: String, nExpr: String,
                             splits: Seq[(String, Double)]): String = {
    val total = splits.map(_._2).sum
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val whens = cum.init.zip(splits.map(_._1).init).map { case (c, name) =>
      s"WHEN $rnExpr <= CEIL(${java.lang.Double.toString(c)} * $nExpr) " +
        s"THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${splits.last._1}' END"
  }

  /** Shared rank machinery: `in_stratum_rank` (1-based md5-hash
    * order) and the stratum size `__n`, via one global range-rank —
    * never a per-stratum window. */
  private def stratifiedRanks(df: DataFrame, stratumCol: String,
                              keyCol: String, salt: String): DataFrame = {
    val tagged = df.withColumn("__h", uniform(col(keyCol), salt))
    val ranked = Ranks.globalRowNumber(
      tagged.withColumn("__g", struct(col(stratumCol))),
      Seq(col("__g"), col("__h"), col(keyCol)), "__grn")
    val offs = ranked.groupBy(col("__g"))
      .agg(min(col("__grn")).as("__off"), count(lit(1)).as("__n"))
    ranked.join(offs, Seq("__g"))
      .withColumn("in_stratum_rank", col("__grn") - col("__off") + 1)
      .drop("__g", "__h", "__grn", "__off")
  }

  /** The Efraimidis–Spirakis selection score: ln(u)/w with the
    * deterministic u of [[uniform]]. Taking the global top-n of this
    * score DESC (larger = closer to 0 = more likely kept) draws a
    * weighted sample WITHOUT replacement: P(row first) = w/Σw,
    * then recursively on the rest. Rows with NULL or non-positive
    * weight are never selected (score NULL → filtered). */
  def weightedScore(key: Column, weight: Column, salt: String): Column =
    when(weight > lit(0.0), log(uniform(key, salt)) / weight.cast("double"))

  /** Weighted sample without replacement: global top-n by
    * [[weightedScore]], tie-broken by key. Plans as
    * TakeOrderedAndProject (per-partition heaps); the score column is
    * NOT in the output — ln() is the one op libm implementations may
    * round differently, so selection compares it but nothing hashes
    * it. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     n: Int, salt: String = ""): DataFrame = {
    require(n > 0, s"sample size $n must be positive")
    val scored = df.withColumn("__score",
      weightedScore(col(keyCol), col(weightCol), salt))
    scored.where(col("__score").isNotNull)
      .orderBy(col("__score").desc, col(keyCol))
      .limit(n)
      .drop("__score")
  }

  /** The DuckDB replay of [[weightedScore]] for the oracle. */
  def weightedScoreSql(keyExpr: String, weightExpr: String,
                       salt: String): String =
    s"(CASE WHEN $weightExpr > 0.0 THEN ln(${uniformSql(keyExpr, salt)})" +
      s" / CAST($weightExpr AS DOUBLE) END)"
}
