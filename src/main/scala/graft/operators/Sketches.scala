package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch surface (SURVEY.md A-family extension): Count-Min
  * frequency estimation and Bloom membership over a key column, with
  * audit shapes that make their probabilistic guarantees gate-checkable.
  *
  * Scale design: both sketches build DISTRIBUTED (per-partition
  * sketches OR/add-merged — commutative and associative, so the result
  * is partition-order independent and deterministic for fixed data and
  * seed). The audits collect only the DISTINCT KEY SET, which is
  * bounded by key cardinality (the contract: audit low-cardinality
  * keys), never the rows; the sketch itself is the object that scales.
  */
object Sketches {

  /** Count-Min audit: estimates must never undercount (a hard CMS
    * guarantee) and must overcount by at most eps·N (the designed
    * slack). Returns one row: (n_keys, undercount_violations,
    * overcount_violations) — both violation counts pin to 0. */
  def cmsAudit(df: DataFrame, keyCol: String,
               eps: Double = 0.0001, confidence: Double = 0.999,
               seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null keys are skipped by Spark's sketch aggregate, so the audit
    // population must skip them too (estimateCount(null) also throws)
    val nn = df.where(col(keyCol).isNotNull)
    val sketch = nn.stat.countMinSketch(keyCol, eps, confidence, seed)
    val truth = nn.groupBy(keyCol).agg(count(lit(1)).as("n")).collect()
    val total = truth.map(_.getLong(1)).sum
    val slack = math.ceil(eps * total).toLong
    var under = 0L
    var over = 0L
    truth.foreach { r =>
      val est = sketch.estimateCount(r.get(0))
      if (est < r.getLong(1)) under += 1
      if (est > r.getLong(1) + slack) over += 1
    }
    Seq((truth.length.toLong, under, over))
      .toDF("n_keys", "undercount_violations", "overcount_violations")
  }

  /** Bloom audit: every present key must be reported present (the
    * no-false-negative hard guarantee), and false positives over a
    * synthetic absent-key probe set must stay within a generous
    * multiple of the designed fpp. Returns one row:
    * (n_keys, false_negatives = 0, fp_ok = true). */
  def bloomAudit(df: DataFrame, keyCol: String,
                 expectedItems: Long, fpp: Double,
                 absentProbes: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // same null contract as cmsAudit: sketches see non-null keys only
    val nn = df.where(col(keyCol).isNotNull)
    val bf = nn.stat.bloomFilter(keyCol, expectedItems, fpp)
    val keys = nn.select(keyCol).distinct().collect().map(_.get(0))
    val falseNeg = keys.count(k => !bf.mightContain(k)).toLong
    val fpHits = (0 until absentProbes)
      .count(i => bf.mightContain(s"__graft_absent_$i"))
    val fpBound = math.max(10L, math.ceil(5 * fpp * absentProbes).toLong)
    Seq((keys.length.toLong, falseNeg, fpHits <= fpBound))
      .toDF("n_keys", "false_negatives", "fp_ok")
  }
}
