package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * Assignment is a pure function of (salt, key): bucket by the first
  * 4 hex chars of md5, compare lexicographically against cut points.
  * Properties that matter at 100 TB:
  *  - map-only (no shuffle, no sampling state, no RNG);
  *  - reproducible across runs, engines, and partitionings — md5 hex
  *    is identical in Spark and DuckDB/standard SQL, so splits can be
  *    re-derived (and audited) anywhere;
  *  - stable under corpus growth: a document's split never changes
  *    when other documents are added or removed (the property
  *    `randomSplit` does NOT have);
  *  - fraction granularity 1/65536 (4 hex chars) — document-level
  *    exactness is not the point, stability is.
  */
object Splits {

  /** Cut points as 4-char lowercase hex strings for cumulative
    * weights (normalized). */
  private[operators] def cutPoints(weights: Seq[Double]): Seq[String] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail
    cum.init.map { c =>
      val v = math.min(65535, math.round(c / total * 65536).toInt)
      f"$v%04x"
    }
  }

  /** The split-assignment column (hex-bucket CASE chain). */
  def splitCol(key: Column, splits: Seq[(String, Double)],
               salt: String = ""): Column = {
    val cuts = cutPoints(splits.map(_._2))
    val h = HexBucket.prefix(key, salt, 4)
    val names = splits.map(_._1)
    cuts.zip(names.init).foldRight(lit(names.last): Column) {
      case ((cut, name), rest) => when(h < lit(cut), lit(name)).otherwise(rest)
    }
  }

  /** Annotate rows with a `split` column. */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Double)], salt: String = ""): DataFrame =
    df.withColumn("split", splitCol(col(keyCol), splits, salt))

  /** The equivalent SQL CASE expression (same cut points, same md5
    * bucketing) — the auditable cross-engine form of [[splitCol]]. */
  def splitSql(keyExpr: String, splits: Seq[(String, Double)],
               salt: String = ""): String = {
    val cuts = cutPoints(splits.map(_._2))
    val names = splits.map(_._1)
    val h = HexBucket.prefixSql(keyExpr, salt, 4)
    val whens = cuts.zip(names.init)
      .map { case (cut, n) => s"WHEN $h < '$cut' THEN '$n'" }
      .mkString(" ")
    s"CASE $whens ELSE '${names.last}' END"
  }
}
