package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Outliers
import org.apache.spark.sql.functions._

/** Median/MAD outliers: discrete-median convention, flag threshold,
  * NULL/NaN exclusion, the MAD=0 degeneracy, NULL groups. */
class OutliersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("discrete lower median and MAD, outliers at k·1.4826·MAD") {
    // g1: values 1..9 plus a wild 1000. n=10 → rank ⌈10/2⌉=5 → med=5
    // devs: |1..9 − 5| = 4,3,2,1,0,1,2,3,4 and 995 → sorted
    // 0,1,1,2,2,3,3,4,4,995 → rank 5 → mad=2
    // threshold = 3·1.4826·2 = 8.8956 → only 1000 flagged
    val df = ((1 to 9).map(v => ("g1", v.toDouble)) :+ ("g1", 1000.0))
      .toDF("g", "v")
    val r = Outliers.madOutliers(df, "g", "v", k = 3.0).collect().head
    assert(r.getAs[Long]("n_vals") == 10L)
    assert(r.getAs[Double]("med") == 5.0)
    assert(r.getAs[Double]("mad") == 2.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("NULL/NaN/Inf values are excluded; NULL group audits like any other") {
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(2.0)), (Some("a"), Some(3.0)),
      (Some("a"), None), (Some("a"), Some(Double.NaN)),
      (Some("a"), Some(Double.PositiveInfinity)),
      (None, Some(5.0)), (None, Some(6.0)))
      .toDF("g", "v")
    val out = Outliers.madOutliers(df, "g", "v")
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Long]("n_vals"))
      .toMap
    assert(out == Map(Some("a") -> 3L, None -> 2L))
  }

  test("MAD=0 degeneracy flags every non-median value (documented, not hidden)") {
    val df = (Seq.fill(6)(7.0) ++ Seq(7.5, 100.0)).map(("g", _)).toDF("g", "v")
    val r = Outliers.madOutliers(df, "g", "v").collect().head
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_outliers") == 2L)
  }

  test("matches a driver-side recomputation on skewed multi-group data") {
    val df = (1L to 4000L).map { i =>
      val g = if (i % 10 == 0) "small" else "big" // 9:1 group skew
      (g, (i % 97).toDouble + (if (i % 400 == 0) 5000.0 else 0.0))
    }.toDF("g", "v")
    val got = Outliers.madOutliers(df, "g", "v", k = 3.0).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_vals"),
        r.getAs[Double]("med"), r.getAs[Double]("mad"),
        r.getAs[Long]("n_outliers")))).toMap
    val rows = df.collect().map(r => (r.getString(0), r.getDouble(1)))
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val med = sorted((sorted.length + 1) / 2 - 1)
      val devs = sorted.map(v => math.abs(v - med)).sorted
      val mad = devs((devs.length + 1) / 2 - 1)
      val thr = 3.0 * 1.4826
      g -> ((sorted.length.toLong, med, mad,
        devs.count(_ > thr * mad).toLong))
    }
    assert(got == expect)
  }
}
