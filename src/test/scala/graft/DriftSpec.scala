package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift
import org.apache.spark.sql.functions._

/** PSI drift detection: identical distributions score exactly zero,
  * shifts score high, out-of-range mass lands in the under/overflow
  * buckets, degenerate inputs are rejected or degrade cleanly. */
class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val ref = (1 to 1000).map(_.toDouble).toDF("v")

  test("identical distributions: every term is exactly zero") {
    val out = Drift.psi(ref, ref, "v").head()
    assert(out.getLong(0) == 0L)
    assert(out.getLong(1) == 1000L && out.getLong(2) == 1000L)
  }

  test("a shifted distribution drifts; out-of-range mass hits the edge buckets") {
    val cur = (1 to 1000).map(i => i.toDouble + 600).toDF("v")
    val buckets = Drift.psiByBucket(ref, cur, "v", k = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(buckets.keySet == (-1 to 10).toSet) // all cells present
    // 60% of current mass is above the reference max -> overflow
    assert(buckets(10).getLong(2) == 601L) // 1000..1600 are >= mx=1000
    assert(buckets(-1).getLong(2) == 0L)
    val psi = Drift.psi(ref, cur, "v").head().getLong(0)
    assert(psi > 250000L, s"a 60% shift must read as drifted, got $psi")
    // below-range drift fills the underflow bucket symmetrically
    val low = (1 to 100).map(i => i.toDouble - 500).toDF("v")
    assert(Drift.psiByBucket(ref, low, "v").collect()
      .find(_.getInt(0) == -1).get.getLong(2) == 100L)
  }

  test("hand-computed two-bucket case") {
    val r2 = Seq(1.0, 1.0, 1.0, 2.0).toDF("v") // 3 low, 1 high(=mx -> overflow)
    val c2 = Seq(1.0, 2.0).toDF("v")
    val rows = Drift.psiByBucket(r2, c2, "v", k = 2)
      .collect().map(x => x.getInt(0) -> x).toMap
    // mn=1, mx=2: bucket0 = [1,1.5), bucket1 = [1.5,2), overflow = >=2
    assert(rows(0).getLong(1) == 3L && rows(0).getLong(2) == 1L)
    assert(rows(2).getLong(1) == 1L && rows(2).getLong(2) == 1L)
    // term(bucket0) = (0.75-0.5)*ln(1.5)*1e6 rounded
    val want = math.floor(0.25 * math.log(0.75 / 0.5) * 1000000 + 0.5).toLong
    assert(rows(0).getLong(3) == want)
    assert(rows(2).getLong(3) ==
      math.floor(-0.25 * math.log(0.25 / 0.5) * 1000000 + 0.5).toLong)
  }

  test("degenerate inputs: empty sides rejected, constant reference degrades") {
    intercept[IllegalArgumentException] {
      Drift.psi(ref.where(lit(false)), ref, "v")
    }
    // all-equal reference: a point mass has no interior width — ALL
    // in-range values satisfy v >= mx and land in the overflow cell
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val rows = Drift.psiByBucket(const, const, "v").collect()
    assert(rows.map(_.getLong(3)).sum == 0L) // identical -> zero drift
    assert(rows.find(_.getInt(0) == 10).get.getLong(1) == 3L) // overflow holds the mass
  }
}
