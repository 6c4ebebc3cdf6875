package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the md5-hex-bucket machinery every deterministic
  * selection operator rides on. */
class HexBucketSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("rateCut is monotone, 8-hex-wide, and exact at the boundaries") {
    val rs = (0 to 1000).map(_ / 1000.0)
    val cuts = rs.map(Mixing.rateCut)
    cuts.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, s"rateCut not monotone: $a > $b")
      case _ =>
    }
    assert(Mixing.rateCut(0.0) == "00000000")
    assert(Mixing.rateCut(1.0) == "g") // > every hex char: keeps ALL
    assert(Mixing.rateCut(2.0) == "g")
    cuts.init.foreach(c => assert(c.length == 8 && c.forall("0123456789abcdef".contains(_))))
    // granularity: adjacent representable rates produce distinct cuts
    assert(Mixing.rateCut(0.5) != Mixing.rateCut(0.5 + 1.0 / 4294967296.0 * 2))
  }

  test("Column and SQL forms of the prefix are byte-identical") {
    val df = (0L until 500L).toDF("id")
    df.createOrReplaceTempView("hexbucket_probe")
    for (width <- Seq(4, 8)) {
      val viaCol = df.select($"id",
        HexBucket.prefix($"id", "salt:", width).as("h"))
        .as[(Long, String)].collect().toMap
      val viaSql = spark.sql(
        s"SELECT id, ${HexBucket.prefixSql("id", "salt:", width)
          .replace("AS VARCHAR", "AS STRING")} AS h FROM hexbucket_probe")
        .as[(Long, String)].collect().toMap
      assert(viaCol == viaSql)
      viaCol.values.foreach(h => assert(h.length == width))
    }
  }
}
