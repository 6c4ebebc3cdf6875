package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy
import org.apache.spark.sql.functions._

/** k-anonymity: violation detection, satisfied-k, suppression
  * enforcement, NULL-cohort semantics. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def people = Seq(
    // cohort (30, "m"): 3 rows; (30, "f"): 1 row; (40, "m"): 2 rows
    (1L, 30, "m"), (2L, 30, "m"), (3L, 30, "m"),
    (4L, 30, "f"),
    (5L, 40, "m"), (6L, 40, "m"),
    // NULL cohort: 1 row — a cohort like any other
    (7L, 50, null.asInstanceOf[String]))
    .toDF("id", "age", "sex")

  test("violations lists exactly the cohorts under k, NULLs included") {
    val v = Privacy.kAnonymityViolations(people, Seq("age", "sex"), k = 3)
      .collect().map(r => (r.getInt(0), Option(r.getString(1)), r.getLong(2)))
      .toSet
    assert(v == Set((30, Some("f"), 1L), (40, Some("m"), 2L),
      (50, None, 1L)))
  }

  test("kAnonymity reports the smallest cohort size") {
    assert(Privacy.kAnonymity(people, Seq("age", "sex"))
      .as[Long].head() == 1L)
    assert(Privacy.kAnonymity(people, Seq("age"))
      .as[Long].head() == 1L) // the 50/NULL row is its own age cohort
  }

  test("lDiversity counts distinct sensitive values per cohort; NULL sensitive is ONE value") {
    val t = Seq(
      // cohort (30,m): 3 rows, 3 distinct diagnoses → diverse at l=3
      (30, "m", "flu"), (30, "m", "cold"), (30, "m", "cough"),
      // cohort (40,m): 3 rows, all the same → 1-diverse (the leak)
      (40, "m", "flu"), (40, "m", "flu"), (40, "m", "flu"),
      // cohort (50,f): NULL + NULL + flu → 2 distinct (NULL is a value)
      (50, "f", null.asInstanceOf[String]),
      (50, "f", null.asInstanceOf[String]), (50, "f", "flu"))
      .toDF("age", "sex", "dx")
    val out = graft.operators.Privacy.lDiversity(t, Seq("age", "sex"), "dx", l = 2)
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("distinct_sensitive"),
          r.getAs[Boolean]("meets_l")))).toMap
    assert(out == Map(
      (30, "m") -> ((3L, 3L, true)),
      (40, "m") -> ((3L, 1L, false)),
      (50, "f") -> ((3L, 2L, true))))
  }

  test("suppressToK leaves a table that satisfies k; NULL cohorts suppress too") {
    val out = Privacy.suppressToK(people, Seq("age", "sex"), k = 3)
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(Privacy.kAnonymity(out, Seq("age", "sex")).as[Long].head() >= 3L)
    // k = 2 keeps the (40, m) pair, drops both singletons incl. NULL
    val out2 = Privacy.suppressToK(people, Seq("age", "sex"), k = 2)
    assert(out2.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 5L, 6L))
  }
}
