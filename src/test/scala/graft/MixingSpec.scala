package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mixing

class MixingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"src${i % 4}")).toDF("id", "dom")

  test("rate 1.0 keeps every row of the domain; rate 0.0 drops all") {
    val df = corpus(400)
    val kept = Mixing.weightedSample(df, "dom", "id",
      Seq("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.0)
    val bySrc = kept.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(bySrc.getOrElse("src0", 0L) == 100L)
    assert(!bySrc.contains("src1"))
    assert(!bySrc.contains("src2")) // default 0.0
  }

  test("sampled fraction tracks the rate and is partitioning-invariant") {
    val df = corpus(4000)
    val pick = Mixing.weightedSample(df, "dom", "id",
      Seq("src0" -> 0.5, "src1" -> 0.25), defaultRate = 0.1, salt = "t")
    val ids = pick.select("id").as[Long].collect().toSet
    val n0 = ids.count(_ % 4 == 0)
    val n1 = ids.count(_ % 4 == 1)
    // 1000 keys per domain; 5-sigma binomial bands
    assert(math.abs(n0 - 500) < 80, s"src0 kept $n0 of 1000 at rate 0.5")
    assert(math.abs(n1 - 250) < 70, s"src1 kept $n1 of 1000 at rate 0.25")
    val again = Mixing.weightedSample(df.repartition(13), "dom", "id",
      Seq("src0" -> 0.5, "src1" -> 0.25), defaultRate = 0.1, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(again == ids)
  }

  test("broadcast-join rate path (>WhenChainMaxRates) equals the when-chain path") {
    val df = corpus(4000)
    val real = Seq("src0" -> 0.5, "src1" -> 0.25, "src2" -> 1.0)
    // pad with unused domains to force the join path; the real
    // domains' semantics must not change
    val padded = real ++ (0 until (Mixing.WhenChainMaxRates + 10))
      .map(i => s"unused$i" -> 0.7)
    assert(padded.size > Mixing.WhenChainMaxRates)
    def ids(rates: Seq[(String, Double)], d: org.apache.spark.sql.DataFrame) =
      Mixing.weightedSample(d, "dom", "id", rates, defaultRate = 0.1,
        salt = "jp").select("id").as[Long].collect().toSet
    val viaChain = ids(real, df)
    val viaJoin = ids(padded, df)
    assert(viaJoin == viaChain)
    // partitioning-invariant on the join path too
    assert(ids(padded, df.repartition(13)) == viaChain)
    // duplicate domain entries: FIRST wins on both paths
    val dup = Seq("src0" -> 1.0, "src0" -> 0.0)
    val dupPadded = dup ++ padded.drop(1)
    val chainDup = ids(dup, df).count(_ % 4 == 0)
    val joinDup = ids(dupPadded, df).count(_ % 4 == 0)
    assert(chainDup == 1000 && joinDup == 1000,
      s"first-wins broke: chain=$chainDup join=$joinDup")
    // NULL domains fall to defaultRate on the join path
    val withNull = (0L until 400L)
      .map(i => (i, null.asInstanceOf[String])).toDF("id", "dom")
    val keptNull = Mixing.weightedSample(withNull, "dom", "id", padded,
      defaultRate = 1.0, salt = "jp").count()
    assert(keptNull == 400L)
    // output schema unchanged (helper columns dropped)
    assert(Mixing.weightedSample(df, "dom", "id", padded, 0.1, "jp")
      .columns.toSeq == df.columns.toSeq)
  }

  test("sampleSql evaluates to the identical keep-set in Spark SQL") {
    corpus(1000).createOrReplaceTempView("mix_corpus")
    // sampleSql targets DuckDB (bare VARCHAR, like Splits.splitSql);
    // Spark's parser wants STRING for the same cast
    val pred = Mixing.sampleSql("dom", "id",
      Seq("src0" -> 0.5, "src1" -> 0.25), defaultRate = 0.1, salt = "t")
      .replace("AS VARCHAR", "AS STRING")
    val viaSql = spark.sql(
      s"SELECT id FROM mix_corpus WHERE $pred").as[Long].collect().toSet
    val viaOp = Mixing.weightedSample(corpus(1000), "dom", "id",
      Seq("src0" -> 0.5, "src1" -> 0.25), defaultRate = 0.1, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(viaSql == viaOp)
  }

  test("temperatureRates refuses cardinalities beyond maxDomains instead of sizing the driver to them") {
    val many = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("id", "dom")
    val e = intercept[IllegalArgumentException] {
      Mixing.temperatureRates(many, "dom", alpha = 0.5, maxDomains = 10)
    }
    assert(e.getMessage.contains("distinct domains"))
    // at or under the bound: all domains get a rate as before
    val ok = Mixing.temperatureRates(many, "dom", alpha = 0.5, maxDomains = 50)
    assert(ok.size == 50)
  }

  test("capPerDomain keeps at most k per domain, matching the window form") {
    val df = corpus(4000)
    val capped = Mixing.capPerDomain(df, "dom", "id", k = 17, salt = "c")
    val ids = capped.select("id").as[Long].collect().toSet
    val byDom = capped.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom.values.forall(_ == 17L), s"caps: $byDom")
    // reference: row_number window over the same hash order
    val w = org.apache.spark.sql.expressions.Window.partitionBy("dom")
      .orderBy(substring(md5(concat(lit("c"), $"id".cast("string"))), 1, 8), $"id")
    val ref = df.withColumn("rn", row_number().over(w)).where($"rn" <= 17)
      .select("id").as[Long].collect().toSet
    assert(ids == ref)
    val again = Mixing.capPerDomain(df.repartition(11), "dom", "id", 17, "c")
      .select("id").as[Long].collect().toSet
    assert(again == ids)
  }

  test("capPerDomain caps each domain independently when domains share keys") {
    // the same key exists in BOTH domains: selection in one domain
    // must not smuggle the other domain's row past its cap
    val df = (0L until 50L).flatMap(i => Seq((i, "a"), (i, "b")))
      .toDF("id", "dom")
    val capped = Mixing.capPerDomain(df, "dom", "id", k = 7, salt = "s")
    val byDom = capped.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom == Map("a" -> 7L, "b" -> 7L), s"caps leaked across domains: $byDom")
    // and the selections differ (different effective hash order per
    // domain would be wrong — same hash, but independent top-k)
    val aIds = capped.where($"dom" === "a").select("id").as[Long].collect().toSet
    val bIds = capped.where($"dom" === "b").select("id").as[Long].collect().toSet
    assert(aIds == bIds) // same hash on the same key space → same pick
  }

  test("capPerDomain: a NULL-domain slice is capped as its own group, not dropped") {
    val df = ((0L until 30L).map(i => (i, "a")) ++
      (100L until 130L).map(i => (i, null.asInstanceOf[String])))
      .toDF("id", "dom")
    val capped = Mixing.capPerDomain(df, "dom", "id", k = 5, salt = "n")
    val byDom = capped.groupBy("dom").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byDom == Map(Some("a") -> 5L, None -> 5L),
      s"NULL-domain rows must cap like any group: $byDom")
    // the NULL group's survivors come from the NULL slice
    val nullIds = capped.where($"dom".isNull).select("id").as[Long].collect()
    assert(nullIds.forall(_ >= 100L) && nullIds.length == 5)
  }

  test("epochs: whole factors replicate exactly, fractional tail at rate") {
    val df = corpus(4000)
    val rep = Mixing.epochs(df, "dom", "id",
      Seq("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.4), defaultFactor = 1.0,
      salt = "r")
    val byDomEpoch = rep.groupBy("dom", "epoch").count()
      .as[(String, Int, Long)].collect()
      .map { case (d, e, n) => (d, e) -> n }.toMap
    assert(byDomEpoch(("src0", 0)) == 1000L && byDomEpoch(("src0", 1)) == 1000L)
    val tail = byDomEpoch(("src0", 2))
    assert(math.abs(tail - 500L) < 80, s"src0 fractional epoch kept $tail")
    assert(byDomEpoch(("src1", 0)) == 1000L && byDomEpoch(("src1", 1)) == 1000L &&
      !byDomEpoch.contains(("src1", 2)))
    val frac2 = byDomEpoch(("src2", 0))
    assert(math.abs(frac2 - 400L) < 80, s"src2 kept $frac2 at factor 0.4")
    assert(byDomEpoch(("src3", 0)) == 1000L) // defaultFactor 1.0
    // each (id, epoch) pair appears exactly once — copies distinguishable
    assert(rep.select("id", "epoch").distinct().count() == rep.count())
  }

  test("tokenBudget takes a greedy hash-order prefix, never overshooting") {
    val rnd = new scala.util.Random(11)
    val df = (0L until 300L).map(i =>
      (i, s"src${i % 3}", 10L + rnd.nextInt(90))).toDF("id", "dom", "nt")
    val budgets = Seq("src0" -> 2000L, "src1" -> 150L, "src2" -> 0L)
    val kept = Mixing.tokenBudget(df, "dom", "id", "nt", budgets, salt = "t")
    val byDom = kept.groupBy("dom").agg(sum($"nt").as("tok"))
      .as[(String, Long)].collect().toMap
    assert(byDom("src0") <= 2000L && byDom("src0") > 1900L) // nearly full
    assert(byDom("src1") <= 150L && byDom.getOrElse("src2", 0L) == 0L)
    assert(!byDom.contains("src2")) // zero budget → domain absent
    // greedy-prefix property: the kept set IS the hash-order prefix —
    // every kept doc hashes before every dropped doc of its domain
    val hashed = df.withColumn("h",
      substring(md5(concat(lit("t"), $"id".cast("string"))), 1, 8))
    val keptIds = kept.select("id").as[Long].collect().toSet
    Seq("src0", "src1").foreach { dom =>
      val ordered = hashed.where($"dom" === dom).orderBy($"h", $"id")
        .select("id").as[Long].collect()
      val keptCount = ordered.count(keptIds)
      assert(ordered.take(keptCount).forall(keptIds), s"$dom not a prefix")
    }
    // deterministic under repartition
    val again = Mixing.tokenBudget(df.repartition(13), "dom", "id", "nt",
      budgets, salt = "t").select("id").as[Long].collect().toSet
    assert(again == keptIds)
  }

  test("tokenBudgetSharded equals the single-window form, hot domain included") {
    val rnd = new scala.util.Random(23)
    // src0 is the hot domain (~90% of rows) — the case the two-level
    // cumsum exists for
    val df = (0L until 600L).map { i =>
      val dom = if (i % 10 < 9) "src0" else s"src${1 + (i % 10 - 9)}"
      (i, dom, 5L + rnd.nextInt(60))
    }.toDF("id", "dom", "nt")
    val budgets = Seq("src0" -> 9000L, "src1" -> 300L)
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("id").as[Long].collect().toSet
    val single = ids(Mixing.tokenBudget(df, "dom", "id", "nt", budgets,
      defaultBudget = 100L, salt = "tbs"))
    // 16 and 256 shards, plus a repartitioned input: all identical
    val sharded1 = ids(Mixing.tokenBudgetSharded(df, "dom", "id", "nt",
      budgets, defaultBudget = 100L, salt = "tbs"))
    val sharded2 = ids(Mixing.tokenBudgetSharded(df.repartition(17), "dom",
      "id", "nt", budgets, defaultBudget = 100L, salt = "tbs", shardChars = 2))
    assert(sharded1 == single)
    assert(sharded2 == single)
    // helper columns don't leak
    val out = Mixing.tokenBudgetSharded(df, "dom", "id", "nt", budgets,
      defaultBudget = 100L, salt = "tbs")
    assert(out.columns.toSeq == Seq("id", "dom", "nt"))
  }

  test("shuffled is a deterministic permutation; salt changes the order") {
    val df = corpus(500)
    val a = Mixing.shuffled(df, "id", "s1").select("id").as[Long].collect()
    val b = Mixing.shuffled(df, "id", "s1").select("id").as[Long].collect()
    val c = Mixing.shuffled(df, "id", "s2").select("id").as[Long].collect()
    assert(a.toSet == (0L until 500L).toSet)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(c.toSet == a.toSet)
  }
}
