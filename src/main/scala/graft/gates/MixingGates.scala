package graft.gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ivf, Sim, Text}
import graft.operators.{AsOfJoin, Dedup, Sessionize}
import graft.ops.{Dims, Quality}
import graft.sources.Tables

/** Corpus mixing/packing gates: splits, shuffling, caps, epochs,
  * token budgets, sequence packing, quantization, vector mean.
  *
  * Split out of SparkEntry (one gate map per operator family); the
  * driver contract is still the combined SparkEntry.queries /
  * SparkEntry.oracleSql. Helpers and shared oracle CTEs live in
  * [[GateSupport]].
  */
private[graft] object MixingGates {
  import GateSupport._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X30 [storage scale] symmetric int8 embedding quantization:
    // codes = floor(x/scale + 0.5) with scale = max|x|/127 (4-8×
    // storage reduction for ANN corpora). The gate checks per-vector
    // scale and the max reconstruction error — which the design bounds
    // by scale/2 — against an oracle replaying the same arithmetic.
    "x30_quantize" -> ((s, d) => {
      val e = Sim.asDouble(col("embedding"))
      t(s, d, "embeddings")
        .select(col("vec_id"), e.as("e"))
        .withColumn("sc", Sim.quantScale(col("e")))
        .withColumn("qv", Sim.quantize(col("e"), col("sc")))
        .select(col("vec_id"),
          round(col("sc"), 6).as("scale"),
          round(aggregate(
            zip_with(col("e"), Sim.dequantize(col("qv"), col("sc")),
              (a, r) => abs(a - r)),
            lit(0.0), (acc, x) => greatest(acc, x)), 6).as("max_err"))
        .orderBy(asc_nulls_first("vec_id"))
    }),

    // X36 sequence packing: documents → fixed-2048-token training
    // sequences, packed contiguously per (split, hash-shard) in
    // doc_id order — the shard-parallel form, so the 80% train split
    // sorts on 16 tasks, not one, and seq_id ranges are disjoint per
    // shard. Oracle replays the identical two-level window + shard
    // CASE (same md5-hex buckets).
    "x36_seq_packing" -> ((s, d) => {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val docs = graft.operators.Splits.hashSplit(
        t(s, d, "documents"), "doc_id", splits, "v1")
        .select(col("doc_id"), col("split"),
          graft.functions.Text.tokenCount(col("text")).as("nt"))
      graft.operators.Packing.contiguousSharded(
          docs, "split", "doc_id", "nt", 2048L, nShards = 16, salt = "pack")
        .groupBy(col("split"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).cast(LongType).as("n_tokens"))
        .orderBy(asc_nulls_first("split"), asc_nulls_first("seq_id"))
    }),

    // X79 quality-curriculum assembly (the mixture step between
    // scoring and training: rank the corpus by quality, cut into
    // deciles, keep each decile at a falling rate — best decile 100%,
    // worst 10%). The global rank uses Ranks.globalRowNumber — the
    // scale-safe two-level form, NOT a single-partition window — and
    // the per-decile sampling is the x37 md5-cut predicate, so every
    // stage is already individually oracle-proven; this gate pins the
    // composition (rank → floor-decile → rate cut) value-for-value.
    "x79_curriculum" -> ((s, d) => {
      val scored = t(s, d, "documents")
        .select(col("doc_id"), Text.qualityScore(col("text")).as("q"))
      val ranked = graft.operators.Ranks.globalRowNumber(
        scored, Seq(col("q").desc, col("doc_id").asc), "rnk")
      // counted off the ranked frame: globalRowNumber checkpoints its
      // sorted input, so this count reads the materialization instead
      // of re-running tokenization + scoring over the corpus
      val total = ranked.count()
      val bucketed = ranked
        .withColumn("bucket",
          floor((col("rnk") - 1).cast(DoubleType) * 10.0 /
            lit(total.toDouble)).cast(LongType))
        .withColumn("bstr", col("bucket").cast(StringType))
      val rates = (0 until 10).map(b => b.toString -> ((10 - b) / 10.0))
      graft.operators.Mixing.weightedSample(bucketed, "bstr", "doc_id",
          rates, defaultRate = 0.0, salt = "curr1")
        .select(col("doc_id"), col("bucket"), col("q"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X82 corpus-build composition — the ingest-to-mixture chain the
    // wave-28 operators exist for, in ONE gate: robots.txt politeness
    // (x74's rule fixture) ∧ quality floor (x08's score ≥ 0.77, the
    // corpus median — non-vacuous on both sides) → temperature-
    // balanced selection over the KEEPERS (x81's rule, sizes computed
    // from the filtered population, not the raw corpus — the linkage
    // this composition proves). Every stage is individually
    // oracle-proven; the composed oracle reassembles their exact SQL.
    "x82_corpus_build" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          robotsUrl(col("doc_id")).as("url"))
      val rules = robotsRules.toDF("host", "directive", "pattern")
      val allowedIds = graft.operators.Robots.verdicts(docs, rules)
        .where(col("allowed") === true).select(col("doc_id"))
      // pinned: temperatureSample reads its input twice (sizes pass +
      // the keep filter) — materialize the robots-join + quality
      // pipeline once instead of running it twice
      val keepers = docs
        .join(allowedIds, Seq("doc_id"), "left_semi")
        .where(Text.qualityScore(col("text")) >= 0.77)
        .localCheckpoint()
      graft.operators.Mixing.temperatureSample(keepers, "source", "doc_id",
          alpha = 0.5, maxRate = 0.8, salt = "build1")
        .select(col("doc_id"), col("source"))
        .orderBy(asc_nulls_first("doc_id"))
    }),

    // X81 temperature-balanced domain mixing (the mT5/LLaMA
    // language-balancing rule): keep rates r_d = min(1, maxRate ·
    // (n_d/n_max)^(α−1)) computed FROM THE DATA (one bounded
    // aggregation), then the x37 md5-cut predicate. α = 0.5 halves the
    // exponent so expected kept counts ∝ n_d^0.5 — the head domain is
    // cut to maxRate while the tail keeps everything. The oracle
    // recomputes sizes, rates, the exact %08x cut strings, and the
    // predicate in SQL.
    "x81_temperature_mix" -> ((s, d) => {
      graft.operators.Mixing.temperatureSample(
          t(s, d, "documents"), "source", "doc_id",
          alpha = 0.5, maxRate = 0.9, salt = "temp1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast(LongType).as("id_sum"))
        .orderBy(asc_nulls_first("source"))
    }),

    // X37 deterministic domain mixing: per-source sampling rates as a
    // pure function of (salt, doc_id) — the mixture-weights stage of a
    // training pipeline. Same md5-hex-bucket construction as x24, so
    // the oracle evaluates the identical predicate.
    "x37_domain_mix" -> ((s, d) => {
      val rates = Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)
      graft.operators.Mixing.weightedSample(t(s, d, "documents"),
          "source", "doc_id", rates, defaultRate = 0.02, salt = "mix1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).cast(LongType).as("min_id"),
          max(col("doc_id")).cast(LongType).as("max_id"))
        .orderBy(asc_nulls_first("source"))
    }),

    // X38 deterministic corpus shuffle: ORDER BY seeded md5(key) —
    // executed as range-partition + local sort, the scale-correct
    // global shuffle. The head-25 emission pins the ORDER itself
    // (the driver's compare is otherwise order-insensitive); the
    // operator drops its helper sort key, so the gate re-derives it
    // from (salt, key) to pin the key values too.
    "x38_corpus_shuffle" -> ((s, d) =>
      graft.operators.Mixing.shuffled(
          t(s, d, "documents").select(col("doc_id")), "doc_id", salt = "shuf1")
        .limit(25)
        .withColumn("shuffle_key",
          md5(concat(lit("shuf1"), col("doc_id").cast("string"))))),

    // X39 per-domain cap: at most 10 docs per source, selected as the
    // 10 smallest seeded hashes via the bounded-heap TopK UDAF (map
    // partitions forward ≤k candidates per domain — no per-domain
    // window sort of the corpus). sum(doc_id) pins exact membership.
    "x39_domain_cap" -> ((s, d) =>
      graft.operators.Mixing.capPerDomain(t(s, d, "documents"),
          "source", "doc_id", k = 10, salt = "cap1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast(LongType).as("id_sum"))
        .orderBy(asc_nulls_first("source"))),

    // X40 per-domain epoch repetition (the "domain d runs f_d epochs"
    // mixture spec; fractional last epoch at a deterministic hash
    // rate). Grouped by (source, epoch) so full copies AND the
    // fractional tail are each pinned exactly.
    "x40_domain_epochs" -> ((s, d) =>
      graft.operators.Mixing.epochs(t(s, d, "documents"),
          "source", "doc_id",
          Seq("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4),
          defaultFactor = 1.0, salt = "rep1")
        .groupBy(col("source"), col("epoch").cast(LongType).as("epoch"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast(LongType).as("id_sum"))
        .orderBy(asc_nulls_first("source"), asc_nulls_first("epoch"))),

    // X43 deterministic token-budget selection: greedy prefix of the
    // seeded-hash order per domain until the budget would be passed —
    // "take N tokens of domain d". Budgets chosen so the gate
    // exercises partial take (src0), near-empty take (src1), zero
    // budget (src2 absent from output), and the default (others).
    "x43_token_budget" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("nt", graft.functions.Text.tokenCount(col("text")))
      graft.operators.Mixing.tokenBudget(docs, "source", "doc_id", "nt",
          Seq("src0" -> 700L, "src1" -> 200L, "src2" -> 0L),
          defaultBudget = 600L, salt = "tb1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("nt")).cast(LongType).as("tok"))
        .orderBy(asc_nulls_first("source"))
    }),

    // X43b the same token-budget selection through the SHARDED
    // two-level cumsum (shard-local prefix sums + broadcast shard
    // offsets — no single task sorts a hot domain): output is
    // identical to x43 by construction, so it shares x43's oracle —
    // the gate proves the scale-shaped path, not just the property
    // test.
    "x43b_token_budget_sharded" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("nt", graft.functions.Text.tokenCount(col("text")))
      graft.operators.Mixing.tokenBudgetSharded(docs, "source", "doc_id", "nt",
          Seq("src0" -> 700L, "src1" -> 200L, "src2" -> 0L),
          defaultBudget = 600L, salt = "tb1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("nt")).cast(LongType).as("tok"))
        .orderBy(asc_nulls_first("source"))
    }),

    // X24 deterministic train/val/test split (md5 hex buckets —
    // map-only, engine-portable, stable under corpus growth; the
    // oracle derives the identical assignment from the same
    // generated CASE expression)
    "x24_hash_split" -> ((s, d) => {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      graft.operators.Splits.hashSplit(t(s, d, "documents"), "doc_id", splits, "v1")
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).cast("long").as("min_id"),
          max(col("doc_id")).cast("long").as("max_id"))
        .orderBy(asc_nulls_first("split"))
    }),

    // X23 [A6 UDAF] mean-pooled embedding per label (class prototype)
    // through the VectorMean Aggregator — buffer is one vector+count,
    // so the shuffle carries one partial row per (partition, label)
    // instead of N·dim exploded rows. Elements pre-rounded with the
    // explicit half-up formula and fixed-formatted on both sides so
    // the array canonicalization is engine-exact.
    "x23_vector_mean" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val canon = (x: Column) =>
        format_string("%.4f", floor(x * 10000 + lit(0.5)) / 10000)
      emb.select(col("label"), Sim.asDouble(col("embedding")).as("v"))
        .groupBy("label")
        .agg(graft.functions.VectorAgg.meanVec(col("v")).as("mv"),
          count(lit(1)).cast("long").as("n"))
        .select(col("label").cast("long").as("label"),
          array_join(transform(col("mv"), canon), ",").as("mean_vec"),
          col("n"))
        .orderBy(asc_nulls_first("label"))
    }),

    // X87 DSIR importance resampling (Xie et al. 2023): select 120
    // raw docs whose hashed-unigram+bigram bag looks most like the
    // src0 target slice, sampled ∝ exp₂(weight) via hash-seeded
    // Gumbel-top-k. Per-bucket log-ratios quantized to LONG before
    // the per-doc sum (x57/x73 convention) so the oracle replays
    // hashing, histograms, smoothing, sums, Gumbel keys, and the
    // top-k exactly.
    "x87_dsir" -> ((s, d) =>
      graft.operators.Dsir.resample(
          t(s, d, "documents"),
          t(s, d, "documents").where(col("source") === "src0"),
          k = 120)
        .orderBy(asc_nulls_first("doc_id"))),

    // X108 [sampling] exact-N stratified sampling: exactly 50
    // customers per market segment, selected by deterministic
    // md5-hash order — reproducible across runs/engines/partitionings
    // (what rand()-based sample() can never give a corpus build).
    // The oracle replays the identical hash arithmetic through a
    // per-stratum row_number and must select the SAME rows with the
    // SAME ranks. No per-stratum window sort on the Spark side (a
    // hot stratum would collapse to one task): one global range-rank
    // via Ranks.globalRowNumber, in-stratum rank by min-rank offset.
    "x108_stratified_sample" -> ((s, d) =>
      graft.operators.Sampling.stratifiedExact(
          t(s, d, "customer"), "c_mktsegment", "c_custkey",
          n = 50, salt = "s1")
        .select(col("c_mktsegment"), col("c_custkey").cast("long"),
          col("in_stratum_rank"))
        .orderBy(asc_nulls_first("c_mktsegment"), col("in_stratum_rank"))),

    // X108B [sampling] weighted sampling WITHOUT replacement
    // (Efraimidis–Spirakis 2006): 150 parts drawn ∝ p_retailprice via
    // the deterministic-uniform score ln(u)/w, global top-n — plans
    // as TakeOrderedAndProject (per-partition heaps, no global
    // sort). The score itself is never output (ln is the one op
    // libm implementations may round differently); the oracle
    // replays score + top-n and the SELECTED SET must match.
    "x108b_weighted_sample" -> ((s, d) =>
      graft.operators.Sampling.weightedSample(
          t(s, d, "part"), "p_partkey", "p_retailprice",
          n = 150, salt = "w1")
        .select(col("p_partkey").cast("long"),
          round(col("p_retailprice"), 2).as("p_retailprice"))
        .orderBy(col("p_partkey"))),

    // X118 [sampling] stratified EXACT-FRACTION split: 80/10/10
    // within every market segment by hash-rank against ⌈c_i·n⌉
    // boundaries — each stratum within one row of its exact
    // proportions (x24's global hashSplit only converges in
    // expectation per stratum). Membership pinned by per-cell count
    // AND key checksum; the oracle replays the rank construction and
    // the IDENTICAL cumulative-weight doubles (0.8+0.1 is
    // 0.9000000000000001 — a 0.9 literal would ceil differently).
    "x118_stratified_split" -> ((s, d) =>
      graft.operators.Sampling.stratifiedSplit(
          t(s, d, "customer"), "c_mktsegment", "c_custkey",
          splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          salt = "sp1")
        .groupBy(col("c_mktsegment"), col("split"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_custkey")).cast("long").as("key_sum"))
        .orderBy(asc_nulls_first("c_mktsegment"),
          asc_nulls_first("split"))),
  )

  def oracleSql: Map[String, String] = Map(
    "x108_stratified_sample" -> {
      val u = graft.operators.Sampling.uniformSql("c_custkey", "s1")
      s"""SELECT c_mktsegment, CAST(c_custkey AS BIGINT) AS c_custkey,
                 CAST(rn AS BIGINT) AS in_stratum_rank
          FROM (SELECT c_mktsegment, c_custkey,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY $u, c_custkey) AS rn
                FROM customer)
          WHERE rn <= 50
          ORDER BY c_mktsegment NULLS FIRST, in_stratum_rank"""
    },
    "x108b_weighted_sample" -> {
      val score = graft.operators.Sampling.weightedScoreSql(
        "p_partkey", "p_retailprice", "w1")
      s"""SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
                 ROUND(p_retailprice, 2) AS p_retailprice
          FROM (SELECT p_partkey, p_retailprice FROM part
                WHERE $score IS NOT NULL
                ORDER BY $score DESC, p_partkey LIMIT 150)
          ORDER BY p_partkey"""
    },
    "x118_stratified_split" -> {
      val u = graft.operators.Sampling.uniformSql("c_custkey", "sp1")
      val caseExpr = graft.operators.Sampling.stratifiedSplitCaseSql(
        "rn", "n", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      s"""WITH r AS (SELECT c_mktsegment, c_custkey,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY $u, c_custkey) AS rn,
                  COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
               FROM customer),
         s AS (SELECT c_mktsegment, c_custkey,
                 $caseExpr AS split
               FROM r)
         SELECT c_mktsegment, split, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(c_custkey) AS BIGINT) AS key_sum
         FROM s GROUP BY 1, 2
         ORDER BY c_mktsegment NULLS FIRST, split NULLS FIRST"""
    },
    "x24_hash_split" -> {
      val splitExpr = graft.operators.Splits.splitSql(
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "v1")
      s"""SELECT $splitExpr AS split, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MIN(doc_id) AS BIGINT) AS min_id,
                 CAST(MAX(doc_id) AS BIGINT) AS max_id
          FROM documents GROUP BY 1 ORDER BY split NULLS FIRST"""
    },
    "x23_vector_mean" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         u AS (SELECT label,
                 unnest(list_transform(range(1, len(v) + 1),
                   i -> {'p': i, 'x': v[CAST(i AS INT)]})) AS s
               FROM e),
         a AS (SELECT label, s.p AS p, avg(s.x) AS m FROM u GROUP BY 1, 2),
         l AS (SELECT label,
                 list(printf('%.4f', floor(m * 10000 + 0.5) / 10000) ORDER BY p) AS mv
               FROM a GROUP BY 1),
         c AS (SELECT label, COUNT(*) AS n FROM e GROUP BY 1)
         SELECT CAST(l.label AS BIGINT) AS label,
                array_to_string(l.mv, ',') AS mean_vec,
                CAST(c.n AS BIGINT) AS n
         FROM l JOIN c USING (label)
         ORDER BY label NULLS FIRST""",
    // the x74 robots replay + the x08 quality replay + the x81
    // temperature replay, composed verbatim over the keeper set
    "x82_corpus_build" ->
      s"""WITH $tokCte,
         $punctCte,
         sr AS (
           SELECT doc_id, len(ts) AS n_tok,
                  CASE WHEN len(ts) > 0 THEN
                    ROUND(CAST(len(list_filter(ts,
                          t -> list_contains(${sqlList(Text.enStopwords)}, t)))
                      AS DOUBLE) / len(ts), 4)
                  ELSE 0.0 END AS stopword_ratio
           FROM tok),
         qual AS (
           SELECT d.doc_id,
                  ROUND(
                    LEAST(CASE WHEN sr.n_tok BETWEEN 20 AND 5000 THEN 1.0
                               WHEN sr.n_tok > 0 THEN sr.n_tok / 20.0
                               ELSE 0.0 END, 1.0) * 0.4 +
                    (1.0 - LEAST(pr.punct_ratio * 5.0, 1.0)) * 0.3 +
                    LEAST(sr.stopword_ratio * 4.0, 1.0) * 0.3, 4) AS q
           FROM documents d JOIN pr USING (doc_id) JOIN sr USING (doc_id)),
         $robotsOracleCtes,
         keepers AS (
           SELECT d.doc_id, d.source
           FROM documents d
           JOIN verdicts v USING (doc_id)
           JOIN qual q USING (doc_id)
           WHERE v.allowed = TRUE AND q.q >= 0.77),
         sizes AS (SELECT source, COUNT(*) AS n FROM keepers GROUP BY source),
         mx AS (SELECT MAX(n) AS nmax FROM sizes),
         rates AS (SELECT source,
                          floor(LEAST(1.0, power(n / CAST(nmax AS DOUBLE), -0.5)
                                           * 0.8) * 1000000 + 0.5)
                            / 1000000 AS rt
                   FROM sizes CROSS JOIN mx),
         cuts AS (SELECT source,
                         CASE WHEN rt >= 1.0 THEN 'g'
                              ELSE lower(lpad(to_hex(CAST(LEAST(
                                     round(rt * 4294967296.0),
                                     4294967295) AS BIGINT)), 8, '0'))
                         END AS cut
                  FROM rates)
         SELECT k.doc_id, k.source
         FROM keepers k JOIN cuts c USING (source)
         WHERE substr(md5('build1' || CAST(k.doc_id AS VARCHAR)), 1, 8) < c.cut
         ORDER BY k.doc_id NULLS FIRST""",

    // sizes → rates → the exact %08x cuts (math.round = half-up for
    // positives, LEAST-capped like rateCut) → the md5-cut predicate
    "x81_temperature_mix" ->
      """WITH sizes AS (SELECT source, COUNT(*) AS n FROM documents
                        GROUP BY source),
         mx AS (SELECT MAX(n) AS nmax FROM sizes),
         rates AS (SELECT source,
                          floor(LEAST(1.0, power(n / CAST(nmax AS DOUBLE), -0.5)
                                           * 0.9) * 1000000 + 0.5)
                            / 1000000 AS r
                   FROM sizes CROSS JOIN mx),
         cuts AS (SELECT source,
                         CASE WHEN r >= 1.0 THEN 'g'
                              ELSE lower(lpad(to_hex(CAST(LEAST(
                                     round(r * 4294967296.0),
                                     4294967295) AS BIGINT)), 8, '0'))
                         END AS cut
                  FROM rates)
         SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
                CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
         FROM documents d JOIN cuts c ON c.source = d.source
         WHERE substr(md5('temp1' || CAST(d.doc_id AS VARCHAR)), 1, 8) < c.cut
         GROUP BY d.source
         ORDER BY d.source NULLS FIRST""",

    // quality replayed exactly as in x08, then the same global rank,
    // floor-decile, and md5-cut predicate
    "x79_curriculum" -> {
      val pred = graft.operators.Mixing.sampleSql(
        "CAST(bucket AS VARCHAR)", "doc_id",
        (0 until 10).map(b => b.toString -> ((10 - b) / 10.0)),
        defaultRate = 0.0, salt = "curr1")
      s"""WITH $tokCte,
         $punctCte,
         sr AS (
           SELECT doc_id, len(ts) AS n_tok,
                  CASE WHEN len(ts) > 0 THEN
                    ROUND(CAST(len(list_filter(ts,
                          t -> list_contains(${sqlList(Text.enStopwords)}, t)))
                      AS DOUBLE) / len(ts), 4)
                  ELSE 0.0 END AS stopword_ratio
           FROM tok),
         qual AS (
           SELECT d.doc_id,
                  ROUND(
                    LEAST(CASE WHEN sr.n_tok BETWEEN 20 AND 5000 THEN 1.0
                               WHEN sr.n_tok > 0 THEN sr.n_tok / 20.0
                               ELSE 0.0 END, 1.0) * 0.4 +
                    (1.0 - LEAST(pr.punct_ratio * 5.0, 1.0)) * 0.3 +
                    LEAST(sr.stopword_ratio * 4.0, 1.0) * 0.3, 4) AS q
           FROM documents d JOIN pr USING (doc_id) JOIN sr USING (doc_id)),
         r AS (SELECT doc_id, q,
                      ROW_NUMBER() OVER (ORDER BY q DESC, doc_id) AS rnk,
                      COUNT(*) OVER () AS n
               FROM qual),
         b AS (SELECT doc_id, q,
                      CAST(floor((rnk - 1) * 10.0 / n) AS BIGINT) AS bucket
               FROM r)
         SELECT doc_id, bucket, q FROM b WHERE $pred
         ORDER BY doc_id NULLS FIRST"""
    },

    "x37_domain_mix" -> {
      val pred = graft.operators.Mixing.sampleSql("source", "doc_id",
        Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
        defaultRate = 0.02, salt = "mix1")
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MIN(doc_id) AS BIGINT) AS min_id,
                 CAST(MAX(doc_id) AS BIGINT) AS max_id
          FROM documents WHERE $pred
          GROUP BY source ORDER BY source NULLS FIRST"""
    },
    "x38_corpus_shuffle" ->
      """SELECT doc_id,
                md5('shuf1' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         FROM documents ORDER BY shuffle_key LIMIT 25""",
    // full DSIR replay: tokenize, bigram, hex-bucket, both histograms,
    // add-1 smoothed quantized log2 ratios, integer per-doc sums,
    // hash-seeded Gumbel keys, top-120
    "x87_dsir" ->
      """WITH tk AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '') AS ts
           FROM documents),
         g AS (
           SELECT doc_id, unnest(ts) AS gram FROM tk
           UNION ALL
           SELECT doc_id, unnest(list_transform(range(1, len(ts)),
                    i -> ts[i] || ' ' || ts[i + 1])) AS gram
           FROM tk),
         b AS (SELECT doc_id, substr(md5('dsir:' || gram), 1, 3) AS bucket
               FROM g),
         hraw AS (SELECT bucket, COUNT(*) AS cr FROM b GROUP BY bucket),
         htgt AS (SELECT b.bucket, COUNT(*) AS ct
                  FROM b JOIN documents d ON d.doc_id = b.doc_id
                  WHERE d.source = 'src0' GROUP BY b.bucket),
         tot AS (SELECT (SELECT SUM(cr) FROM hraw) AS tr,
                        (SELECT COALESCE(SUM(ct), 0) FROM htgt) AS tt),
         ratio AS (
           SELECT r.bucket,
                  CAST(floor((ln((COALESCE(t.ct, 0) + 1.0) / (tot.tt + 4096.0))
                              - ln((r.cr + 1.0) / (tot.tr + 4096.0)))
                             / ln(2.0) * 10000 + 0.5) AS BIGINT) AS lr
           FROM hraw r LEFT JOIN htgt t ON t.bucket = r.bucket
           CROSS JOIN tot),
         w AS (SELECT b.doc_id, CAST(SUM(ratio.lr) AS BIGINT) AS weight_e4
               FROM b JOIN ratio ON ratio.bucket = b.bucket
               GROUP BY b.doc_id),
         wall AS (SELECT d.doc_id, COALESCE(w.weight_e4, 0) AS weight_e4
                  FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id),
         keys AS (
           SELECT doc_id, weight_e4,
                  weight_e4 + CAST(floor(-ln(-ln(
                    (CAST(concat('0x', substr(md5('dsirg:' ||
                       CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                    / 4294967296.0)) / ln(2.0) * 10000 + 0.5) AS BIGINT)
                    AS gkey
           FROM wall)
         SELECT doc_id, weight_e4 FROM
           (SELECT doc_id, weight_e4 FROM keys
            ORDER BY gkey DESC, doc_id LIMIT 120)
         ORDER BY doc_id NULLS FIRST""",
    "x43_token_budget" -> tokenBudgetOracleSql,
    // the sharded two-level form is output-identical by construction,
    // so it gates against the very same single-window oracle
    "x43b_token_budget_sharded" -> tokenBudgetOracleSql,
    "x39_domain_cap" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM (SELECT * FROM documents
               QUALIFY row_number() OVER (PARTITION BY source
                 ORDER BY substr(md5('cap1' || CAST(doc_id AS VARCHAR)), 1, 8),
                          doc_id) <= 10)
         GROUP BY source ORDER BY source NULLS FIRST""",
    "x40_domain_epochs" -> {
      val (maxEpochs, pred) = graft.operators.Mixing.epochsSql(
        "source", "doc_id",
        Seq("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4),
        defaultFactor = 1.0, salt = "rep1")
      s"""SELECT source, CAST(epoch AS BIGINT) AS epoch,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(doc_id) AS BIGINT) AS id_sum
          FROM documents
          CROSS JOIN (SELECT unnest(range(0, $maxEpochs)) AS epoch) e
          WHERE $pred
          GROUP BY source, epoch
          ORDER BY source NULLS FIRST, epoch NULLS FIRST"""
    },
    "x36_seq_packing" -> {
      val splitExpr = graft.operators.Splits.splitSql(
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "v1")
      val shardExpr = graft.operators.Packing.shardSql("doc_id", 16, "pack")
      s"""WITH tk AS (
           SELECT doc_id, $splitExpr AS split, $shardExpr AS shard,
                  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                       x -> x <> '')) AS BIGINT) AS nt
           FROM documents),
         o AS (
           SELECT split, shard, doc_id, nt,
                  COALESCE(SUM(nt) OVER (PARTITION BY split, shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM tk)
         SELECT split, CAST(FLOOR(off / 2048) * 16 + shard AS BIGINT) AS seq_id,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS n_tokens
         FROM o GROUP BY 1, 2
         ORDER BY split NULLS FIRST, seq_id NULLS FIRST"""
    },
    "x30_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         s AS (SELECT vec_id, e,
                      list_max(list_transform(e, x -> abs(x))) / 127.0 AS sc
               FROM v),
         q AS (SELECT vec_id, e, sc,
                      list_transform(e, x -> CASE WHEN sc > 0
                        THEN floor(x / sc + 0.5) ELSE 0.0 END) AS qv
               FROM s)
         SELECT vec_id, ROUND(sc, 6) AS scale,
                ROUND(list_max(list_transform(range(1, len(e) + 1),
                  i -> abs(e[CAST(i AS INT)] - qv[CAST(i AS INT)] * sc))), 6) AS max_err
         FROM q ORDER BY vec_id NULLS FIRST""",
  )
}
