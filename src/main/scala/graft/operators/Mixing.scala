package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic domain mixing for training pipelines: per-domain
  * sampling rates (upweight curated sources, downweight crawl) and a
  * seeded corpus shuffle, both pure functions of (salt, key).
  *
  * Same design rules as [[Splits]] (they share the md5-hex-bucket
  * construction): map-only, no RNG state, reproducible across runs /
  * engines / partitionings, and growth-stable — a document's fate
  * never depends on what else is in the corpus. The keep-decision is
  * a LEXICOGRAPHIC compare of the first 8 md5 hex chars against a
  * per-domain cut string (fixed-width hex compares like the number it
  * spells), so the identical predicate is expressible in any SQL
  * engine without hex→int conversion. Rate granularity 1/2^32.
  *
  * [[weightedSample]] rates live in [0,1]; upsampling beyond 1.0 is
  * [[epochs]] (per-domain repetition factors, fractional last epoch),
  * and hard per-domain size limits are [[capPerDomain]].
  */
object Mixing {

  /** 8-hex-char cut for rate r: keys whose md5 prefix sorts below it
    * are kept. "g" > every hex char, so r ≥ 1.0 keeps ALL rows (an
    * "ffffffff" cut would drop ~1/2^32 of them). */
  private[operators] def rateCut(r: Double): String = {
    require(r >= 0.0, s"rate $r must be non-negative")
    if (r >= 1.0) "g"
    else f"${math.round(r * 4294967296.0).min(4294967295L)}%08x"
  }

  private def hash8(key: Column, salt: String): Column =
    HexBucket.prefix(key, salt, 8)

  /** Nested-when chain mapping each listed domain to a literal, any
    * other domain to the default — the shared shape of every
    * per-domain parameter in this file. */
  private def perDomainLit[T](domainCol: String, pairs: Seq[(String, T)],
                              default: T): Column =
    pairs.foldRight(lit(default): Column) { case ((dom, v), rest) =>
      when(col(domainCol) === lit(dom), lit(v)).otherwise(rest)
    }

  /** Above this many distinct rates the when-chain compiles to a
    * codegen-hostile expression (deep nesting falls out of whole-stage
    * codegen and eventually breaks janino); switch to a broadcast
    * rate-table join instead. */
  private[graft] val WhenChainMaxRates = 128

  /** Keep each row with its domain's rate. Unlisted domains get
    * `defaultRate`; duplicate domain entries keep the FIRST rate (the
    * when-chain's historical semantics, preserved on both paths).
    *
    * Two physical forms, same semantics: ≤ [[WhenChainMaxRates]]
    * distinct domains compile to a literal when-chain (zero joins,
    * map-only — the mT5/LLaMA mixture-config shape); larger rate lists
    * (e.g. per-registrable-web-domain rates, millions of entries)
    * become a broadcast left join against the rate table, so the
    * predicate stays map-side and no expression grows with the list.
    * NULL domains match nothing on either path and get `defaultRate`. */
  def weightedSample(df: DataFrame, domainCol: String, keyCol: String,
                     rates: Seq[(String, Double)], defaultRate: Double = 0.0,
                     salt: String = "mix"): DataFrame = {
    val uniq = rates.distinctBy(_._1)
    if (uniq.size <= WhenChainMaxRates) {
      val cut = perDomainLit(domainCol,
        uniq.map { case (d, r) => d -> rateCut(r) }, rateCut(defaultRate))
      df.where(hash8(col(keyCol), salt) < cut)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val cuts = uniq.map { case (d, r) => (d, rateCut(r)) }
        .toDF("__mix_dom", "__mix_cut")
      df.join(broadcast(cuts), df(domainCol) === col("__mix_dom"), "left")
        .where(hash8(col(keyCol), salt) <
          coalesce(col("__mix_cut"), lit(rateCut(defaultRate))))
        .drop("__mix_dom", "__mix_cut")
    }
  }

  /** The equivalent SQL predicate (same cuts, same md5 prefix) — the
    * auditable cross-engine form of [[weightedSample]]. */
  def sampleSql(domainExpr: String, keyExpr: String,
                rates: Seq[(String, Double)], defaultRate: Double = 0.0,
                salt: String = "mix"): String = {
    require(rates.size <= 1000,
      s"sampleSql builds a literal CASE chain (${rates.size} rates > " +
        "1000); audit large mixtures against weightedSample's broadcast " +
        "rate-table join with a SQL-side join on the same rate table")
    val cutExpr = rates.foldRight(s"'${rateCut(defaultRate)}'") {
      case ((dom, r), rest) =>
        s"CASE WHEN $domainExpr = '$dom' THEN '${rateCut(r)}' ELSE $rest END"
    }
    s"${HexBucket.prefixSql(keyExpr, salt, 8)} < $cutExpr"
  }

  /** Temperature-balanced domain rates (the public mT5/LLaMA
    * language-balancing rule, Arivazhagan et al. 2019): keep rate
    * r_d = min(1, maxRate · (n_d / n_max)^(α−1)), so expected kept
    * counts scale as n_d^α — α = 1 keeps the natural distribution,
    * α < 1 flattens the head so giant domains stop drowning the tail.
    * Sizes come from ONE aggregation; the collect is bounded at one
    * row per domain (the IVF-centroid precedent). Rates are plain
    * doubles feeding the same md5-cut machinery as
    * [[weightedSample]], so the whole mixture stays a deterministic
    * map-only predicate. */
  def temperatureRates(df: DataFrame, domainCol: String, alpha: Double,
                       maxRate: Double = 1.0,
                       maxDomains: Int = 100000): Seq[(String, Double)] = {
    require(maxDomains >= 1, s"maxDomains must be >= 1, got $maxDomains")
    // NULL domains get no rate row: weightedSample's when-chain sends
    // them to the default rate (0.0 → dropped) — the same fate a NULL
    // domain meets in every sampler here, never an NPE in the sort.
    // The collect is bounded BY CONSTRUCTION at maxDomains + 1 rows
    // (limit before collect): a caller keying on registrable web
    // domains (millions) fails loudly here instead of sizing the
    // driver to the domain cardinality.
    val sizes = df.where(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("__d"))
      .agg(count(lit(1)).as("n"))
      .limit(maxDomains + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(sizes.length <= maxDomains,
      s"temperatureRates: more than $maxDomains distinct domains — a " +
        "rate PER domain at this cardinality should be computed " +
        "distributedly (join df to its own domain-size aggregate and " +
        "derive the cut column in-plan) rather than collected; raise " +
        "maxDomains only if the driver is sized for it")
    require(sizes.nonEmpty,
      "temperatureRates: no rows with a non-NULL domain " +
        "(empty input, or the domain column is entirely NULL)")
    val nmax = sizes.map(_._2).max.toDouble
    sizes.sortBy(_._1).toSeq.map { case (dom, n) =>
      val r = math.min(1.0, math.pow(n / nmax, alpha - 1.0) * maxRate)
      // quantize to 1e-6 BEFORE the cut: pow is not IEEE
      // correctly-rounded, so an oracle replaying it in another
      // engine can differ by an ulp — after this floor both engines
      // agree unless their pows straddle a 5e-7 boundary within
      // ~1e-16, which is the same accepted-risk class as x57's ln
      dom -> math.floor(r * 1e6 + 0.5) / 1e6
    }
  }

  /** [[weightedSample]] under [[temperatureRates]]. Note the sizes
    * aggregation is one EXTRA pass over `df`'s lineage (the
    * ZOrder.zValue bounds shape) — when the input is an expensive
    * pipeline, persist/localCheckpoint it upstream so the pass reads
    * a materialization instead of recomputing. */
  def temperatureSample(df: DataFrame, domainCol: String, keyCol: String,
                        alpha: Double, maxRate: Double = 1.0,
                        salt: String = "temp"): DataFrame =
    weightedSample(df, domainCol, keyCol,
      temperatureRates(df, domainCol, alpha, maxRate),
      defaultRate = 0.0, salt = salt)

  /** Deterministic corpus shuffle: order by seeded md5 of the key.
    * Spark executes the global sort as range-partition + per-partition
    * sort — the scale-correct shuffle (no single task ever sees the
    * corpus, no RNG state to coordinate), and the order is re-derivable
    * from the salt alone. The helper sort key is dropped from the
    * output (callers can re-derive it: md5(salt || key)); an input
    * that already carries a `shuffle_key` column is rejected rather
    * than silently overwritten. */
  def shuffled(df: DataFrame, keyCol: String,
               salt: String = "shuf"): DataFrame = {
    require(!df.columns.contains("shuffle_key"),
      "shuffled: input must not already carry a shuffle_key column")
    df.withColumn("shuffle_key", md5(concat(lit(salt), col(keyCol).cast("string"))))
      .orderBy(col("shuffle_key"))
      .drop("shuffle_key")
  }

  /** Cap each domain at k rows, selected deterministically (the k
    * smallest seeded hashes — an unbiased, growth-damped sample, not
    * "first k in storage order").
    *
    * The key must be long-castable (it rides through the typed
    * [[graft.functions.TopKAgg]] aggregator, whose id field is a
    * Long) and, as everywhere in this file, identify a row; rows
    * whose key casts to NULL are rejected up front rather than
    * silently dropped by the typed encoder.
    *
    * Scale shape: the bounded-heap aggregator means each map
    * partition forwards ≤k candidates per domain to the shuffle —
    * never a per-domain window sort of the whole corpus — and the
    * survivors come back via a (domain, key) semi join (domains × k
    * rows, broadcastable). The domain rides along so a key shared by
    * two domains caps each domain independently. */
  def capPerDomain(df: DataFrame, domainCol: String, keyCol: String, k: Int,
                   salt: String = "cap"): DataFrame = {
    // numeric form of the 8-hex prefix (exact in a double: < 2^32),
    // negated because the aggregator keeps the HIGHEST scores
    val score = -conv(hash8(col(keyCol), salt), 16, 10).cast("double")
    val keep = df
      .select(col(domainCol).as("__dom"), col(keyCol).cast("long").as("__k"),
        score.as("__s"))
      .withColumn("__k", when(col("__k").isNotNull, col("__k")).otherwise(
        raise_error(lit(s"capPerDomain: $keyCol must cast to a non-null long"))))
      .groupBy(col("__dom"))
      .agg(graft.functions.TopKAgg.topK(k)(col("__k"), col("__s")).as("top"))
      .select(col("__dom"), explode(col("top").getField("id")).as("__k"))
    df.join(keep,
      // null-safe on domain: a NULL-domain slice is capped as its own
      // group (groupBy already buckets NULL together; a plain === here
      // would silently drop every NULL-domain row instead)
      col(domainCol) <=> keep("__dom") &&
        col(keyCol).cast("long") === keep("__k"),
      "left_semi")
  }

  /** Per-domain epoch repetition — the standard mixture spec "domain d
    * runs f_d epochs" with fractional epochs (factor 2.5 = two full
    * copies plus a deterministic half-rate third). Emits an `epoch`
    * column so repetitions stay distinguishable downstream (packing,
    * shuffling). Same determinism properties as [[weightedSample]];
    * whole-number factors replicate exactly (no hash involved). */
  def epochs(df: DataFrame, domainCol: String, keyCol: String,
             factors: Seq[(String, Double)], defaultFactor: Double = 1.0,
             salt: String = "rep"): DataFrame = {
    require(!df.columns.contains("epoch"),
      "epochs: input must not already carry an epoch column")
    (factors.map(_._2) :+ defaultFactor).foreach(f =>
      require(f >= 0.0, s"epoch factor $f must be non-negative"))
    def whole(f: Double) = math.floor(f).toInt
    def cut(f: Double) = rateCut(f - math.floor(f))
    val wholeCol = perDomainLit(domainCol,
      factors.map { case (d, f) => d -> whole(f) }, whole(defaultFactor))
    val cutCol = perDomainLit(domainCol,
      factors.map { case (d, f) => d -> cut(f) }, cut(defaultFactor))
    val epochHash = HexBucket.prefix(
      concat(col("epoch").cast("string"), lit(":"), col(keyCol).cast("string")),
      salt + ":", 8)
    // each row generates only the epochs ITS domain can keep (whole
    // copies + the fractional candidate when there is one) — a
    // crawl-heavy corpus must not explode to a curated domain's
    // factor and discard the excess. Only the fractional tail is
    // hash-filtered afterwards.
    val nEpochs = wholeCol + when(cutCol =!= lit(rateCut(0.0)), 1).otherwise(0)
    df.withColumn("epoch",
        explode(when(nEpochs > 0, sequence(lit(0), nEpochs - 1))
          .otherwise(array().cast("array<int>"))))
      .where(col("epoch") < wholeCol ||
        (col("epoch") === wholeCol && epochHash < cutCol))
  }

  /** Deterministic token-budget selection — the "take N tokens of
    * domain d" corpus spec. Documents are taken greedily in
    * seeded-hash order (an unbiased shuffle of the domain) until the
    * next document would push the domain's cumulative token count
    * past its budget; a document is kept iff the running total
    * INCLUDING it stays ≤ budget, so budgets are never overshot.
    * Same determinism properties as the rest of this file; the
    * explicit ROWS frame plus the key tiebreak make the cumulative
    * sum identical in any engine.
    *
    * Scale note: the running sum is a per-domain window sort (same
    * hazard class as [[Percentiles]] — a very hot domain sorts on one
    * task, a spill not an OOM). `tokenCol` is caller-supplied so the
    * count composes with any tokenizer. */
  def tokenBudget(df: DataFrame, domainCol: String, keyCol: String,
                  tokenCol: String, budgets: Seq[(String, Long)],
                  defaultBudget: Long = 0L,
                  salt: String = "tb"): DataFrame = {
    (budgets.map(_._2) :+ defaultBudget).foreach(b =>
      require(b >= 0L, s"token budget $b must be non-negative"))
    val cumCol = "__tokenBudget_cum"
    require(!df.columns.contains(cumCol),
      s"tokenBudget: input must not already carry a $cumCol column")
    val budgetCol = perDomainLit(domainCol, budgets, defaultBudget)
    // a NULL key hashes to NULL, which Spark sorts first and DuckDB
    // sorts last — fail fast like capPerDomain instead of silently
    // consuming the budget nondeterministically. Keys must also
    // identify a row (duplicates tie on both sort keys).
    val safeKey = when(col(keyCol).isNotNull, col(keyCol)).otherwise(
      raise_error(lit(s"tokenBudget: $keyCol must be non-null")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(hash8(safeKey, salt), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn(cumCol, sum(col(tokenCol)).over(w))
      .where(col(cumCol) <= budgetCol)
      .drop(cumCol)
  }

  /** [[tokenBudget]] with the hot-domain hazard removed: the
    * per-domain running sum is computed in TWO LEVELS — shard-local
    * prefix sums plus broadcast shard offsets — so no single task ever
    * sorts a whole domain (the same trick as
    * [[Packing.contiguousSharded]]).
    *
    * The shard is the first `shardChars` hex chars of the SAME seeded
    * hash the selection orders by, so shards are contiguous RANGES of
    * the hash order: (shard asc, hash asc, key asc) is exactly the
    * single-window order, equal hashes share a shard, and
    * local_cum + (sum of preceding shards' totals) equals the global
    * running sum row-for-row. The offsets table is domains ×
    * 16^shardChars rows — broadcastable at any corpus size. Output is
    * identical to [[tokenBudget]] (property-tested); the price is a
    * second scan of the input for the shard totals, which at
    * warehouse scale reads a staged table. */
  def tokenBudgetSharded(df: DataFrame, domainCol: String, keyCol: String,
                         tokenCol: String, budgets: Seq[(String, Long)],
                         defaultBudget: Long = 0L,
                         salt: String = "tb", shardChars: Int = 1): DataFrame = {
    require(shardChars >= 1 && shardChars <= 4,
      s"shardChars $shardChars outside [1,4] (16..65536 shards)")
    (budgets.map(_._2) :+ defaultBudget).foreach(b =>
      require(b >= 0L, s"token budget $b must be non-negative"))
    val helpers = Seq("__tokenBudget_cum", "__tb_hash", "__tb_shard", "__tb_off")
    helpers.foreach(c => require(!df.columns.contains(c),
      s"tokenBudgetSharded: input must not already carry a $c column"))
    val budgetCol = perDomainLit(domainCol, budgets, defaultBudget)
    val safeKey = when(col(keyCol).isNotNull, col(keyCol)).otherwise(
      raise_error(lit(s"tokenBudgetSharded: $keyCol must be non-null")))
    val withH = df
      .withColumn("__tb_hash", hash8(safeKey, salt))
      .withColumn("__tb_shard", substring(col("__tb_hash"), 1, shardChars))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol), col("__tb_shard"))
      .orderBy(col("__tb_hash"), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wDom = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col("__tb_shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = withH.groupBy(col(domainCol), col("__tb_shard"))
      .agg(sum(col(tokenCol)).as("__tb_tot"))
      .withColumn("__tb_off", coalesce(sum(col("__tb_tot")).over(wDom), lit(0L)))
      .drop("__tb_tot")
    withH.withColumn("__tokenBudget_cum", sum(col(tokenCol)).over(wLocal))
      .join(broadcast(offsets), Seq(domainCol, "__tb_shard"))
      .where(col("__tokenBudget_cum") + col("__tb_off") <= budgetCol)
      // the join moved its keys first — restore the input's column order
      .select(df.columns.map(col).toSeq: _*)
  }

  /** SQL mirror of [[epochs]]: (maxEpochs, predicate over an `epoch`
    * column). The whole-epoch counts and fractional cut strings are
    * computed HERE (in Scala) and inlined as literals, so the oracle
    * does no floating-point arithmetic of its own. */
  def epochsSql(domainExpr: String, keyExpr: String,
                factors: Seq[(String, Double)], defaultFactor: Double = 1.0,
                salt: String = "rep"): (Int, String) = {
    def whole(f: Double) = math.floor(f).toInt
    def cut(f: Double) = rateCut(f - math.floor(f))
    val maxEpochs = (factors.map(_._2) :+ defaultFactor)
      .map(f => whole(f) + (if (f - whole(f) > 0.0) 1 else 0)).max
    val wholeExpr = factors.foldRight(whole(defaultFactor).toString) {
      case ((dom, f), rest) =>
        s"CASE WHEN $domainExpr = '$dom' THEN ${whole(f)} ELSE $rest END"
    }
    val cutExpr = factors.foldRight(s"'${cut(defaultFactor)}'") {
      case ((dom, f), rest) =>
        s"CASE WHEN $domainExpr = '$dom' THEN '${cut(f)}' ELSE $rest END"
    }
    val h = HexBucket.prefixSql(
      s"CAST(epoch AS VARCHAR) || ':' || CAST($keyExpr AS VARCHAR)",
      salt + ":", 8)
    (maxEpochs, s"(epoch < $wholeExpr OR (epoch = $wholeExpr AND $h < $cutExpr))")
  }
}
