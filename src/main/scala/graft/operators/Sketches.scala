package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable-sketch surface (SURVEY.md A-family extension): Count-Min
  * frequency estimation and Bloom membership over a key column, with
  * audit shapes that make their probabilistic guarantees gate-checkable.
  *
  * Scale design: both sketches build DISTRIBUTED (per-partition
  * sketches OR/add-merged — commutative and associative, so the result
  * is partition-order independent and deterministic for fixed data and
  * seed). The audits are distributed too: the built sketch is
  * BROADCAST back out and violations are counted as a distributed
  * aggregate over the per-key truth — only the one-row verdict ever
  * reaches the driver, so key cardinality is bounded by executor
  * memory (per-partition slices), never by driver memory.
  */
object Sketches {

  private val longPair = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  private val longTriple =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)

  /** Count-Min audit: estimates must never undercount (a hard CMS
    * guarantee) and must overcount by at most eps·N (the designed
    * slack). The per-key truth is a plain groupBy-count; each task
    * checks its slice of keys against the broadcast sketch and emits
    * partial violation counts. Returns one row: (n_keys,
    * undercount_violations, overcount_violations) — both violation
    * counts pin to 0. */
  def cmsAudit(df: DataFrame, keyCol: String,
               eps: Double = 0.0001, confidence: Double = 0.999,
               seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    // null keys are skipped by Spark's sketch aggregate, so the audit
    // population must skip them too (estimateCount(null) also throws)
    val nn = df.where(col(keyCol).isNotNull)
    val sketch = nn.stat.countMinSketch(keyCol, eps, confidence, seed)
    // the sketch already knows N — no extra pass for the slack bound
    val slack = math.ceil(eps * sketch.totalCount()).toLong
    val bc = spark.sparkContext.broadcast(sketch)
    val partials = nn.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .mapPartitions { it =>
        var keys = 0L; var under = 0L; var over = 0L
        it.foreach { r =>
          val est = bc.value.estimateCount(r.get(0))
          val n = r.getLong(1)
          keys += 1
          if (est < n) under += 1
          if (est > n + slack) over += 1
        }
        Iterator((keys, under, over))
      }(longTriple)
    partials.toDF("k", "u", "o")
      .agg(coalesce(sum(col("k")), lit(0L)).as("n_keys"),
        coalesce(sum(col("u")), lit(0L)).as("undercount_violations"),
        coalesce(sum(col("o")), lit(0L)).as("overcount_violations"))
  }

  /** Bloom audit: every present key must be reported present (the
    * no-false-negative hard guarantee), and false positives over a
    * synthetic absent-key probe set must stay within a generous
    * multiple of the designed fpp. Probes are synthesized IN THE KEY
    * COLUMN'S TYPE (a string probe against a long-built filter never
    * collides, making the check vacuous) and anti-joined against the
    * key set so every surviving probe is genuinely absent. Returns one
    * row: (n_keys, false_negatives = 0, fp_ok = true). */
  def bloomAudit(df: DataFrame, keyCol: String,
                 expectedItems: Long, fpp: Double,
                 absentProbes: Int = 200): DataFrame = {
    val spark = df.sparkSession
    // same null contract as cmsAudit: sketches see non-null keys only
    val nn = df.where(col(keyCol).isNotNull)
    val bf = nn.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val keys = nn.select(col(keyCol)).distinct()

    val membership = keys.mapPartitions { it =>
      var n = 0L; var fn = 0L
      it.foreach { r => n += 1; if (!bc.value.mightContain(r.get(0))) fn += 1 }
      Iterator((n, fn))
    }(longPair).toDF("k", "f")
      .agg(coalesce(sum(col("k")), lit(0L)).as("n_keys"),
        coalesce(sum(col("f")), lit(0L)).as("false_negatives"))

    // probe candidates in the key type, generated WITHIN the type's
    // value range (an out-of-range cast throws under ANSI mode); the
    // widely-spaced multiplier (Knuth's 2^32/φ) spreads candidates,
    // and the anti-join below guarantees actual absence either way
    val keyType = nn.schema(keyCol).dataType
    val candidate: org.apache.spark.sql.Column = keyType match {
      case StringType =>
        concat(lit("__graft_absent_"), col("id").cast("string"))
      case ByteType =>
        (pmod(col("id") * lit(37L), lit(256L)) - lit(128L)).cast(keyType)
      case ShortType =>
        (pmod(col("id") * lit(30011L), lit(65536L)) - lit(32768L)).cast(keyType)
      case IntegerType =>
        (pmod(col("id") * lit(2654435761L), lit(4294967296L)) -
          lit(2147483648L)).cast(keyType)
      case LongType =>
        lit(Long.MinValue / 2) + col("id") * lit(2654435761L)
      case other => throw new IllegalArgumentException(
        s"bloomAudit: unsupported key type $other (Bloom filters build " +
          "over integral and string columns)")
    }
    val absent = spark.range(absentProbes.toLong).select(candidate.as("p"))
      .join(keys, col("p") === col(keyCol), "left_anti")
    val fpAgg = absent.mapPartitions { it =>
      var n = 0L; var hits = 0L
      it.foreach { r => n += 1; if (bc.value.mightContain(r.get(0))) hits += 1 }
      Iterator((n, hits))
    }(longPair).toDF("p", "h")
      .agg(coalesce(sum(col("p")), lit(0L)).as("n_probes"),
        coalesce(sum(col("h")), lit(0L)).as("fp_hits"))

    membership.crossJoin(fpAgg)
      .select(col("n_keys"), col("false_negatives"),
        (col("fp_hits") <= greatest(lit(10L),
          ceil(lit(5 * fpp) * col("n_probes")).cast("long"))).as("fp_ok"))
  }

  /** HLL audit — the storable-sketch contract, both halves:
    * (1) ROLL-UP EXACTNESS: the union of per-slice sketches must be
    * BIT-IDENTICAL to the sketch built directly over the whole table
    * (register-wise max is associative — this is what makes stored
    * per-day sketches trustworthy under any later roll-up), and
    * (2) ACCURACY: the merged estimate within `tol` of the exact
    * distinct count. Deterministic hash + deterministic merge ⇒ both
    * flags are fixed for fixed data, so they gate exactly. Returns
    * one row `(n_exact, within_tol, rollup_exact)`. */
  def hllAudit(df: DataFrame, keyCol: String, sliceCol: org.apache.spark.sql.Column,
               p: Int = 12, tol: Double = 0.05): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val slices = df.groupBy(sliceCol.as("__s"))
      .agg(graft.functions.Hll.sketch(col(keyCol), p).as("sk"))
    val merged = slices.agg(graft.functions.Hll.merge(col("sk"), p).as("m"))
      .head.getAs[Array[Byte]](0)
    // direct sketch and exact distinct in ONE scan — they aggregate
    // the same rows
    val one = df.agg(
      graft.functions.Hll.sketch(col(keyCol), p).as("d"),
      count_distinct(col(keyCol)).as("n")).head
    val direct = one.getAs[Array[Byte]](0)
    val exact = one.getLong(1)
    val est = graft.functions.Hll.estimate(merged)
    val within = exact == 0L && est == 0L ||
      math.abs(est - exact) <= tol * exact
    Seq((exact, within, java.util.Arrays.equals(merged, direct)))
      .toDF("n_exact", "within_tol", "rollup_exact")
  }

  /** Quantile-sketch audit: every estimate from
    * [[graft.functions.QuantileSketch]] must sit within the sketch's
    * DECLARED relative error α of the exact value at rank ⌈q·n⌉ —
    * the hard deterministic guarantee of the log-bucket design, so
    * the flag gates exactly (no probabilistic slack needed). Returns
    * one row `(n_vals, within_alpha)`; the oracle recomputes the
    * count and pins the boolean.
    *
    * Both sides audit the FINITE population: the sketch skips
    * NaN/±Infinity by contract, so the exact side must too or
    * high-q ranks drift on non-finite-bearing columns.
    *
    * The exact side rank-selects DISTRIBUTED via
    * [[exactValuesAtRanks]] — a range-partitioned two-level rank, not
    * a global window (which would collapse the whole table into one
    * task: the audit would be the scale-killer auditing a sketch whose
    * whole point is never sorting). */
  def quantileSketchAudit(df: DataFrame, valueCol: String,
                          alpha: Double = 0.01,
                          qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val nn = df.where(v.isNotNull && !isnan(v) &&
        v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity)
      .select(v.as("__v"))
    // count and sketch in ONE aggregation job — the scheduling floor
    // per job dwarfs the work at audit scale
    val first = nn.agg(count(lit(1)).as("n"),
      graft.functions.QuantileSketch.quantiles(col("__v"), alpha, qs)
        .as("est")).head
    val n = first.getLong(0)
    val est = first.getSeq[Double](1)
    val ranks = qs.map(q => math.min(n, math.max(1L, math.ceil(q * n).toLong)))
    val byRank = exactValuesAtRanks(nn, "__v", ranks.distinct)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ok = n == 0L || qs.indices.forall { i =>
      val exact = byRank(ranks(i))
      math.abs(est(i) - exact) <=
        alpha * math.abs(exact) + 1e-12
    }
    import spark.implicits._
    Seq((n, ok)).toDF("n_vals", "within_alpha")
  }

  /** Per-GROUP quantile-sketch audit — the monitoring shape the
    * mergeable sketch exists for (one sketch per day/segment/shard,
    * quantiles per slice): for every group, each estimate must sit
    * within α of the exact value at rank ⌈q·n_g⌉ INSIDE the group.
    * Returns one row `(group, n_vals, within_alpha)` per group.
    *
    * The exact side avoids windows OVER DATA entirely — a window
    * PARTITIONED by group is only scale-safe when groups are numerous
    * and small; with a few huge groups (this gate: 3 returnflags) it
    * degenerates to a few whole-group single-task sorts, the same
    * hazard the global audit had. The first shipped form range-ranked
    * the whole table ([[Ranks.globalRowNumber]]: a full shuffle +
    * sort + data-sized localCheckpoint — 99 s cold at sf5); this is
    * the x98/x111 COUNTING-SELECTION recipe ported to the grouped
    * multi-rank case ([[valuesAtGroupRanks]]): bucket by sampled
    * boundaries (map-only), exact (group, bucket) histogram, then
    * sort ONLY each group's target buckets (≈ n_g/nBuckets rows per
    * task). Exactness is boundary-independent — equal values share a
    * bucket and ranks are recovered from exact counts. Both sides
    * audit the FINITE population, like the global audit. */
  def quantileSketchAuditBy(df: DataFrame, valueCol: String,
                            groupCol: String, alpha: Double = 0.01,
                            qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    // the group key rides inside a STRUCT: joins/grouping on a bare
    // nullable key silently drop the NULL group (equality never
    // matches NULL = NULL), but a struct is itself never NULL and
    // struct comparison treats NULL fields as equal — so the NULL
    // segment is audited like any other instead of escaping
    val nn = df.where(v.isNotNull && !isnan(v) &&
        v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity)
      .select(struct(col(groupCol)).as("__g"), v.as("__v"))
    // ONE sketch pass serves the audit AND the selection boundaries
    // (round 15): the same built sketch answers a 63-point quantile
    // grid for free, so the separate approxQuantile boundary pass is
    // gone, and collecting the groups-sized result (the SAME
    // executor-memory bound the perBucket broadcast below already
    // imposes) lets the rank arithmetic run driver-side and feeds the
    // downstream joins LocalRelations instead of re-executing the
    // sketch aggregate subtree per consumer.
    val gridQs = (1 until 64).map(_.toDouble / 64)
    val skRows = nn.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_vals"),
        graft.functions.QuantileSketch
          .quantiles(col("__v"), alpha, qs ++ gridQs).as("__all"))
      .collect()
    val gType = nn.schema("__g").dataType
    import org.apache.spark.sql.types.{StructType, StructField, LongType => LT,
      ArrayType, DoubleType}
    val skSchema = StructType(Seq(StructField("__g", gType),
      StructField("n_vals", LT, nullable = false),
      StructField("__est", ArrayType(DoubleType))))
    val wantedSchema = StructType(Seq(StructField("__g", gType),
      StructField("__ranks", ArrayType(LT))))
    def ranksFor(n: Long): Seq[Long] =
      qs.map(q => math.min(n, math.max(1L, math.ceil(q * n).toLong)))
    val skLocal = spark.createDataFrame(
      java.util.Arrays.asList(skRows.map(r => org.apache.spark.sql.Row(
        r.get(0), r.getLong(1), r.getSeq[Double](2).take(qs.size))): _*),
      skSchema)
    val wantedLocal = spark.createDataFrame(
      java.util.Arrays.asList(skRows.map(r => org.apache.spark.sql.Row(
        r.get(0), ranksFor(r.getLong(1)))): _*), wantedSchema)
    // boundaries from the sketches' merged grids — estimates are real
    // landmarks of each group's distribution, and boundary quality
    // only sizes buckets, never the result (equal values share a
    // bucket; ranks come from exact counts)
    val grid = skRows.flatMap(_.getSeq[Double](2).drop(qs.size))
      .filter(d => !d.isNaN && !d.isInfinite).distinct.sorted
    val bounds =
      if (grid.length <= 63) grid
      else {
        val stride = grid.length.toDouble / 63
        (0 until 63).map(i => grid((i * stride).toInt)).toArray.distinct.sorted
      }
    val exact = valuesAtGroupRanks(nn, wantedLocal, boundsOpt = Some(bounds))
    skLocal.join(exact, Seq("__g"))
      .join(wantedLocal, Seq("__g"))
      .select(col("__g").getField(groupCol).as(groupCol), col("n_vals"),
        aggregate(
          zip_with(col("__est"), col("__ranks"),
            (e, r) => abs(e - element_at(col("__exact"), r)) <=
              lit(alpha) * abs(element_at(col("__exact"), r)) + lit(1e-12)),
          lit(true), (acc, x) => acc && x).as("within_alpha"))
  }

  /** Exact values at multiple in-group 1-based ranks per group, by
    * COUNTING SELECTION (the x98-audit / x111-medians recipe,
    * generalized to grouped multi-rank):
    *
    *  1. bucket every value by sampled GLOBAL boundaries (map-only —
    *     boundaries only size buckets, they cannot affect the result:
    *     equal values always share a bucket and ranks are recovered
    *     from exact counts);
    *  2. exact (group, bucket) histogram → running counts place each
    *     wanted rank in its bucket with a local rank (a groups ×
    *     buckets frame — never data-sized);
    *  3. broadcast-join the target buckets back and row_number ONLY
    *     inside them — each window partition holds ≈ n_g/nBuckets
    *     rows of one bucket of one group, whatever the group shape.
    *
    * Input: `vals(__g, __v)` and `wanted(__g, __ranks array<long>)`;
    * output: `(__g, __exact map<rank,value>)`. Ties in `__v` need no
    * tiebreak — any numbering consistent with the sort yields the
    * same VALUE at a given rank. */
  private[operators] def valuesAtGroupRanks(vals: DataFrame,
      wanted: DataFrame, nBuckets: Int = 64,
      boundsOpt: Option[Array[Double]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = boundsOpt.getOrElse(vals.stat
      .approxQuantile("__v", (1 until nBuckets)
        .map(_.toDouble / nBuckets).toArray, 0.001))
      .distinct.sorted
    // native binary-search bucketing (NativeSelect scaladoc)
    val bucketed = vals.withColumn("__b",
      if (bounds.isEmpty) lit(0)
      else graft.expressions.NativeSelect.searchSorted(col("__v"), bounds))
    val wG = Window.partitionBy(col("__g")).orderBy(col("__b"))
    val hist = bucketed.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__before", coalesce(
        sum(col("__c")).over(wG.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val ranks = wanted.select(col("__g"), explode(col("__ranks")).as("__rn"))
      .distinct()
    // per (group, bucket): the wanted (local rank, global-in-group
    // rank) pairs that land inside it — ≤ |qs| rows per group
    val perBucket = hist.join(ranks, Seq("__g"))
      .where(col("__rn") > col("__before") &&
        col("__rn") <= col("__before") + col("__c"))
      .select(col("__g"), col("__b"),
        struct((col("__rn") - col("__before")).as("__lrank"),
          col("__rn")).as("__t"))
      .groupBy(col("__g"), col("__b"))
      .agg(collect_list(col("__t")).as("__ts"))
    bucketed.join(broadcast(perBucket), Seq("__g", "__b"))
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))))
      .select(col("__g"), col("__v"),
        filter(col("__ts"), t => t.getField("__lrank") === col("__lrn"))
          .as("__hit"))
      .where(size(col("__hit")) > 0)
      .select(col("__g"), explode(col("__hit")).as("__t"), col("__v"))
      .groupBy(col("__g"))
      .agg(map_from_arrays(collect_list(col("__t.__rn")),
        collect_list(col("__v"))).as("__exact"))
  }

  /** Exact `(rank, value)` pairs at the given ascending 1-based ranks,
    * computed distributed: [[Ranks.globalRowNumber]] range-partitions
    * and ranks in parallel, then the rank filter keeps ≤ `ranks.size`
    * rows. Ties in the value column don't need a tiebreak here — any
    * numbering consistent with the sort order yields the same VALUE at
    * a given rank. Separated from the audit so PlanSpec can pin the
    * no-SinglePartition property of the plan itself. */
  def exactValuesAtRanks(df: DataFrame, valueCol: String,
                         ranks: Seq[Long]): DataFrame =
    Ranks.globalRowNumber(df.select(col(valueCol)), Seq(col(valueCol)), "__rn")
      .where(col("__rn").isin(ranks: _*))
      .select(col("__rn").as("rank"), col(valueCol).as("value"))
}
