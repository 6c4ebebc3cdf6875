package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.NativeEditSim

/** Entity resolution / record linkage: group records whose NAMES are
  * the same real-world entity spelled differently ("acme corporation"
  * / "acme corp inc") — the classic blocking + pairwise-similarity +
  * transitive-closure pipeline (Fellegi-Sunter lineage; similarity is
  * the public Jaro-Winkler measure, [[NativeEditSim]]).
  *
  * Scale shape: NO all-pairs comparison ever happens — candidates
  * come from an equi self-join on a BLOCKING key (prefix of the
  * normalized name), so the comparison count is Σ block² over blocks,
  * not corpus². The Jaro-Winkler predicate is fused into the join as
  * a codegen'd native expression; surviving pairs (tiny next to the
  * corpus) feed the same adaptive connected-components used by the
  * dedup family (driver union-find under the cap, Kiveris star
  * beyond). Similarities are quantized to LONG e4 at the threshold
  * so the DuckDB oracle replays the verdicts exactly.
  *
  * A skewed block (every "J. Smith") is the classic failure mode of
  * prefix blocking — Σ block² turns quadratic in the corpus when
  * block cardinality is fixed. [[pairs]] guards against it
  * AUTOMATICALLY: block sizes are measured first (one tiny aggregate
  * over ≤ alphabet^width keys; only the oversized keys reach the
  * driver), and any block over `maxBlockSize` escalates from
  * all-pairs to SORTED-NEIGHBORHOOD comparison (Hernández & Stolfo,
  * SIGMOD '95): records rank by normalized name within the block and
  * each compares only to the next `neighborWindow` neighbors —
  * per-record work W, not block. The rank itself is computed sharded
  * (range partition + local rank + broadcast shard offsets), and the
  * neighbor join is chunk-banded (each row keyed by rank/W; the probe
  * side also emits the previous chunk), so even the escalated block
  * hash-joins on an equi key with O(W)-bounded probe buckets — no
  * single task ever sees block² work OR a whole-block sort.
  * Near-identical names sort adjacent, which is exactly the
  * high-similarity region; names farther than W positions apart in
  * sort order are — by design, like blocking itself — never
  * compared. */
object EntityResolution {

  /** Matching form of a name: lowercased, outer whitespace trimmed. */
  def normalized(name: Column): Column = lower(trim(name))

  /** Blocking key: first `width` alphanumeric chars of the normalized
    * name (typo-robust for everything past the prefix; names differing
    * in the first chars are — by design — never compared). */
  def blockKey(norm: Column, width: Int): Column =
    substring(regexp_replace(norm, "[^a-z0-9]", ""), 1, width)

  /** Candidate pairs above the similarity threshold:
    * `(id_a, id_b, jw_e4)` with `id_a < id_b`, `jw_e4` the
    * half-up-quantized Jaro-Winkler in 1e-4 units. NULL names never
    * pair. Blocks larger than `maxBlockSize` escalate to
    * sorted-neighborhood comparison within the block (window
    * `neighborWindow` in name-sort order) — see the object scaladoc
    * for why this keeps a skewed key from going quadratic. */
  def pairs(df: DataFrame, idCol: String, nameCol: String,
            threshold: Double, blockWidth: Int = 2,
            maxBlockSize: Int = 10000,
            neighborWindow: Int = 50): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    require(maxBlockSize > 1, "maxBlockSize must be > 1")
    require(neighborWindow >= 1, "neighborWindow must be >= 1")
    val thresholdE4 = math.round(threshold * 10000)
    val n = normalized(col(nameCol))
    val side = df.where(col(nameCol).isNotNull)
      .select(col(idCol), n.as("__n"), blockKey(n, blockWidth).as("__blk"))
    // block-size guard: the count table has at most alphabet^width
    // rows, and only the OVERSIZED keys (≤ corpus / maxBlockSize of
    // them) reach the driver — the common all-small case pays one
    // tiny aggregate and skips the escalation machinery entirely
    val bigKeys = side.groupBy(col("__blk")).agg(count(lit(1)).as("__bn"))
      .where(col("__bn") > maxBlockSize)
      .select(col("__blk")).collect().map(_.getString(0)).toSeq
    val jwE4 = floor(NativeEditSim.jaroWinkler(col("__na"), col("__nb"))
      * 10000 + 0.5).cast("long")

    val small =
      if (bigKeys.isEmpty) side
      else side.where(!col("__blk").isin(bigKeys: _*))
    val a = small.select(col(idCol).as("id_a"), col("__n").as("__na"),
      col("__blk").as("__ba"))
    val b = small.select(col(idCol).as("id_b"), col("__n").as("__nb"),
      col("__blk").as("__bb"))
    val smallPairs =
      a.join(b, col("__ba") === col("__bb") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), jwE4.as("jw_e4"))
    if (bigKeys.isEmpty) return smallPairs.where(col("jw_e4") >= thresholdE4)

    // oversized blocks: rank by name within the block, compare each
    // record only to its next `neighborWindow` neighbors. The rank is
    // computed in TWO LEVELS (the Percentiles.exactSharded recipe) —
    // range-partition by the full sort key, rank locally within
    // (shard, block), shift by the broadcast counts of the block's
    // earlier shards — so no single task ever sorts a whole block;
    // the sort key is total (ids unique), making the global rank
    // well-defined wherever the sampled shard boundaries land. The
    // checkpoint pins ONE shard assignment: the offset table and the
    // join sides must see the same partition ids.
    val big = side.where(col("__blk").isin(bigKeys: _*))
    val spark = df.sparkSession
    val nShards = math.max(2,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val localRanked = big
      .repartitionByRange(nShards, col("__blk"), col("__n"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col("__pid"), col("__blk"))
          .orderBy(col("__n"), col(idCol))).cast("long"))
      .localCheckpoint()
    val offsets = localRanked.groupBy(col("__pid"), col("__blk"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.partitionBy(col("__blk")).orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__blk"), col("__off"))
    // the banded neighbor join: chunk = (rank-1)/W; the probe side
    // also emits the previous chunk, so every candidate pair meets on
    // an equi key whose buckets hold ~W rows, never the whole block
    val ranked = localRanked.join(broadcast(offsets), Seq("__pid", "__blk"))
      .withColumn("__rn", col("__lrn") + col("__off"))
      .withColumn("__ck",
        ((col("__rn") - lit(1L)) / lit(neighborWindow.toLong)).cast("long"))
    val aB = ranked.select(col(idCol).as("id_a"), col("__n").as("__na"),
      col("__blk").as("__ba"), col("__rn").as("__ra"), col("__ck").as("__ca"))
    val bB = ranked.select(col(idCol).as("id_b"), col("__n").as("__nb"),
      col("__blk").as("__bb"), col("__rn").as("__rb"),
      explode(array(col("__ck"), col("__ck") - lit(1L))).as("__cb"))
    val bigPairs = aB.join(bB,
        col("__ba") === col("__bb") && col("__ca") === col("__cb") &&
          col("__rb") > col("__ra") &&
          col("__rb") <= col("__ra") + lit(neighborWindow.toLong))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), jwE4.as("jw_e4"))

    smallPairs.unionAll(bigPairs).where(col("jw_e4") >= thresholdE4)
  }

  /** Resolve every record to an entity: `(idCol, entity_id)` where
    * `entity_id` is the minimum record id of the record's similarity
    * cluster (transitive closure over [[pairs]]); unmatched records
    * are their own entity. Records with NULL names resolve to
    * themselves — junk never merges entities.
    *
    * Identical names are COLLAPSED before pairing: similarity and
    * blocking are functions of the normalized name alone, and
    * jw(x, x) = 1 ≥ any threshold means same-name records always
    * share a cluster — so the pairwise stage runs over DISTINCT
    * names (each represented by its minimum record id) and records
    * map back through their name afterwards. On the all-pairs path
    * the result is value-identical to pairing raw records (the
    * cluster's label is still the global minimum record id); on the
    * ESCALATED path, block sizes and neighbor windows are now
    * measured in DISTINCT names rather than records — strictly wider
    * coverage for the same parameters (duplicate names no longer pad
    * the window), so blocks escalate later and windows reach farther.
    * Either way a corpus where popular names repeat millions of
    * times pairs |distinct| rows instead of feeding Θ(dups²)
    * same-name edges into the closure. */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
              threshold: Double, blockWidth: Int = 2,
              maxBlockSize: Int = 10000,
              neighborWindow: Int = 50): DataFrame = {
    val named = df.select(col(idCol), normalized(col(nameCol)).as("__nm"))
    val reps = named.where(col("__nm").isNotNull)
      .groupBy(col("__nm")).agg(min(col(idCol)).as("__rep"))
    val p = pairs(reps, "__rep", "__nm", threshold, blockWidth,
      maxBlockSize, neighborWindow)
    // rename before the join: the caller's idCol may itself be "id"
    val cc = Dedup.connectedComponentsAdaptive(p)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    // name → its rep's component (or the rep itself for singleton
    // names); record → that entity; NULL names → self
    val nameEntity = reps
      .join(cc, col("__rep") === col("__cc_id"), "left")
      .select(col("__nm"),
        coalesce(col("__cc_comp"), col("__rep")).as("__ent"))
    named.join(nameEntity, Seq("__nm"), "left")
      .select(col(idCol),
        coalesce(col("__ent"), col(idCol)).as("entity_id"))
  }
}
