package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * so the DuckDB oracle replays the verdicts exactly. A skewed block
  * (every "J. Smith") is the documented failure mode of prefix
  * blocking — widen `blockWidth` or add a second key (length band)
  * before resorting to salting.
  */
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
    * pair. */
  def pairs(df: DataFrame, idCol: String, nameCol: String,
            threshold: Double, blockWidth: Int = 2): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val thresholdE4 = math.round(threshold * 10000)
    val n = normalized(col(nameCol))
    val side = df.where(col(nameCol).isNotNull)
      .select(col(idCol), n.as("__n"), blockKey(n, blockWidth).as("__blk"))
    val a = side.select(col(idCol).as("id_a"), col("__n").as("__na"),
      col("__blk").as("__ba"))
    val b = side.select(col(idCol).as("id_b"), col("__n").as("__nb"),
      col("__blk").as("__bb"))
    val jwE4 = floor(NativeEditSim.jaroWinkler(col("__na"), col("__nb"))
      * 10000 + 0.5).cast("long")
    a.join(b, col("__ba") === col("__bb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jwE4.as("jw_e4"))
      .where(col("jw_e4") >= thresholdE4)
  }

  /** Resolve every record to an entity: `(idCol, entity_id)` where
    * `entity_id` is the minimum record id of the record's similarity
    * cluster (transitive closure over [[pairs]]); unmatched records
    * are their own entity. Records with NULL names resolve to
    * themselves — junk never merges entities. */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
              threshold: Double, blockWidth: Int = 2): DataFrame = {
    val p = pairs(df, idCol, nameCol, threshold, blockWidth)
    // rename before the join: the caller's idCol may itself be "id"
    val cc = Dedup.connectedComponentsAdaptive(p)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.select(col(idCol))
      .join(cc, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol),
        coalesce(col("__cc_comp"), col(idCol)).as("entity_id"))
  }
}
