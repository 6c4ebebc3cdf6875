package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.NativeVector
import graft.functions.{Ivf, IvfIndex, Sim}

/** Semantic deduplication over an embedding column — the SemDeDup
  * design (Abbas et al., "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv:2303.09540):
  * k-means-cluster the corpus embeddings, verify cosine similarity
  * only WITHIN each cluster, and keep one representative per group of
  * semantic duplicates. Complements the lexical near-dup path
  * ([[Dedup.minhashLsh]]) — it catches paraphrases and re-encodings
  * that share meaning but few shingles.
  *
  * Scale shape (the reason the paper clusters first): candidate
  * verification is corpus²/k in expectation instead of corpus², and
  * it is reached through an equi-join on the cell id — never a corpus
  * cross product. Assignment is one map-only pass (the same native
  * argmin expression as [[Ivf.assign]]); the trained quantizer is a
  * k×dim broadcast-sized artifact; clustering the resulting pair
  * graph reuses the adaptive/star connected components from the
  * lexical path, so long dup chains converge at any scale.
  *
  * Multi-probe (`probes` > 1) assigns each vector to its `probes`
  * nearest cells, recovering duplicate pairs that straddle a cell
  * boundary (the paper's known miss class) for `probes`× the
  * candidate volume — pairs are found if the two members share ANY
  * probed cell.
  */
object SemDedup {

  /** Within-cell semantic duplicate pairs: (id_a, id_b, sim) with
    * id_a < id_b and cosine ≥ `threshold`, where candidacy = the two
    * vectors share one of their `probes` nearest cells. Cosine is
    * rounded to 4 decimals (engine-portable, same as the lexical
    * pair operators). */
  def semanticPairs(df: DataFrame, index: IvfIndex, threshold: Double,
                    probes: Int = 1,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(probes >= 1, "probes must be >= 1")
    val vecs = df
      .select(col(idCol).as("id"), Sim.asDouble(col(vecCol)).as("v"))
      .where(col("v").isNotNull)
    // cells on ids only; vectors re-joined for the verify, so the
    // band-style join moves (cell, id) rows, not embeddings
    val cells = vecs.select(col("id"),
        explode(NativeVector.nearestCentroids(col("v"), index.centroids, probes))
          .as("cell"))
    val cand = cells.as("l").join(cells.as("r"), Seq("cell"))
      .where(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(NativeVector.cosineSim(col("v_a"), col("v_b")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Cosine of each vector to its own (nearest) cell centroid:
    * (id, cell, cent_sim). The centroid table is k rows — broadcast
    * by construction. */
  private def centroidSim(vecs: DataFrame, index: IvfIndex): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cent")
    vecs.select(col("id"),
        NativeVector.nearestCentroid(col("v"), index.centroids).as("cell"),
        col("v"))
      .join(broadcast(cents), Seq("cell"))
      .select(col("id"), col("cell"),
        round(NativeVector.cosineSim(col("v"), col("cent")), 6).as("cent_sim"))
  }

  /** Full semantic dedup: cluster → within-cell pairs ≥ `threshold` →
    * connected components → one survivor per component (plus every
    * document that is in no duplicate pair).
    *
    * `keepFarthest = false` (default) keeps the min-id member —
    * deterministic and replayable by a relational oracle.
    * `keepFarthest = true` keeps the member LEAST similar to its cell
    * centroid (the paper's choice: retain the most atypical example
    * for diversity), ties broken by min id.
    *
    * `indexKey` stages the trained quantizer per corpus identity
    * (same artifact contract as [[Ivf.indexFor]]); without it the
    * quantizer is trained on every call. */
  def semDedup(df: DataFrame, k: Int, threshold: Double,
               iters: Int = 3, probes: Int = 1,
               keepFarthest: Boolean = false,
               idCol: String = "vec_id", vecCol: String = "embedding",
               indexKey: Option[String] = None,
               ccDriverCap: Int = 100000): DataFrame = {
    val index = indexKey match {
      case Some(key) => Ivf.indexFor(key, df, k, iters, vecCol)
      case None      => Ivf.train(df, k, iters, vecCol)
    }
    val pairs = semanticPairs(df, index, threshold, probes, idCol, vecCol)
    val comps = Dedup.connectedComponentsAdaptive(pairs, ccDriverCap)
    val losers =
      if (!keepFarthest)
        comps.where(col("id") =!= col("component"))
          .select(col("id").as(idCol))
      else {
        // representative = argmin (cent_sim, id) per component; the
        // centroid table join is broadcast (k rows), the component
        // reduction is one partial-aggregable min(struct)
        val vecs = df
          .select(col(idCol).as("id"), Sim.asDouble(col(vecCol)).as("v"))
          .where(col("v").isNotNull)
        val reps = comps
          .join(centroidSim(vecs, index), Seq("id"))
          .groupBy("component")
          .agg(min(struct(col("cent_sim"), col("id"))).as("rep"))
          .select(col("component"), col("rep.id").as("rep_id"))
        comps.join(reps, Seq("component"))
          .where(col("id") =!= col("rep_id"))
          .select(col("id").as(idCol))
      }
    df.join(losers, Seq(idCol), "left_anti")
  }
}
