package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level SEMANTIC deduplication over an embedding column:
  * reduce a corpus to the retained subset under the deterministic
  * earliest-survivor rule — a document is DROPPED iff some document
  * with a smaller id is cosine-similar to it at or above the
  * threshold. The rule is order-free (it does not depend on which
  * earlier neighbors were themselves retained), so it is expressible
  * as a single anti-join against the near-dup pair set and in ANSI SQL
  * as a NOT EXISTS — the oracle-checkable definition of semantic
  * dedup. [extension] — no reference analog; the reference
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py`)
  * has no embedding operators at all.
  *
  * Two execution shapes, same contract at two scales:
  *   - [[retainExact]]: exact pairs via the tiled all-pairs join —
  *     Θ(n²) compute, distributed shape (bounded per-task memory, no
  *     BroadcastNestedLoopJoin). The honest path when n² is payable.
  *   - [[retainClustered]]: SemDeDup (Abbas et al. 2023,
  *     arXiv:2303.09540) — k-means cluster first, compare only WITHIN
  *     a cluster. Compute drops from Θ(n²) to Θ(Σ|cell|²): with
  *     nlist ∝ n the per-cell population stays flat and the whole
  *     pass is one shuffle on the cell id. The price is recall, not
  *     precision: a cross-cluster near-dup pair is never examined, so
  *     the clustered retained set is a SUPERSET of the exact one.
  */
object SemanticDedup {

  /** Exact retained ids: `vectors` minus every id with a smaller-id
    * neighbor at cosine >= threshold. Pairs come from
    * [[Similarity.cosineAllPairsTiled]] (already emits id_a < id_b),
    * so the dropped side is just the distinct right column; retention
    * is a left-anti join — no second similarity pass.
    */
  def retainExact(vectors: DataFrame, threshold: Double,
      idCol: String = "vec_id", embCol: String = "embedding",
      tiles: Int = 16): DataFrame = {
    val dropped = Similarity
      .cosineAllPairsTiled(vectors, threshold, idCol, embCol, tiles)
      .select(col("id_b").as("_dropped_id")).distinct()
    vectors.select(col(idCol))
      .join(dropped, col(idCol) === col("_dropped_id"), "left_anti")
  }

  /** SemDeDup retained ids (plus the cell each survivor landed in):
    * k-means coarse clustering (seeded, sample-fit — same quantizer
    * discipline as [[Similarity.ivfTopK]]), then the earliest-survivor
    * rule applied within each cell only. The intra-cell pair join is a
    * plain equi-join on the cell id; a skewed giant cell is ordinary
    * AQE skew territory, but the real control is nlist: size it so
    * E|cell| = n/nlist stays in the thousands and the per-cell
    * quadratic never dominates. Output ordering: (id).
    */
  def retainClustered(vectors: DataFrame, threshold: Double,
      nlist: Int = 16, maxFitPoints: Int = 4096,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0,
      s"retainClustered: threshold must be in (0,1), got $threshold")
    // float32-native within-cell pair join (see DotProduct): half the
    // cell-join bytes, bit-identical cosines. Only the centroid FIT
    // sample (<= maxFitPoints rows collected to the driver) still
    // casts — Lloyd's iterations run on double arrays.
    val c = Dedup.balanced(vectors)
      .select(col(idCol).as("id"), col(embCol).as("emb"))
    val cents = Similarity.fitCentroids(
      c.select(col("id"), Similarity.asDouble(col("emb")).as("emb")),
      "emb", nlist, maxFitPoints)
    val assigned = c
      .withColumn("cell", Similarity.cellExpr(col("emb"), cents))
      .withColumn("nrm", Similarity.norm(col("emb")))
    val l = assigned.select(col("cell"), col("id").as("id_l"),
      col("emb").as("emb_l"), col("nrm").as("nrm_l"))
    val r = assigned.select(col("cell"), col("id").as("id_r"),
      col("emb").as("emb_r"), col("nrm").as("nrm_r"))
    val dropped = l.join(r, Seq("cell"))
      .filter(col("id_l") < col("id_r"))
      .filter(Similarity.dot(col("emb_l"), col("emb_r"))
        / (col("nrm_l") * col("nrm_r")) >= threshold)
      .select(col("id_r").as("_dropped_id")).distinct()
    assigned.select(col("id").as(idCol), col("cell"))
      .join(dropped, col(idCol) === col("_dropped_id"), "left_anti")
  }
}
