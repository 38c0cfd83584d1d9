package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic decontamination — the embedding-space sibling of the
  * verbatim-gram decontamination tier (q75/q79/q109/q167): drop every
  * corpus vector whose cosine to ANY eval-probe vector reaches the
  * threshold. This is the "remove anything semantically close to the
  * benchmark" pass a leakage audit runs when paraphrase contamination
  * defeats exact n-gram matching (the reference's churn pipeline has
  * no embedding tier; capability sibling of its label-leakage columns,
  * Feature_Store_Telco_Churn_Flight_School.py:253-259).
  *
  * Two entry points, split by probe-set scale (the
  * bruteForceTopK/ivfIndexedTopK discipline):
  *
  *  - [[retainBelow]] — a real eval-probe set is contractually SMALL
  *    (thousands of benchmark items), so it broadcasts onto ONE corpus
  *    scan; the per-vector max-probe-cosine is a hash agg on the
  *    corpus id; retention is the filter. The corpus never self-joins
  *    and never shuffles its payload. The contract is ENFORCED: a
  *    probe frame past `maxProbes` fails fast with a named error
  *    before any broadcast builds (r12 verdict: the guard was
  *    documented but not coded).
  *  - [[retainBelowIvf]] — a corpus-scale probe set (say, a whole
  *    held-out split) must NOT broadcast. Probes route through an
  *    existing materialized IVF index ([[Similarity.ivfIndexWrite]] /
  *    [[IvfIndex]] root): each probe joins only its `nprobe` nearest
  *    Voronoi cells, so the candidate set is ≈ corpus × nprobe/nlist
  *    and both sides shuffle on the (small-cardinality) cell id — no
  *    driver-side cell collect, no broadcast of either side.
  */
object Decontamination {

  /** Broadcast-probe decontamination. Output: one row per corpus
    * vector retained at the threshold — (`idCol`, max_probe_cos) with
    * max_probe_cos < threshold. Exact doubles end-to-end (the q29/q30
    * cosine portability), so gates can hash every retained row.
    *
    * `excludeSelf` skips probe rows with the same id as the corpus
    * row — for probe sets carved OUT of the corpus (the q187 gate
    * shape), where a vector's cosine to itself is 1.0 and would drop
    * every probe.
    *
    * The probe count is checked with a bounded `limit(maxProbes+1)`
    * count — it short-circuits, so the guard costs one bounded scan
    * even when a caller mistakenly passes the full corpus.
    *
    * A corpus vector NO probe reaches (an empty probe set, or
    * `excludeSelf` against a singleton self-probe) is RETAINED with a
    * NULL max_probe_cos — the [[retainBelowIvf]] contract. The join is
    * left-outer for exactly this: the first cut's inner join dropped
    * the whole corpus for an empty probe frame (r13 fresh-eyes audit),
    * which is the opposite of what "nothing to decontaminate against"
    * means.
    */
  def retainBelow(corpus: DataFrame, probes: DataFrame, threshold: Double,
      idCol: String = "vec_id", embCol: String = "embedding",
      excludeSelf: Boolean = false, maxProbes: Int = 100000): DataFrame =
    maxProbeCos(corpus, probes, idCol, embCol, excludeSelf, maxProbes)
      .filter(col("max_probe_cos").isNull || col("max_probe_cos") < threshold)

  /** The UNFILTERED exact pass [[retainBelow]] thresholds: one row per
    * corpus vector with its true max probe cosine (NULL when no probe
    * reaches it). Exposed separately so invariant gates can bound an
    * IVF-routed max against the TRUE max for EVERY vector — checking
    * bounds only on the retained subset silently skips exactly the
    * vectors the exact pass drops (r13 ADVICE on q198).
    */
  def maxProbeCos(corpus: DataFrame, probes: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding",
      excludeSelf: Boolean = false, maxProbes: Int = 100000): DataFrame = {
    require(maxProbes > 0, s"maxProbeCos: maxProbes must be > 0, got $maxProbes")
    val nProbe = probes.select(col(idCol)).limit(maxProbes + 1).count()
    require(nProbe <= maxProbes,
      s"maxProbeCos: probe set exceeds maxProbes=$maxProbes — the broadcast " +
        "path is for eval-suite-sized probe sets; route corpus-scale probe " +
        "frames through retainBelowIvf against a materialized IVF index")
    // float32-native cosines (see DotProduct): half the broadcast and
    // per-pair row bytes, bit-identical results (r18)
    val p = probes.select(col(idCol).as("_pid"), col(embCol).as("_pe"))
    val base = corpus.select(col(idCol), col(embCol).as("_e"))
    val cond = if (excludeSelf) col(idCol) =!= col("_pid") else lit(true)
    base.join(broadcast(p), cond, "left_outer")
      .groupBy(col(idCol))
      .agg(max(Similarity.cosine(col("_e"), col("_pe"))).as("max_probe_cos"))
  }

  /** IVF-routed decontamination for probe sets too large to broadcast.
    *
    * Each probe is assigned its `nprobe` nearest cells against the
    * index's frozen centroid sidecar (nlist rows — THAT is the only
    * broadcast), then joins the index's cell-partitioned data on the
    * cell id; the per-vector max cosine is a hash agg over routed
    * candidates only. Approximate in exactly the IVF way: a corpus
    * vector is compared only against probes routed to ITS cell, so its
    * computed max is a LOWER bound of the true max and the retained
    * set is a SUPERSET of [[retainBelow]]'s (decontamination can
    * under-drop, never over-drop). `nprobe = nlist` routes every probe
    * everywhere and reproduces the broadcast variant exactly
    * (DecontaminationSpec pins both properties).
    *
    * Output: (`idCol`, max_probe_cos) for retained vectors;
    * max_probe_cos is NULL for vectors no probe was routed to.
    * Skew posture: per-cell work is |probes∩cell| × |vectors∩cell| —
    * inherent to IVF routing; a hot cell is AQE join skew on the cell
    * key, and the fix for a structurally hot cell is a finer nlist at
    * index build, not a different join.
    */
  def retainBelowIvf(spark: SparkSession, rawDir: String, probes: DataFrame,
      threshold: Double, nprobe: Int = 4,
      idCol: String = "vec_id", embCol: String = "embedding",
      excludeSelf: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"retainBelowIvf: nprobe must be >= 1, got $nprobe")
    // resolve a versioned root ONCE: the routing and the scan then read
    // one immutable snapshot across a concurrent rebuild swap
    val dir = IvfIndex.resolveDir(spark, rawDir)
    val centDf = spark.read.parquet(s"$dir/centroids")
    val routed = Similarity.nearestCells(probes, centDf, nprobe, idCol, embCol)
    val data = spark.read.parquet(s"$dir/data")
    val scored0 = routed.join(data, Seq("cell"))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("neighbor_id"))
      else scored0
    val maxCos = scored
      .groupBy(col("neighbor_id"))
      .agg(max(Similarity.cosine(col("q_emb"), col("c_emb")))
        .as("max_probe_cos"))
    data.select(col("neighbor_id"))
      .join(maxCos, Seq("neighbor_id"), "left_outer")
      .filter(col("max_probe_cos").isNull || col("max_probe_cos") < threshold)
      .select(col("neighbor_id").as(idCol), col("max_probe_cos"))
  }
}
