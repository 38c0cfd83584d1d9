package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [extension] Distributed corpus clustering (SURVEY.md §7.6; no
  * reference citation — the reference has no clustering ops).
  *
  * Unlike the bounded-sample Lloyd fits used by the ANN quantizers
  * (`Similarity.fitCentroids`, `Pq` codebooks — the faiss discipline:
  * fit locally on a sample, fold back as literals), this is the
  * DISTRIBUTED Lloyd iteration for when the cluster LABELS of the whole
  * corpus are the product (topic bucketing, SemDeDup cells, curriculum
  * strata): assignment and centroid sums run as Spark jobs over every
  * row; only the k×d centroid table (bounded metadata, the sanctioned
  * collect) round-trips the driver per iteration.
  *
  * All arithmetic is INTEGER-exact and engine-portable (§5.3): inputs
  * quantize to BIGINT at `scale`, squared-L2 distances are exact
  * integer values (computed as ‖v‖²−2v·c+‖c‖² in doubles — every
  * intermediate is an integer < 2^53, so the doubles are exact), and
  * the centroid update is the floor-mean floor(sum/count) (sum < 2^53,
  * count ≤ n ⇒ the double division rounds to ≥ 1/n from any integer,
  * far above ulp — floor is unambiguous). A DuckDB oracle can replay
  * the whole recurrence hash-for-hash (q131).
  *
  * Scale shape: per iteration, the assignment is k codegen'd
  * `graft_dot`s against LITERAL centroids inside the scan projection
  * (the q35 IVF discipline — no join, no ML-vector conversion), and the
  * centroid update is one posexplode + (cid, dim) hash aggregate whose
  * map-side partials collapse the shuffle to k·d·partitions rows. Ties
  * break to the lowest centroid id; an emptied cluster keeps its
  * previous centroid (both mirrored in the oracle).
  */
object Clustering {

  /** Cluster assignment after `iterations` distributed Lloyd rounds
    * from deterministic seeds (the k smallest ids, cid in id order).
    * Output: (idCol, cid, dist_q) — dist_q the exact integer squared
    * L2 distance to the winning centroid in quantized units.
    */
  def kmeansAssignQuantized(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iterations: Int, scale: Double = 1e6): DataFrame = {
    require(k >= 1, s"kmeansAssignQuantized: k must be >= 1, got $k")
    require(iterations >= 0,
      s"kmeansAssignQuantized: iterations must be >= 0, got $iterations")
    val qv = transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(scale) + lit(0.5)).cast("long"))
    // NO checkpoint deliberately (r19, measured): persisting (_id,
    // _qv) as row blocks and re-reading them per Lloyd iteration lost
    // to simply re-running the columnar scan + codegen quantization
    // (q166 CPU 0.4 -> 2.1 s with the checkpoint) — LogicalRDD scans
    // forfeit the vectorized reader.
    val base = df.select(col(idCol).as("_id"), qv.as("_qv"))

    // deterministic seeds: quantized vectors of the k smallest ids
    var cents: Array[Array[Long]] = base.orderBy(col("_id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(cents.length == k,
      s"kmeansAssignQuantized: corpus has ${cents.length} rows < k=$k")

    // k exact squared distances as codegen'd expressions against
    // literal centroids; ‖v‖² is shared across all k.
    def assigned(c: Array[Array[Long]]): DataFrame = {
      val vNorm = Similarity.dot(col("_qv").cast("array<double>"),
        col("_qv").cast("array<double>"))
      val dists = c.map { cArr =>
        val cd = cArr.map(_.toDouble)
        lit(cd.map(x => x * x).sum) - lit(2.0) *
          Similarity.dot(col("_qv").cast("array<double>"), typedLit(cd.toSeq))
      }
      val minPart = if (k == 1) dists.head else least(dists.toSeq: _*)
      val cid = if (k == 1) lit(0)
        else coalesce(dists.zipWithIndex.map { case (dc, i) =>
          when(dc === minPart, lit(i))
        }.toSeq: _*)
      base.select(col("_id"), col("_qv"), cid.as("_cid"),
        (minPart + vNorm).cast("long").as("_dist"))
    }

    for (_ <- 1 to iterations) {
      val sums = assigned(cents)
        .select(col("_cid"), posexplode(col("_qv")).as(Seq("_pos", "_v")))
        .groupBy(col("_cid"), col("_pos"))
        .agg(sum(col("_v")).as("_s"), count(lit(1)).as("_n"))
        .select(col("_cid"), col("_pos"),
          floor(col("_s").cast("double") / col("_n").cast("double"))
            .cast("long").as("_m"))
        .collect()
      val next = cents.map(_.clone()) // emptied cluster keeps its centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2)
      }
      cents = next
    }

    assigned(cents).select(col("_id").as(idCol), col("_cid").as("cid"),
      col("_dist").as("dist_q"))
  }

  /** Prototypicality-based data pruning (Sorscher et al., NeurIPS 2022
    * "Beyond neural scaling laws"): score every example by its
    * squared-L2 distance to its k-means cluster centroid and keep a
    * per-cluster fraction — the HARD (far-from-centroid) examples when
    * data is abundant (`keepHard = true`, the paper's large-dataset
    * regime), the prototypical ones when it is scarce. Per-CLUSTER
    * cuts, not a global one, so a tight cluster's examples aren't
    * wholesale out-competed by a diffuse cluster's distances.
    *
    * Builds on [[kmeansAssignQuantized]] — the assignment and the
    * distance are already exact-integer and oracle-replayable; the cut
    * adds one k-row exact `percentile` aggregate broadcast back onto
    * the assignment (the q151 median-filter discipline: an exact
    * percentile is scale-free here because its input is the k-row
    * GROUPED aggregate path, and the threshold compare
    * `long > interpolated-double` is exact — dist_q < 2^53). Strict
    * `>` / non-strict `<=` keep the two regimes complementary: the
    * hard and easy halves of a cluster partition it exactly.
    *
    * Output: the kept (idCol, cid, dist_q) rows — join back to the
    * corpus by id for the pruned dataset.
    */
  def prototypicalityPrune(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iterations: Int, keepFrac: Double, keepHard: Boolean = true,
      scale: Double = 1e6): DataFrame = {
    require(keepFrac >= 0.0 && keepFrac <= 1.0,
      s"prototypicalityPrune: keepFrac must be in [0,1], got $keepFrac")
    val assign = kmeansAssignQuantized(df, vecCol, idCol, k, iterations, scale)
    // the percentile cut is strict on one side, so the boundary
    // fractions short-circuit: 1.0 keeps everything (a strict > at
    // p=0 would drop each cluster's min-dist rows), 0.0 keeps nothing
    if (keepFrac == 1.0) return assign
    if (keepFrac == 0.0) return assign.limit(0)
    val p = if (keepHard) 1.0 - keepFrac else keepFrac
    val thr = assign.groupBy(col("cid"))
      .agg(expr(s"percentile(dist_q, ${p}d)").as("_thr"))
    val kept = assign.join(broadcast(thr), Seq("cid"))
    (if (keepHard) kept.filter(col("dist_q").cast("double") > col("_thr"))
     else kept.filter(col("dist_q").cast("double") <= col("_thr")))
      .select(col(idCol), col("cid"), col("dist_q"))
  }

  /** Cluster-balanced subsampling (r12) — the diversity-preserving
    * downsample next to [[prototypicalityPrune]]'s difficulty cut:
    * assign every example to its deterministic k-means cluster, then
    * keep AT MOST `quota` per cluster, chosen by the md5(id) order
    * (the q98 portable-sampling discipline — deterministic, unbiased
    * within the cluster, replayable by the oracle) with the id as
    * tie-break. A frequency-skewed corpus (one giant near-duplicate
    * mode, many small tails) downsamples to the embedding-space
    * coverage a per-SOURCE quota cannot see.
    *
    * Scale: the assignment is the [[kmeansAssignQuantized]] scan
    * (k codegen'd distances per row); the per-cluster quota is a
    * rank-≤-quota window that Catalyst rewrites to Partial+Final
    * WindowGroupLimit — per-partition top-quota HEAPS before the cid
    * exchange (the q122 group-top-k shape), so the shuffle carries at
    * most quota rows per cluster per partition, never the corpus.
    *
    * Output: the kept (idCol, cid, dist_q) rows — join back by id for
    * the sampled dataset.
    */
  def clusterBalancedSample(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iterations: Int, quota: Int,
      scale: Double = 1e6): DataFrame = {
    require(quota >= 1, s"clusterBalancedSample: quota must be >= 1, got $quota")
    val assign = kmeansAssignQuantized(df, vecCol, idCol, k, iterations, scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    assign.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= quota)
      .select(col(idCol), col("cid"), col("dist_q"))
  }
}
