package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** [extension] Product quantization for billion-scale ANN
  * (Jégou/Douze/Schmid, "Product quantization for nearest neighbor
  * search", TPAMI 2011) — the memory half of the ANN scale story that
  * [[Similarity.ivfTopK]]'s coarse quantizer leaves open:
  *
  *   - TRAIN: split the `dim` dims into `m` subspaces of dim/m; fit an
  *     independent ksub-centroid KMeans per subspace (on a seeded
  *     sample — the codebooks need O(ksub·10³) points, not the corpus).
  *   - ENCODE: each vector becomes m byte codes (+ its exact norm) —
  *     a float32[64] embedding compresses 256 B → 8 B, which is what
  *     lets 10⁹ vectors sit in cluster memory.
  *   - SEARCH (ADC): per query, ONE m×ksub table of sub-dot-products;
  *     each candidate then costs m byte lookups instead of dim
  *     multiplies. Approximate top-`refine·k` by ADC score, then exact
  *     cosine re-rank of that short list against the raw vectors.
  *
  * All three steps are narrow passes or broadcast joins — the corpus
  * shuffles zero times; only the per-query top lists move.
  */
object Pq {

  final case class Codebooks(dim: Int, m: Int, ksub: Int,
      centroids: Array[Array[Array[Double]]]) {
    require(dim % m == 0, s"PQ: dim $dim must divide into m=$m subspaces")
    val dsub: Int = dim / m
  }

  /** Fit per-subspace codebooks. `fitFraction` samples the corpus for
    * training (seeded); tiny corpora fall back to the full fit the
    * same way [[Similarity.ivfTopK]] does.
    */
  def train(corpus: DataFrame, dim: Int, m: Int = 8, ksub: Int = 16,
      embCol: String = "embedding", fitFraction: Double = 1.0): Codebooks = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dim % m == 0, s"PQ: dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val base = Dedup.balanced(corpus)
      .select(Similarity.asDouble(col(embCol)).as("emb"))
    val sampled =
      if (fitFraction >= 1.0) base
      else {
        val s = base.sample(withReplacement = false, fitFraction, seed = 42L)
        if (s.count() >= ksub.toLong * 4) s else base
      }
    val cached = sampled.cache()
    try {
      val centroids = (0 until m).map { sub =>
        val subDf = cached.select(
          array_to_vector(slice(col("emb"), sub * dsub + 1, dsub)).as("features"))
        new KMeans().setK(ksub).setSeed(42L + sub).setMaxIter(5)
          .fit(subDf).clusterCenters.map(_.toArray)
      }
      Codebooks(dim, m, ksub, centroids.toArray)
    } finally { cached.unpersist(); () }
  }

  /** Encode the corpus: (id, m-byte codes, exact norm). The norm rides
    * along so ADC scores can rank by approximate cosine.
    */
  def encode(corpus: DataFrame, cb: Codebooks,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    Dedup.balanced(corpus).select(
      col(idCol).as("neighbor_id"),
      VectorExpressions.pqEncode(
        Similarity.asDouble(col(embCol)), cb.centroids).as("codes"),
      Similarity.norm(Similarity.asDouble(col(embCol))).as("nrm"))

  /** Approximate top-k by ADC + exact cosine re-rank of the
    * `refine·k` ADC survivors. Queries are small by contract
    * (broadcast); the encoded corpus is scanned once, narrow.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, cb: Codebooks,
      idCol: String = "vec_id", embCol: String = "embedding",
      refine: Int = 4): DataFrame = {
    val codes = encode(corpus, cb, idCol, embCol)
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorExpressions.pqAdcTable(
        Similarity.asDouble(col(embCol)), cb.centroids).as("adc"))
    // approx cosine ∝ adcDot / |v| (|q| is constant per query)
    val approx = codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (VectorExpressions.pqAdcDot(col("codes"), col("adc"), cb.ksub) / col("nrm"))
          .as("adc_score"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("neighbor_id"))
    val shortList = approx.withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= k.toLong * refine)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank of the short list only
    val cEmb = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(embCol)).as("c_emb"))
    val qEmb = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(embCol)).as("q_emb"))
    val exact = shortList
      .join(broadcast(qEmb), Seq("query_id"))
      .join(cEmb, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("q_emb"), col("c_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** ADC approximation quality: mean |adcDot/(|q||v|) − cosine| over
    * all query×corpus pairs — the quantization-error diagnostic a
    * deployment tunes (m, ksub) against.
    */
  def adcError(corpus: DataFrame, queries: DataFrame, cb: Codebooks,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val codes = encode(corpus, cb, idCol, embCol)
    val q = queries.select(
      col(idCol).as("query_id"),
      Similarity.asDouble(col(embCol)).as("q_emb"),
      VectorExpressions.pqAdcTable(
        Similarity.asDouble(col(embCol)), cb.centroids).as("adc"))
    val cEmb = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(embCol)).as("c_emb"))
    codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .join(cEmb, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        abs(VectorExpressions.pqAdcDot(col("codes"), col("adc"), cb.ksub)
          / (col("nrm") * Similarity.norm(col("q_emb")))
          - Similarity.cosine(col("q_emb"), col("c_emb"))).as("abs_err"))
      .agg(avg(col("abs_err")).as("mean_abs_err"), max(col("abs_err")).as("max_abs_err"))
  }
}
