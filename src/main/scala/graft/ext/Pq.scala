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

  /** Fit per-subspace codebooks on a BOUNDED seeded sample collected
    * to the driver. This is a deliberate, size-capped collect: PQ
    * codebooks need O(ksub·10³) training points regardless of corpus
    * size (faiss trains exactly this way), so the driver holds ≤
    * `maxFitPoints`·dim doubles — a fixed few MB at any corpus scale —
    * and m tiny Lloyd's loops run in microseconds instead of m
    * distributed KMeans jobs whose fixed scheduling overhead dwarfs
    * the arithmetic. Deterministic: seeded sample, evenly-spaced
    * initial centroids, fixed iteration count.
    */
  def train(corpus: DataFrame, dim: Int, m: Int = 8, ksub: Int = 16,
      embCol: String = "embedding", maxFitPoints: Int = 2048,
      iters: Int = 8): Codebooks = {
    require(dim % m == 0, s"PQ: dim $dim must divide into m=$m subspaces")
    require(maxFitPoints >= ksub, s"PQ: need at least ksub=$ksub fit points")
    val dsub = dim / m
    val sample: Array[Array[Double]] = corpus
      .select(Similarity.asDouble(col(embCol)).as("emb"))
      .orderBy(xxhash64(col(embCol))) // seeded, corpus-size-independent pick
      .limit(maxFitPoints)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ: empty corpus")
    val centroids = Array.tabulate(m) { sub =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      lloyd(pts, ksub, iters)
    }
    Codebooks(dim, m, ksub, centroids)
  }

  /** Plain Lloyd's k-means over an in-memory point set: evenly-spaced
    * init over the (hash-ordered) sample, empty clusters re-seeded to
    * the point farthest from its centroid.
    */
  private[ext] def lloyd(pts: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val d = pts(0).length
    val n = pts.length
    val cents = Array.tabulate(k)(i => pts(((i.toLong * n) / k).toInt % n).clone())
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) { // assignment
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0; var j = 0
          while (j < d) { val t = pts(i)(j) - cents(c)(j); dist += t * t; j += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Int](k)
      i = 0
      while (i < n) { // update
        val c = assign(i); counts(c) += 1
        var j = 0
        while (j < d) { sums(c)(j) += pts(i)(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < d) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } else {
          // re-seed an empty cluster with the worst-fit point
          var worst = 0; var worstD = -1.0
          var i2 = 0
          while (i2 < n) {
            val a = assign(i2)
            var dist = 0.0; var j = 0
            while (j < d) { val t = pts(i2)(j) - cents(a)(j); dist += t * t; j += 1 }
            if (dist > worstD) { worstD = dist; worst = i2 }
            i2 += 1
          }
          cents(c) = pts(worst).clone()
        }
        c += 1
      }
      it += 1
    }
    cents
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
    exactReRank(adcShortList(approx, k, refine), corpus, queries, k, idCol, embCol)
  }

  /** Train a coarse (cell) quantizer: nlist centroids over the FULL
    * dim — expressed as a 1-subspace codebook so cell assignment
    * reuses the fused PqEncode argmin expression.
    */
  def trainCoarse(corpus: DataFrame, dim: Int, nlist: Int = 16,
      embCol: String = "embedding", maxFitPoints: Int = 2048): Codebooks =
    train(corpus, dim, m = 1, ksub = nlist, embCol, maxFitPoints)

  /** IVF + ADC — the full billion-scale ANN composition: the coarse
    * quantizer assigns every vector a cell (one byte); each query
    * probes only its `nprobe` nearest cells, so candidate volume is
    * ≈ corpus·nprobe/nlist; survivors are scored by m byte lookups
    * (ADC) and the `refine·k` short list re-ranks exactly. Memory:
    * m+1 bytes + one norm per vector. The cell join shuffles narrow
    * (cell, codes, nrm) rows only; raw embeddings are touched once at
    * encode time and once for the short list.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      coarse: Codebooks, cb: Codebooks, nprobe: Int = 4,
      idCol: String = "vec_id", embCol: String = "embedding",
      refine: Int = 4): DataFrame = {
    require(coarse.m == 1, s"ivfPqTopK: coarse quantizer must be 1-subspace, got m=${coarse.m}")
    val nlist = coarse.ksub
    // 1-byte cell id from the single-subspace PQ code
    def cellOf(codes: Column) = conv(hex(codes), 16, 10).cast("int")
    val codes = encode(corpus, cb, idCol, embCol)
      .join(Dedup.balanced(corpus).select(col(idCol).as("neighbor_id"),
        cellOf(VectorExpressions.pqEncode(
          Similarity.asDouble(col(embCol)), coarse.centroids)).as("cell")), Seq("neighbor_id"))
    // nprobe nearest cells per query: ||q-c||² ranks as ||c||² − 2·q·c;
    // q·c comes from the coarse ADC table, ||c||² is a tiny literal
    val cnorm2 = coarse.centroids(0).map(c => c.map(x => x * x).sum)
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorExpressions.pqAdcTable(
        Similarity.asDouble(col(embCol)), cb.centroids).as("adc"),
      posexplode(VectorExpressions.pqAdcTable(
        Similarity.asDouble(col(embCol)), coarse.centroids)).as(Seq("cell", "qdotc")))
    val probes = q
      .withColumn("cdist",
        element_at(lit(cnorm2), col("cell") + 1) - lit(2.0) * col("qdotc"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cell"), col("adc"))
    val approx = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (VectorExpressions.pqAdcDot(col("codes"), col("adc"), cb.ksub) / col("nrm"))
          .as("adc_score"))
    require(nlist >= nprobe, s"ivfPqTopK: nprobe $nprobe > nlist $nlist")
    exactReRank(adcShortList(approx, k, refine), corpus, queries, k, idCol, embCol)
  }

  private def adcShortList(approx: DataFrame, k: Int, refine: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_score").desc, col("neighbor_id"))
    approx.withColumn("arank", row_number().over(w))
      .filter(col("arank") <= k.toLong * refine)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Exact cosine re-rank of a (query_id, neighbor_id) short list. */
  private def exactReRank(shortList: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, idCol: String, embCol: String): DataFrame = {
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

  /** Per-dimension min-max scalar quantization to uint8 codes (the
    * faiss `SQ8` discipline) — 4× smaller than float32 embeddings
    * with ~0.4%-of-range error, the standard storage format for
    * billion-vector corpora whose exact floats live in cold storage.
    *
    * Plan shape: posexplode → per-dimension min/max aggregate (dim
    * groups — map-side partials make this one cheap shuffle of
    * dim·partitions rows), the dim-indexed min/max ARRAYS assembled in
    * a 1-row aggregate and broadcast-crossed back onto the corpus, and
    * the quantization itself is a per-row transform() inside the scan
    * projection. Nothing driver-side, nothing quadratic.
    *
    * floor((x−mn)/(mx−mn)·255 + 0.5) is pure IEEE arithmetic on
    * exactly-cast floats, so codes are bit-identical in any engine
    * (the §5.3 floor-not-round discipline); constant dimensions
    * (mx = mn) quantize to 0.
    */
  /** Quantize against EXTERNAL per-dimension bounds — the serving tier
    * of SQ8: bounds come from maintained state
    * (StreamingFeatures.maintainQuantBounds) or a training snapshot, so
    * encoding a new batch costs one scan of THAT batch, and codes stay
    * comparable across batches because the grid is FROZEN (re-deriving
    * bounds per batch would silently re-scale the space). Values
    * outside the frozen range CLAMP to 0/255 — the standard SQ
    * out-of-distribution behavior; constant dimensions (mx = mn)
    * quantize to 0. Same floor arithmetic as [[scalarQuantize]]: with
    * bounds equal to the corpus min/max the codes are identical
    * (spec-asserted).
    */
  def scalarQuantizeWithBounds(corpus: DataFrame, vecCol: String,
      idCol: String, mins: Array[Double], maxs: Array[Double]): DataFrame = {
    require(mins.length == maxs.length && mins.nonEmpty,
      s"scalarQuantizeWithBounds: bounds disagree (${mins.length} vs ${maxs.length})")
    val minsL = typedLit(mins.toSeq)
    val maxsL = typedLit(maxs.toSeq)
    corpus.select(col(idCol),
      transform(col(vecCol), (x, i) => {
        val mn = element_at(minsL, i + 1)
        val mx = element_at(maxsL, i + 1)
        // clamp the LONG floor result BEFORE the int cast — an extreme
        // out-of-range value would overflow the cast otherwise
        when(mx === mn, lit(0))
          .otherwise(greatest(lit(0L), least(lit(255L),
            floor((x.cast("double") - mn) / (mx - mn) * lit(255.0)
              + lit(0.5)))).cast("int"))
      }).as("codes"))
  }

  def scalarQuantize(corpus: DataFrame, vecCol: String,
      idCol: String): DataFrame = {
    val dims = corpus
      .select(posexplode(col(vecCol)).as(Seq("_pos", "_xf")))
      .select(col("_pos"), col("_xf").cast("double").as("_x"))
    val mm = dims.groupBy(col("_pos"))
      .agg(min(col("_x")).as("_mn"), max(col("_x")).as("_mx"))
    val arrs = mm
      .agg(array_sort(collect_list(struct(col("_pos"), col("_mn"), col("_mx"))))
        .as("_s"))
      .select(transform(col("_s"), s => s.getField("_mn")).as("_mins"),
        transform(col("_s"), s => s.getField("_mx")).as("_maxs"))
    corpus.crossJoin(broadcast(arrs))
      .select(col(idCol),
        transform(col(vecCol), (x, i) => {
          val mn = element_at(col("_mins"), i + 1)
          val mx = element_at(col("_maxs"), i + 1)
          when(mx === mn, lit(0))
            .otherwise(floor((x.cast("double") - mn) / (mx - mn) * lit(255.0)
              + lit(0.5)).cast("int"))
        }).as("codes"))
  }
}
