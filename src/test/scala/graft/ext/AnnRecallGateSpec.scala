package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Recall pins for the approximate ANN tiers ON GATE DATA AT GATE
  * PARAMETERS. The q31/q35/q50/q72/q78 gates are rows-only (their cell
  * routing / codebooks are engine-specific, SURVEY §5.3), so without
  * this spec a recall regression — a broken band join, a mis-probed
  * cell, a corrupted codebook — would still "pass" the driver's
  * rows-only check.
  *
  * Two regimes, because the fixture bounds what recall CAN be:
  *
  * 1. MEASURED floors at the exact gate configuration. The sf0.01
  *    embeddings are near-isotropic (measured: background cosine
  *    0 ± 0.125, true top-5 neighbors only ~0.30–0.40), so there is no
  *    similarity gap for a sublinear tier to exploit — IVF at
  *    nprobe/nlist = 4/16 measures 0.60, PQ 0.52, IVF-PQ 0.46. That is
  *    an information-theoretic property of structureless data, not an
  *    implementation defect (on clustered corpora the same defaults
  *    measure ≥ 0.9 in PqSpec/SimilaritySpec). Floors sit under the
  *    measured values with slack; a structural break collapses recall
  *    toward chance k/n ≈ 0.01, far below every floor. Banded LSH at
  *    32 bits measures 0.02 here — indistinguishable from chance, so
  *    the gate config carries no LSH floor; regime 2 carries LSH.
  *
  * 2. PLANTED near-duplicates: queries are corpus vectors plus 20%
  *    deterministic noise (cosine ≈ 0.98 to their source, ≤ ~0.4 to
  *    everything else — the regime these tiers exist for, near-dup /
  *    semantic-dedup retrieval). Every tier, at gate parameters, must
  *    put the planted source in its top-5 for ≥ 0.8 of queries; the
  *    measured rates are ~1.0 (LSH band-collision odds at cosine 0.98
  *    are ≥ 97% per query).
  */
class AnnRecallGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 10)
  private lazy val exact = Similarity.bruteForceTopK(emb, queries, k = 5)

  private def macroRecall(approx: DataFrame, exact: DataFrame,
      nQueries: Long): Double = {
    val r = RetrievalMetrics
      .recallAtK(approx, exact, "query_id", "neighbor_id")
      .agg(avg(col("recall")).as("r"), count(lit(1)).as("nq"))
      .head()
    assert(r.getLong(1) == nQueries,
      s"every query must have a ground-truth row, got ${r.getLong(1)}")
    r.getDouble(0)
  }

  test("q35 gate config: IVF recall@5 >= 0.45 on near-isotropic gate data") {
    val got = macroRecall(Similarity.ivfTopK(emb, queries, k = 5), exact, 10L)
    assert(got >= 0.45, s"IVF macro recall@5 = $got")
  }

  test("q50 gate config: PQ recall@5 >= 0.35 on near-isotropic gate data") {
    val cb = Pq.train(emb, dim = 64, m = 8, ksub = 16)
    val got = macroRecall(Pq.pqTopK(emb, queries, k = 5, cb), exact, 10L)
    assert(got >= 0.35, s"PQ macro recall@5 = $got")
  }

  test("q72 gate config: IVF-PQ recall@5 >= 0.3 on near-isotropic gate data") {
    val coarse = Pq.trainCoarse(emb, dim = 64, nlist = 16)
    val cb = Pq.train(emb, dim = 64, m = 8, ksub = 16)
    val got = macroRecall(
      Pq.ivfPqTopK(emb, queries, k = 5, coarse, cb, nprobe = 4), exact, 10L)
    assert(got >= 0.3, s"IVF-PQ macro recall@5 = $got")
  }

  test("q78 gate config: indexed-IVF recall@5 >= 0.45 on near-isotropic gate data") {
    val idx = "/tmp/graft_recall_ivfidx"
    Similarity.ivfIndexWrite(emb, idx, nlist = 16)
    val got = macroRecall(
      Similarity.ivfIndexedTopK(spark, idx, queries, k = 5, nprobe = 4),
      exact, 10L)
    assert(got >= 0.45, s"indexed-IVF macro recall@5 = $got")
  }

  // ---------------- planted near-duplicate regime ----------------

  /** 20 queries: corpus vectors 0..19 plus 20% deterministic Gaussian
    * noise (java.util.Random seeded per query), query_id offset by
    * 10000 so the tiers' self-exclusion never drops the planted match.
    */
  private lazy val planted: DataFrame = {
    val src = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val rows = src.map { case (id, v) =>
      val rnd = new java.util.Random(id)
      val norm = math.sqrt(v.map(x => x * x).sum)
      val g = Array.fill(v.length)(rnd.nextGaussian())
      val gnorm = math.sqrt(g.map(x => x * x).sum)
      val q = v.indices.map(i => v(i) + 0.2 * norm * g(i) / gnorm).toArray
      Row(id + 10000L, q.toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(DoubleType, containsNull = false)))))
  }

  /** (query_id, neighbor_id) ground truth: the planted source. */
  private lazy val plantedTruth: DataFrame = {
    import spark.implicits._
    (0L until 20L).map(i => (i + 10000L, i)).toDF("query_id", "neighbor_id")
  }

  private def plantedHitRate(approx: DataFrame): Double =
    macroRecall(approx, plantedTruth, 20L)

  test("planted near-dups: LSH top-5 contains the source for >= 0.8 of queries") {
    val got = plantedHitRate(
      Similarity.lshTopK(emb, planted, k = 5, dim = 64))
    assert(got >= 0.8, s"LSH planted hit rate = $got")
  }

  test("planted near-dups: IVF top-5 contains the source for >= 0.8 of queries") {
    val got = plantedHitRate(Similarity.ivfTopK(emb, planted, k = 5))
    assert(got >= 0.8, s"IVF planted hit rate = $got")
  }

  test("planted near-dups: PQ top-5 contains the source for >= 0.8 of queries") {
    val cb = Pq.train(emb, dim = 64, m = 8, ksub = 16)
    val got = plantedHitRate(Pq.pqTopK(emb, planted, k = 5, cb))
    assert(got >= 0.8, s"PQ planted hit rate = $got")
  }

  test("planted near-dups: IVF-PQ top-5 contains the source for >= 0.8 of queries") {
    val coarse = Pq.trainCoarse(emb, dim = 64, nlist = 16)
    val cb = Pq.train(emb, dim = 64, m = 8, ksub = 16)
    val got = plantedHitRate(
      Pq.ivfPqTopK(emb, planted, k = 5, coarse, cb, nprobe = 4))
    assert(got >= 0.8, s"IVF-PQ planted hit rate = $got")
  }

  test("planted near-dups: indexed IVF top-5 contains the source for >= 0.8 of queries") {
    val idx = "/tmp/graft_recall_ivfidx_planted"
    Similarity.ivfIndexWrite(emb, idx, nlist = 16)
    val got = plantedHitRate(
      Similarity.ivfIndexedTopK(spark, idx, planted, k = 5, nprobe = 4))
    assert(got >= 0.8, s"indexed-IVF planted hit rate = $got")
  }
}
