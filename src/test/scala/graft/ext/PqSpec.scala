package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private lazy val emb = graft.Tables.load(spark, sfDir, "embeddings")
  private lazy val cb = Pq.train(emb, dim = 64, m = 8, ksub = 16)

  test("train: m codebooks of ksub centroids of dsub dims") {
    assert(cb.centroids.length == 8)
    assert(cb.centroids.forall(_.length == 16))
    assert(cb.centroids.forall(_.forall(_.length == 8)))
  }

  test("encode: m byte codes per vector, in range, deterministic") {
    val a = Pq.encode(emb, cb).orderBy("neighbor_id").collect()
    val b = Pq.encode(emb, cb).orderBy("neighbor_id").collect()
    assert(a.length == emb.count())
    a.foreach { r =>
      val codes = r.getAs[Array[Byte]]("codes")
      assert(codes.length == 8)
      assert(codes.forall(c => (c & 0xFF) < 16))
    }
    assert(a.map(_.getAs[Array[Byte]]("codes").toSeq).toSeq ==
      b.map(_.getAs[Array[Byte]]("codes").toSeq).toSeq)
  }

  test("ADC approximation error is bounded") {
    val queries = emb.filter(col("vec_id") < 5)
    val err = Pq.adcError(emb, queries, cb).head()
    val mean = err.getDouble(0)
    // 8 subspaces × 16 centroids on 64-dim data: the ADC cosine should
    // track the exact cosine closely on average (loose 2× margin over
    // observed ~0.05)
    assert(mean < 0.15, s"mean ADC |error| too high: $mean")
  }

  test("ivfPqTopK: cell-pruned ADC recovers neighbors; candidates pruned") {
    val queries = emb.filter(col("vec_id") < 5)
    val coarse = Pq.trainCoarse(emb, dim = 64, nlist = 8)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Pq.ivfPqTopK(emb, queries, k = 5, coarse, cb, nprobe = 4).collect()
    val byQuery = ivfpq.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // probing half the cells: meaningful recall, like the IVF spec
    val pairs = ivfpq.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pairs.intersect(bf).size >= bf.size / 3,
      s"IVF+PQ recall too low: ${pairs.intersect(bf).size}/${bf.size}")
    // every vector is assigned exactly one cell and all cells are used
    val cells = Pq.encode(emb, coarse).select("codes").collect()
      .map(r => r.getAs[Array[Byte]](0)(0) & 0xFF)
    assert(cells.distinct.sorted.toSeq.forall(_ < 8) && cells.distinct.length > 1)
  }

  test("pqTopK: ADC short-list + exact re-rank recovers true neighbors") {
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.pqTopK(emb, queries, k = 5, cb).collect()
    val byQuery = pq.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    val pqPairs = pq.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pqPairs.intersect(bf).size >= bf.size / 3,
      s"PQ recall too low: ${pqPairs.intersect(bf).size}/${bf.size}")
  }
}
