package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProjectionsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private lazy val embs: Array[(Long, Array[Double])] =
    graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)

  test("moments matches local brute force (mean and covariance)") {
    val df = graft.Tables.load(spark, sfDir, "embeddings")
    val m = Projections.moments(df, "embedding", dim)
    val xs = embs.map(_._2)
    assert(m.n == xs.length)
    val mean = Array.tabulate(dim)(i => xs.map(_(i)).sum / xs.length)
    for (i <- 0 until dim)
      assert(math.abs(m.mean(i) - mean(i)) < 1e-9, s"mean($i)")
    // spot covariance entries (full d² check is the same loop)
    for ((i, j) <- Seq((0, 0), (0, 1), (7, 63), (63, 63), (31, 32))) {
      val want = xs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / xs.length
      assert(math.abs(m.cov(i)(j) - want) < 1e-8, s"cov($i,$j)")
      assert(m.cov(i)(j) == m.cov(j)(i), "symmetry")
    }
  }

  test("gram aggregate merges across partitions consistently") {
    val df = graft.Tables.load(spark, sfDir, "embeddings")
    val one = Projections.moments(df.coalesce(1), "embedding", dim)
    val many = Projections.moments(df.repartition(7), "embedding", dim)
    assert(one.n == many.n)
    for (i <- 0 until dim)
      assert(math.abs(one.mean(i) - many.mean(i)) < 1e-9)
  }

  test("gram aggregate skips null and short arrays") {
    val df = Seq(
      (1L, Some(Array(1.0, 2.0))),
      (2L, None),
      (3L, Some(Array(3.0))), // shorter than dim — skipped
      (4L, Some(Array(5.0, 7.0)))
    ).toDF("id", "embedding")
    val m = Projections.moments(df, "embedding", 2)
    assert(m.n == 2)
    assert(math.abs(m.mean(0) - 3.0) < 1e-12 && math.abs(m.mean(1) - 4.5) < 1e-12)
  }

  test("symmetricEigen: exact on a known 2x2, properties on the corpus cov") {
    // [[2,1],[1,2]] — eigenpairs (3, [1,1]/√2), (1, [1,-1]/√2)
    val (vals2, vecs2) = Projections.symmetricEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals2(0) - 3.0) < 1e-12 && math.abs(vals2(1) - 1.0) < 1e-12)
    assert(math.abs(math.abs(vecs2(0)(0)) - 1.0 / math.sqrt(2)) < 1e-12)

    val m = Projections.moments(
      graft.Tables.load(spark, sfDir, "embeddings"), "embedding", dim)
    val (vals, vecs) = Projections.symmetricEigen(m.cov)
    // descending, non-negative (covariance is PSD)
    for (i <- 0 until dim - 1) assert(vals(i) >= vals(i + 1) - 1e-12)
    assert(vals(dim - 1) > -1e-9)
    // orthonormal rows
    for (i <- 0 until 8; j <- 0 until 8) {
      val d = vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"vᵢ·vⱼ($i,$j)")
    }
    // residual: ||A v − λ v|| small for the top vector
    val av = m.cov.map(row => row.zip(vecs(0)).map { case (a, b) => a * b }.sum)
    val res = av.zip(vecs(0)).map { case (x, v) => x - vals(0) * v }
    assert(math.sqrt(res.map(r => r * r).sum) < 1e-8 * math.max(1.0, math.abs(vals(0))))
  }

  test("pcaProject matches local matmul; whitening gives unit variance") {
    val df = graft.Tables.load(spark, sfDir, "embeddings")
    val model = Projections.fitPca(df, "embedding", dim, k = 4)
    val got = Projections.pcaProject(df, "embedding", model, whiten = true)
      .select(col("vec_id"), col("pca")).as[(Long, Array[Double])]
      .collect().sortBy(_._1)
    val n = embs.length
    for (j <- 0 until 4) {
      val sd = math.sqrt(model.eigenvalues(j).max(0.0) + 1e-12)
      val local = embs.map { case (_, x) =>
        x.zip(model.mean).zip(model.components(j))
          .map { case ((xi, mu), c) => (xi - mu) * c }.sum / sd
      }
      got.map(_._2(j)).zip(local).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-8, s"coord $j")
      }
      // whitened coordinate has ~unit population variance
      val mu = local.sum / n
      val variance = local.map(v => (v - mu) * (v - mu)).sum / n
      assert(math.abs(variance - 1.0) < 1e-6, s"var($j) = $variance")
    }
  }

  test("projection is a narrow codegen'd map: no Exchange, graft_dot inline") {
    val df = graft.Tables.load(spark, sfDir, "embeddings")
    val model = Projections.fitPca(df, "embedding", dim, k = 2)
    val plan = Projections.pcaProject(df, "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(plan.contains("graft_dot"), s"expected codegen'd dots:\n$plan")
  }

  test("quantizedGram matches local exact integer computation") {
    val got = Projections.quantizedGram(
        graft.Tables.load(spark, sfDir, "embeddings"), "embedding")
      .as[(Long, Long, Long)].collect().toSeq
    val q = embs.map(_._2.map(x => math.floor(x * 1e6 + 0.5).toLong))
    val want = (for {
      i <- 0 until dim
      j <- i until dim
    } yield ((i + 1).toLong, (j + 1).toLong, q.map(v => v(i) * v(j)).sum)).toSeq
    assert(got == want)
  }
}
