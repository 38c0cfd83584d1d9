package graft.ext

import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** ScalaCheck-generated properties for the embedding compression tier
  * (the MergeProperties discipline — fixed-seed samples straight from
  * Gen, no scalatestplus bridge in the offline cache):
  *
  * - scalarQuantize: codes always in [0,255]; per-dim min maps to 0
  *   and max to 255; dequantization error ≤ half a quantization step.
  * - sign-bit Hamming: the packed XOR+popcount distance equals the
  *   brute-force sign-disagreement count for every pair drawn.
  */
class QuantizeProperties extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def vecsGen(n: Int): Gen[List[Array[Float]]] =
    Gen.listOfN(n, Gen.listOfN(dim,
      Gen.chooseNum(-8.0f, 8.0f, 0.0f)).map(_.toArray))

  private def sample(seed: Long, n: Int): List[Array[Float]] =
    vecsGen(n)(Gen.Parameters.default, rng.Seed(seed))
      .getOrElse(List(Array.fill(dim)(1.0f)))

  test("scalarQuantize properties: range, endpoints, error bound") {
    for (s <- 0 until 4) {
      val vecs = sample(77L + s, 9).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = vecs.toDF("vec_id", "embedding")
      val got = Pq.scalarQuantize(df, "embedding", "vec_id")
        .as[(Long, Array[Int])].collect().toMap
      val cols = (0 until dim).map(j => vecs.map(_._2(j).toDouble))
      val mins = cols.map(_.min); val maxs = cols.map(_.max)
      for ((id, v) <- vecs; j <- 0 until dim) {
        val code = got(id)(j)
        assert(code >= 0 && code <= 255, s"seed=$s id=$id dim=$j code=$code")
        if (maxs(j) > mins(j)) {
          val step = (maxs(j) - mins(j)) / 255.0
          val deq = mins(j) + code * step
          assert(math.abs(deq - v(j).toDouble) <= step / 2 + 1e-9,
            s"seed=$s id=$id dim=$j")
          if (v(j).toDouble == mins(j)) assert(code == 0)
          if (v(j).toDouble == maxs(j)) assert(code == 255)
        } else assert(code == 0)
      }
    }
  }

  test("binaryHammingTopK property: packed distance == sign disagreement") {
    for (s <- 0 until 3) {
      val vecs = sample(123L + s, 8).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = vecs.toDF("vec_id", "embedding")
      val q0 = vecs.head._2
      val ref = vecs.map { case (id, v) =>
        id -> (0 until dim).count(j => (v(j) > 0) != (q0(j) > 0))
      }.toMap
      val got = Retrieval.binaryHammingTopK(df, "embedding", "vec_id", 0L, 8)
        .as[(Long, Int)].collect().toMap
      assert(got === ref, s"seed=$s")
    }
  }
}
