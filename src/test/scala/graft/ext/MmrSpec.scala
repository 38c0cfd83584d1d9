package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MMR diversity re-rank vs a driver-side replay of the greedy
  * recurrence: the pick SEQUENCE (not just the set) must match, in
  * exact integer arithmetic.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters: A near (1,0), B near (0,1); relevance favors A
  private val cands = Seq(
    (10L, Array(1.0f, 0.0f), 900L),
    (11L, Array(0.99f, 0.05f), 890L),
    (12L, Array(0.98f, 0.08f), 880L),
    (20L, Array(0.0f, 1.0f), 700L),
    (21L, Array(0.05f, 0.99f), 690L))

  private def refMmr(k: Int, num: Long, den: Long,
      in: Seq[(Long, Array[Float], Long)]): Seq[(Long, Long, Long)] = {
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    def n2(v: Array[Long]): Long = v.map(x => x * x).sum
    def sim(a: Array[Long], b: Array[Long]): Long = {
      val na = n2(a); val nb = n2(b)
      if (na == 0 || nb == 0) 0L
      else math.floor(a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
        math.sqrt(na.toDouble) / math.sqrt(nb.toDouble) * 1e9 + 0.5).toLong
    }
    var remaining = in.map { case (id, v, rel) => (id, q(v), rel) }
    var sel = List.empty[Array[Long]]
    (1 to math.min(k, in.size)).map { rnk =>
      val scored = remaining.map { case (id, v, rel) =>
        val ms = if (sel.isEmpty) 0L else sel.map(s => sim(v, s)).max
        (id, v, num * rel - (den - num) * ms)
      }
      val (id, v, mmr) = scored.minBy { case (i, _, m) => (-m, i) }
      sel = v :: sel
      remaining = remaining.filterNot(_._1 == id)
      (rnk.toLong, id, mmr)
    }
  }

  test("mmrRerank alternates clusters; trajectory matches the replay") {
    val df = cands.toDF("vec_id", "embedding", "rel_q")
    val got = Mmr.mmrRerank(df, "embedding", "vec_id", "rel_q",
      k = 4, dims = 2).as[(Long, Long, Long)].collect().toSeq
    assert(got === refMmr(4, 1, 2, cands))
    // diversity: pick 1 is the most relevant (10), pick 2 jumps to the
    // B cluster (20) because A's runners-up are near-copies of pick 1
    assert(got.map(_._2).take(2) === Seq(10L, 20L))
  }

  test("mmrRerank: λ=1 degenerates to pure relevance order") {
    val df = cands.toDF("vec_id", "embedding", "rel_q")
    val got = Mmr.mmrRerank(df, "embedding", "vec_id", "rel_q",
      k = 5, dims = 2, lambdaNum = 1, lambdaDen = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === Seq(10L, 11L, 12L, 20L, 21L))
  }

  test("mmrRerank: k past the candidate count returns them all, once") {
    val df = cands.take(2).toDF("vec_id", "embedding", "rel_q")
    val got = Mmr.mmrRerank(df, "embedding", "vec_id", "rel_q",
      k = 10, dims = 2).as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).sorted === Seq(10L, 11L))
    assert(got === refMmr(10, 1, 2, cands.take(2)))
  }

  test("mmrRerank: an exact duplicate of a pick is maximally penalized") {
    val withDup = cands :+ (99L, Array(1.0f, 0.0f), 899L) // copy of 10
    val df = withDup.toDF("vec_id", "embedding", "rel_q")
    val got = Mmr.mmrRerank(df, "embedding", "vec_id", "rel_q",
      k = 6, dims = 2).as[(Long, Long, Long)].collect().toSeq
    assert(got === refMmr(6, 1, 2, withDup))
    // the duplicate (2nd-highest relevance) must NOT be pick 2
    assert(got(1)._2 !== 99L)
  }

  test("mmrRerank: exact score ties resolve by id — same pick as the replay (r12 audit)") {
    // 30L and 31L are byte-identical vectors with equal relevance: at
    // every iteration their den·score ties EXACTLY (same integers on
    // both sides), so the (_mmr DESC, _id) order must pick 30L first —
    // and the driver-side replay, running the same recurrence, must
    // agree on the full trajectory
    val tied = Seq(
      (30L, Array(0.6f, 0.4f), 800L),
      (31L, Array(0.6f, 0.4f), 800L),
      (40L, Array(0.1f, 0.9f), 750L))
    val df = tied.toDF("id", "vec", "rel")
    val got = Mmr.mmrRerank(df, "vec", "id", "rel", k = 3, dims = 2)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == refMmr(3, 1L, 2L, tied))
    assert(got.map(_._2).indexOf(30L) < got.map(_._2).indexOf(31L),
      s"tie must break to the lower id first: $got")
  }

  test("mmrRerank: guards — candidate cap and lambda range") {
    val df = cands.toDF("vec_id", "embedding", "rel_q")
    intercept[IllegalArgumentException](
      Mmr.mmrRerank(df, "embedding", "vec_id", "rel_q", k = 2, dims = 2,
        maxCandidates = 3))
    intercept[IllegalArgumentException](
      Mmr.mmrRerank(df, "embedding", "vec_id", "rel_q", k = 2, dims = 2,
        lambdaNum = 3, lambdaDen = 2))
  }
}
