package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the exact integer Lloyd recurrence. */
  private def brute(vecs: Seq[(Long, Seq[Double])], k: Int, iterations: Int,
      scale: Double = 1e6): Map[Long, (Int, Long)] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * scale + 0.5).toLong).toArray
    }.sortBy(_._1)
    var cents: Array[Array[Long]] = q.take(k).map(_._2.map(identity)).toArray
    def assign(c: Array[Array[Long]]): Map[Long, (Int, Long)] =
      q.map { case (id, v) =>
        val ds = c.map(cv => v.zip(cv).map { case (a, b) =>
          val d = (a - b).toDouble; d * d
        }.sum.toLong)
        val cid = ds.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        id -> (cid, ds(cid))
      }.toMap
    for (_ <- 1 to iterations) {
      val a = assign(cents)
      val next = cents.map(_.clone())
      for (cid <- 0 until k) {
        val members = q.filter { case (id, _) => a(id)._1 == cid }
        if (members.nonEmpty) {
          val dim = members.head._2.length
          next(cid) = Array.tabulate(dim) { p =>
            val s = members.map(_._2(p)).sum
            math.floor(s.toDouble / members.size.toDouble).toLong
          }
        }
      }
      cents = next
    }
    assign(cents)
  }

  // ids ordered so the three deterministic seeds (smallest ids) land
  // one per blob — Lloyd converges to the planted clustering instead of
  // a local minimum
  private val pts = Seq(
    (1L, Seq(0.0, 0.1)), (4L, Seq(0.2, 0.0)), (7L, Seq(0.1, 0.1)),
    (2L, Seq(5.0, 5.1)), (5L, Seq(5.2, 4.9)), (8L, Seq(4.9, 5.0)),
    (3L, Seq(-3.0, 2.0)), (6L, Seq(-3.1, 2.2)), (9L, Seq(-2.9, 1.8)))

  test("kmeansAssignQuantized equals the driver-side integer Lloyd replay") {
    val df = pts.toDF("id", "vec")
    for (iters <- Seq(0, 1, 3)) {
      val got = Clustering.kmeansAssignQuantized(df, "vec", "id",
        k = 3, iterations = iters)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      assert(got === brute(pts, 3, iters), s"iterations=$iters")
    }
  }

  test("converged clustering separates the three planted blobs") {
    val df = pts.toDF("id", "vec")
    val got = Clustering.kmeansAssignQuantized(df, "vec", "id",
      k = 3, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // blob membership: same label within a blob, distinct across blobs
    assert(got(1L) == got(4L) && got(4L) == got(7L))
    assert(got(2L) == got(5L) && got(5L) == got(8L))
    assert(got(3L) == got(6L) && got(6L) == got(9L))
    assert(Set(got(1L), got(2L), got(3L)).size == 3)
  }

  test("distance ties break to the lowest centroid id") {
    // two identical seeds: every point is equidistant to both → cid 0
    val df = Seq((1L, Seq(1.0)), (2L, Seq(1.0)), (3L, Seq(2.0)))
      .toDF("id", "vec")
    val got = Clustering.kmeansAssignQuantized(df, "vec", "id",
      k = 2, iterations = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.forall(_ == 0))
  }

  test("an emptied cluster keeps its previous centroid") {
    // seeds are ids 1 and 2; all points cluster to 0 after one round,
    // so centroid 1 must stay at its seed position (id 2's vector)
    val tight = Seq((1L, Seq(0.0)), (2L, Seq(0.4)), (3L, Seq(0.1)))
      .toDF("id", "vec")
    val got = Clustering.kmeansAssignQuantized(tight, "vec", "id",
      k = 2, iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got === brute(Seq((1L, Seq(0.0)), (2L, Seq(0.4)), (3L, Seq(0.1))),
      2, 2))
  }

  test("assignment plan is shuffle-free: literal centroids, no join") {
    val df = pts.toDF("id", "vec")
    val plan = Clustering.kmeansAssignQuantized(df, "vec", "id",
      k = 3, iterations = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }

  test("prototypicalityPrune: hard and easy halves partition each cluster") {
    val df = pts.toDF("id", "vec")
    val assign = Clustering.kmeansAssignQuantized(df, "vec", "id",
        k = 3, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def prune(hard: Boolean) =
      Clustering.prototypicalityPrune(df, "vec", "id", k = 3, iterations = 2,
          keepFrac = 0.5, keepHard = hard)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val hard = prune(true)
    val easy = prune(false)
    assert((hard ++ easy) === assign, "halves cover the assignment")
    assert(hard.intersect(easy).isEmpty, "halves are disjoint")
    // within each cluster every kept-hard distance exceeds every
    // kept-easy distance — the cut is per-cluster, not global
    for (cid <- assign.map(_._2)) {
      val h = hard.collect { case (_, c, d) if c == cid => d }
      val e = easy.collect { case (_, c, d) if c == cid => d }
      if (h.nonEmpty && e.nonEmpty)
        assert(h.min > e.max, s"cluster $cid: hard ${h.min} <= easy ${e.max}")
    }
    // per-cluster replay of the exact-percentile cut (linear
    // interpolation at p = 0.5, ties land in the easy half)
    val expectedHard = assign.groupBy(_._2).flatMap { case (_, rows) =>
      val ds = rows.toSeq.map(_._3.toDouble).sorted
      val idx = 0.5 * (ds.size - 1)
      val lo = ds(idx.toInt)
      val med = lo + (idx - idx.toInt) * (ds(math.ceil(idx).toInt) - lo)
      rows.filter(_._3.toDouble > med)
    }.toSet
    assert(hard === expectedHard)
  }

  test("clusterBalancedSample: quota binds per cluster; selection is the md5(id) order (r12)") {
    // three planted blobs of 4/3/2 points; ids 1/2/3 are one per blob
    // so the k-smallest-id seeds start inside distinct blobs (the seed
    // discipline kmeansAssignQuantized documents)
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)), (4L, Seq(0.1, 0.0)), (5L, Seq(0.0, 0.1)), (6L, Seq(0.1, 0.1)),
      (2L, Seq(5.0, 5.0)), (11L, Seq(5.1, 5.0)), (12L, Seq(5.0, 5.1)),
      (3L, Seq(9.0, 0.0)), (21L, Seq(9.1, 0.0)))
    val df = vecs.toDF("id", "vec")
    val kept = Clustering.clusterBalancedSample(df, "vec", "id",
      k = 3, iterations = 3, quota = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kept.size == 6, s"expected 2 per cluster: $kept")
    assert(kept.values.groupBy(identity).values.forall(_.size == 2))
    // the kept ids per cluster are the md5-order minimum two — replay
    def md5(id: Long) = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(id.toString)
    val byCluster = Clustering.kmeansAssignQuantized(df, "vec", "id", 3, 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.map(_._1).groupBy(byCluster).foreach { case (cid, ids) =>
      val want = ids.sortBy(i => (md5(i), i)).take(2).toSet
      val got = kept.collect { case (id, c) if c == cid => id }.toSet
      assert(got == want, s"cluster $cid: got $got want $want")
    }
    // a quota past every cluster size keeps everything
    assert(Clustering.clusterBalancedSample(df, "vec", "id", 3, 3,
      quota = 100).count() == vecs.size)
    intercept[IllegalArgumentException](
      Clustering.clusterBalancedSample(df, "vec", "id", 3, 3, quota = 0))
  }

  test("prototypicalityPrune: boundary fractions keep all / none") {
    val df = pts.toDF("id", "vec")
    val all = Clustering.prototypicalityPrune(df, "vec", "id", 3, 2,
      keepFrac = 1.0).count()
    val none = Clustering.prototypicalityPrune(df, "vec", "id", 3, 2,
      keepFrac = 0.0).count()
    assert(all === 9L && none === 0L)
    intercept[IllegalArgumentException](
      Clustering.prototypicalityPrune(df, "vec", "id", 3, 2, keepFrac = 1.5))
  }
}
