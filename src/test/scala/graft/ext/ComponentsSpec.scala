package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference components by driver-side union-find on collected edges. */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component (diameter >> rounds)") {
    // a 200-node path: naive min-propagation needs 200 rounds; the
    // star algorithm must finish inside the O(log n) maxRounds guard
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 200)
    assert(got.values.toSet == Set(0L))
  }

  test("multiple components, duplicate and reversed edges") {
    val edges = Seq((5L, 3L), (3L, 5L), (3L, 9L), (20L, 21L), (21L, 20L),
      (40L, 40L), (50L, 51L), (51L, 52L), (52L, 50L))
    val got = run(edges)
    // self-loop-only node 40 contributes no edge, hence no row
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 50L -> 50L, 51L -> 50L, 52L -> 50L))
  }

  test("matches union-find on a deterministic pseudo-random graph") {
    // ids 0..399, edges from id arithmetic: enough collisions for
    // non-trivial merge chains, fully deterministic
    val edges = (0L until 400L).flatMap { i =>
      Seq((i, (i * 7 + 3) % 400), (i, (i * i + 11) % 400))
    }.filter { case (a, b) => a != b }
    assert(run(edges) == bruteComponents(edges))
  }

  test("string ids: components by lexicographic minimum") {
    val got = Components.connectedComponents(
      Seq(("beta", "alpha"), ("beta", "gamma"), ("zeta", "eta"))
        .toDF("src", "dst"))
      .as[(String, String)].collect().toMap
    assert(got == Map("alpha" -> "alpha", "beta" -> "alpha",
      "gamma" -> "alpha", "zeta" -> "eta", "eta" -> "eta"))
  }

  test("empty and null-endpoint edges yield an empty result") {
    val e = Seq((Some(1L), None: Option[Long]), (None, Some(2L)))
      .toDF("src", "dst")
    assert(Components.connectedComponents(e).isEmpty)
  }

  test("maxRounds guard fails loudly instead of returning a non-fixpoint") {
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException](
      Components.connectedComponents(chain, maxRounds = 1))
    assert(e.getMessage.contains("fixpoint"))
  }

  test("nearDupRetain keeps exactly the min-id doc per MinHash cluster") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.nonEmpty, "fixture must produce near-dup pairs")
    val comp = bruteComponents(pairs)
    val expectDropped = comp.collect { case (n, c) if n != c => n }.toSet
    val retained = Dedup.nearDupRetain(docs)
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(retained == all -- expectDropped)
    // transitivity: a doc paired ONLY with an already-dropped doc is
    // still dropped (cluster semantics, not pairwise survivor rules)
    assert(expectDropped.forall(d => !retained.contains(d)))
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("node", "component").as[(Long, Long)].collect().toMap

  test("incrementalComponents ≡ full recompute across two deltas") {
    import spark.implicits._
    // E0: three separate components {1,2}, {3,4}, {5,6}
    val e0 = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val full0 = Components.connectedComponents(e0)
    // D1: cascade merge {1,2}+{3,4} via (2,3); fresh nodes (7,8)
    val d1 = Seq((2L, 3L), (7L, 8L)).toDF("src", "dst")
    val inc1 = Components.incrementalComponents(full0, d1)
    val fullEdges1 = e0.unionByName(d1)
    assert(labelsOf(inc1) == labelsOf(Components.connectedComponents(fullEdges1)))
    // D2: merge the grown {1..4} with {5,6} AND the fresh {7,8} in one
    // delta (4,5),(6,7) — a multi-component cascade seeded from inc1
    val d2 = Seq((4L, 5L), (6L, 7L)).toDF("src", "dst")
    val inc2 = Components.incrementalComponents(inc1, d2)
    val fullEdges2 = fullEdges1.unionByName(d2)
    assert(labelsOf(inc2) == labelsOf(Components.connectedComponents(fullEdges2)))
    assert(labelsOf(inc2).values.toSet == Set(1L), "everything merged to min id 1")
  }

  test("incrementalComponents: untouched components pass through; empty delta is the identity") {
    import spark.implicits._
    val e0 = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    val prior = Components.connectedComponents(e0)
    // delta touches only the {10,11} component
    val inc = Components.incrementalComponents(prior,
      Seq((11L, 12L)).toDF("src", "dst"))
    assert(labelsOf(inc) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    val same = Components.incrementalComponents(prior,
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(labelsOf(same) == labelsOf(prior))
    // intra-component delta edge: labels unchanged
    val intra = Components.incrementalComponents(prior,
      Seq((1L, 2L)).toDF("src", "dst"))
    assert(labelsOf(intra) == labelsOf(prior))
  }

  test("retainFromPairsByRank keeps the hub, min-id retention keeps the smallest id") {
    import spark.implicits._
    // star: hub 9 touches 1..4 (a template doc touching every rewrite);
    // plus isolated 100
    val docs = (Seq(1L, 2L, 3L, 4L, 9L, 100L)).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("src", "dst")
    val byId = Dedup.retainFromPairs(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(byId == Set(1L, 100L), "min-id policy keeps the smallest member")
    val byRank = Dedup.retainFromPairsByRank(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(byRank == Set(9L, 100L),
      s"rank policy must keep the hub (highest PageRank), got $byRank")
  }

  test("retainFromPairs: transitive drop over an externally supplied pair set") {
    import spark.implicits._
    // chain 1~2, 2~3 plus isolated 4: component {1,2,3} keeps only 1,
    // even though (1,3) never appears as a pair
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val kept = Dedup.retainFromPairs(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
    // empty pair set: everything survives
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Dedup.retainFromPairs(docs, none, "doc_id").count() == 4)
  }

  /** Reference per-node triangle counts by brute-force triple scan. */
  private def bruteTriangles(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val deg = nodes.map(n => n -> e.count(p => p._1 == n || p._2 == n).toLong).toMap
    val tri = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if e((a, b)) && e((b, c)) && e((a, c))
      n <- Seq(a, b, c)
    } tri(n) += 1
    nodes.map(n => n -> (deg(n), tri(n))).toMap
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Components.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("triangleCounts equals brute force on clique + star + cycle") {
    // K4 on 1-4 (4 triangles, 3 per node), star at 10, square 20-23
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L))
    val got = runTriangles(edges)
    assert(got === bruteTriangles(edges))
    assert(got(1L) === (3L, 3L))   // K4 corner
    assert(got(10L) === (3L, 0L))  // star hub: same degree, no triangles
    assert(got(20L) === (2L, 0L))  // cycle: no triangles
  }

  test("triangleCounts: dirty input (dups, reversed, self-loops) canonicalizes") {
    val dirty = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    val got = runTriangles(dirty)
    assert(got === bruteTriangles(dirty))
    assert(got(1L) === (2L, 1L) && got(2L) === (2L, 1L) && got(3L) === (2L, 1L))
  }

  test("triangleCounts: overlapping triangles accumulate per node") {
    // two triangles sharing edge (1,2): node 1 and 2 in both
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    val got = runTriangles(edges)
    assert(got === bruteTriangles(edges))
    assert(got(1L)._2 == 2 && got(2L)._2 == 2 && got(3L)._2 == 1 && got(4L)._2 == 1)
  }
}
