package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact prefix-filtered set-similarity join vs driver-side brute
  * force: the prefix filter must be LOSSLESS (every qualifying pair
  * survives candidate generation) and the plan must stay equi-join
  * shaped (no nested-loop operator at any scale).
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "alpha beta gamma epsilon"),      // J(0,1) = 3/5 = 0.6
    (2L, "alpha beta gamma delta"),        // exact dup of 0 → J = 1.0
    (3L, "zeta eta theta"),
    (4L, "zeta eta theta iota kappa"),     // J(3,4) = 3/5 = 0.6
    (5L, "alpha zeta unrelated words here"),
    (6L, ""),                              // empty set: excluded
    (7L, "beta beta beta alpha"),          // repeats collapse: {beta,alpha}
    (8L, "lambda"),                        // singleton, no partner
    (9L, "ALPHA Beta GAMMA delta"))        // case-normalized dup of 0

  private def bruteForce(corpus: Seq[(Long, String)], t: Double): Map[(Long, Long), Long] = {
    val sets = corpus.map { case (id, s) =>
      id -> (if (s.trim.isEmpty) Set.empty[String]
             else s.trim.toLowerCase.split("\\s+").toSet)
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (ia, ib) -> math.floor(j * 1e9 + 0.5).toLong).toMap
  }

  test("jaccardJoinExact matches brute force, boundary pairs included") {
    val df = docs.toDF("doc_id", "text")
    val got = SetSimJoin.jaccardJoinExact(df, "text", "doc_id", minJaccard = 0.6)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val want = bruteForce(docs, 0.6)
    assert(got === want, s"got $got want $want")
    // the threshold-boundary pairs (J exactly 0.6) must survive
    assert(got.contains((0L, 1L)) && got.contains((3L, 4L)))
    // the exact and case-normalized dups score 1.0
    assert(got((0L, 2L)) === 1000000000L && got((0L, 9L)) === 1000000000L)
  }

  test("jaccardJoinExact: lower threshold widens, never loses pairs") {
    val df = docs.toDF("doc_id", "text")
    val high = SetSimJoin.jaccardJoinExact(df, "text", "doc_id", 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val low = SetSimJoin.jaccardJoinExact(df, "text", "doc_id", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(high.subsetOf(low))
    assert(low === bruteForce(docs, 0.3).keySet)
  }

  test("jaccardJoinExact: no nested-loop operator in the plan") {
    val df = docs.toDF("doc_id", "text")
    val plan = SetSimJoin.jaccardJoinExact(df, "text", "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("property: prefix filter lossless on random corpora at every threshold") {
    // the q154 hash gate proves losslessness on ONE corpus; this
    // generalizes it: random small-vocab corpora (the adversarial
    // case — heavy token sharing, long prefix buckets) must equal
    // brute force at thresholds across the range, including 1.0
    import org.scalacheck.{Gen, rng}
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def corpusGen(n: Int): Gen[List[String]] =
      Gen.listOfN(n, Gen.choose(0, 6).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    for (seed <- 0 until 6; t <- Seq(0.3, 0.6, 0.9, 1.0)) {
      val texts = corpusGen(18)(Gen.Parameters.default, rng.Seed(seed * 31 + 7))
        .getOrElse(Nil)
      val rows = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = rows.toDF("doc_id", "text")
      val got = SetSimJoin.jaccardJoinExact(df, "text", "doc_id", t)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      assert(got === bruteForce(rows, t), s"seed=$seed t=$t corpus=$texts")
    }
  }

  private def bruteContainment(corpus: Seq[(Long, String)],
      t: Double): Map[(Long, Long), Long] = {
    val sets = corpus.map { case (id, s) =>
      id -> (if (s.trim.isEmpty) Set.empty[String]
             else s.trim.toLowerCase.split("\\s+").toSet)
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      c = (sa & sb).size.toDouble / sa.size
      if c >= t
    } yield (ia, ib) -> math.floor(c * 1e9 + 0.5).toLong).toMap
  }

  test("containmentJoinExact matches brute force; direction is asymmetric (r12)") {
    val corpus = docs :+ (10L, "alpha beta")  // {alpha,beta} ⊂ doc 0's set
    val df = corpus.toDF("doc_id", "text")
    val got = SetSimJoin.containmentJoinExact(df, "text", "doc_id", 0.9)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val want = bruteContainment(corpus, 0.9)
    assert(got === want, s"got $got want $want")
    // the subset points INTO its supersets (docs 0/1/2/9 all hold
    // {alpha, beta}), never the reverse — Jaccard(10, 0) is only 2/4
    assert(got((10L, 0L)) === 1000000000L)
    assert(!got.contains((0L, 10L)))
    // exact dups contain each other: both directions present
    assert(got.contains((0L, 2L)) && got.contains((2L, 0L)))
  }

  test("containmentJoinExact: no nested-loop operator; threshold guard (r12)") {
    val df = docs.toDF("doc_id", "text")
    val plan = SetSimJoin.containmentJoinExact(df, "text", "doc_id", 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    intercept[IllegalArgumentException](
      SetSimJoin.containmentJoinExact(df, "text", "doc_id", 0.0))
  }

  test("property: asymmetric prefix filter lossless on random corpora (r12)") {
    // heavy-sharing small-vocab corpora: A-prefix ⋈ B-all candidate
    // generation must equal brute force at thresholds across the
    // range, including 1.0 (strict subset/equality only)
    import org.scalacheck.{Gen, rng}
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def corpusGen(n: Int): Gen[List[String]] =
      Gen.listOfN(n, Gen.choose(0, 6).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    for (seed <- 0 until 6; t <- Seq(0.3, 0.6, 0.9, 1.0)) {
      val texts = corpusGen(18)(Gen.Parameters.default, rng.Seed(seed * 17 + 3))
        .getOrElse(Nil)
      val rows = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = rows.toDF("doc_id", "text")
      val got = SetSimJoin.containmentJoinExact(df, "text", "doc_id", t)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, c) => (a, b) -> c }.toMap
      assert(got === bruteContainment(rows, t), s"seed=$seed t=$t corpus=$texts")
    }
  }

  test("jaccardJoinExact recovers every planted near-dup on real docs") {
    val docsT = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docsT.unionByName(docsT
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", regexp_replace(col("text"), "^\\S+\\s*", "")))
    val rows = planted.as[(Long, String)].collect().toSeq
    val got = SetSimJoin.jaccardJoinExact(planted, "text", "doc_id", 0.5)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got === bruteForce(rows, 0.5))
  }
}
