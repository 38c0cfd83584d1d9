package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = spark.range(10000).toDF("id")

  test("hexThreshold: boundary fractions") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(0.25) == "40000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(1.0) == "g")
    intercept[IllegalArgumentException](Sampling.hexThreshold(1.5))
  }

  test("hashSample: fraction holds within binomial noise, endpoints exact") {
    val n = Sampling.hashSample(ids, col("id"), 0.3).count()
    // 10k Bernoulli(0.3): sd ≈ 46, allow 5 sd
    assert(math.abs(n - 3000) < 230, s"got $n of 10000 at frac 0.3")
    assert(Sampling.hashSample(ids, col("id"), 0.0).count() == 0)
    assert(Sampling.hashSample(ids, col("id"), 1.0).count() == 10000)
  }

  test("hashSample: deterministic and nested (smaller frac ⊆ larger)") {
    val s1 = Sampling.hashSample(ids, col("id"), 0.2).as[Long].collect().toSet
    val s2 = Sampling.hashSample(ids, col("id"), 0.2).as[Long].collect().toSet
    assert(s1 == s2, "same call must select the same set")
    val s5 = Sampling.hashSample(ids, col("id"), 0.5).as[Long].collect().toSet
    assert(s1.subsetOf(s5), "a 20% sample must nest inside the 50% sample")
  }

  test("stratifiedSample: per-stratum fractions, unlisted strata default") {
    val df = spark.range(9000)
      .select(col("id"), concat(lit("s"), col("id") % 3).as("grp"))
    val got = Sampling.stratifiedSample(df, "grp", col("id"),
      Map("s0" -> 0.8, "s1" -> 0.1), defaultFrac = 0.0)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(got("s0") - 2400) < 300, s"s0: ${got.get("s0")}")
    assert(math.abs(got("s1") - 300) < 150, s"s1: ${got.get("s1")}")
    assert(!got.contains("s2"), "default 0.0 must drop the unlisted stratum")
  }

  test("hashSplit: disjoint, exhaustive, weight-proportional, reproducible") {
    val got = Sampling.hashSplit(ids, col("id"),
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    val counts = got.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000, "splits must be exhaustive")
    assert(math.abs(counts("train") - 8000) < 250, s"train: ${counts.get("train")}")
    assert(math.abs(counts("val") - 1000) < 200, s"val: ${counts.get("val")}")
    // reproducible: split label is a function of the key
    val again = Sampling.hashSplit(ids, col("id"),
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // and the train split nests the 0.8 hashSample exactly (same threshold)
    val trainSet = got.filter(col("split") === "train")
      .select("id").as[Long].collect().toSet
    val sampled = Sampling.hashSample(ids, col("id"), 0.8)
      .as[Long].collect().toSet
    assert(trainSet == sampled)
  }

  test("sampleToMix: binding stratum keeps all, others scale to the mix") {
    // counts 1000/500/100 rebalanced to 1:1:1 → scale = 100, fracs
    // 0.1 / 0.2 / 1.0 — the smallest stratum binds and keeps all
    val df = spark.range(1600).select(col("id"),
      when(col("id") < 1000, "a").when(col("id") < 1500, "b").otherwise("c")
        .as("grp"))
      .union(spark.range(1600, 1700).select(col("id"), lit("unlisted").as("grp")))
    val got = Sampling.sampleToMix(df, "grp", col("id"),
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got("c") == 100, s"binding stratum must keep everything: $got")
    assert(math.abs(got("a") - 100) < 50 && math.abs(got("b") - 100) < 50,
      s"non-binding strata must sample toward the mix: $got")
    assert(!got.contains("unlisted"), "strata without a target are dropped")
    // the kept set is a deterministic function of the keys
    val again = Sampling.sampleToMix(df, "grp", col("id"),
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    assert(again.groupBy("grp").count().as[(String, Long)].collect().toMap == got)
  }

  test("sampleToMix: guards") {
    val df = spark.range(10).select(col("id"), lit("a").as("grp"))
    intercept[IllegalArgumentException](
      Sampling.sampleToMix(df, "grp", col("id"), Map.empty))
    intercept[IllegalArgumentException](
      Sampling.sampleToMix(df, "grp", col("id"), Map("a" -> -1.0)))
    intercept[IllegalArgumentException](
      Sampling.sampleToMix(df, "grp", col("id"), Map("absent" -> 1.0)))
  }

  test("temperatureMix: sqrt-tempered fractions, binding stratum keeps all") {
    // counts 6400/400: α=0.5 targets 80/20 → scale = min(6400/80, 400/20)
    // = 20 → fracs 80·20/6400 = 0.25 and 20·20/400 = 1.0 — the small
    // source keeps everything, the big one flattens toward it
    val df = spark.range(6800).select(col("id"),
      when(col("id") < 6400, "big").otherwise("small").as("src"))
    val kept = Sampling.temperatureMix(df, "src", col("id"), alpha = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 400, s"binding stratum must keep everything: $kept")
    // big keeps Bernoulli(0.25) of 6400: sd ≈ 35, allow 5 sd
    assert(math.abs(kept("big") - 1600) < 175, kept.toString)
    // α=1.0 degenerates to keep-everything (targets ∝ counts)
    val id1 = Sampling.temperatureMix(df, "src", col("id"), alpha = 1.0).count()
    assert(id1 == 6800)
    // only sqrt-composable alphas are portable
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(df, "src", col("id"), alpha = 0.7))
  }

  test("topFractionBy: exact per-stratum counts under a total order") {
    // 10 distinct scores per stratum: percent_rank = (rank-1)/9 <= 0.3
    // keeps ranks 1..3 exactly
    val df = spark.range(20).select(col("id"),
      (col("id") % 2).cast("string").as("grp"),
      (col("id") * 7 % 23).cast("double").as("score"))
    val got = Sampling.topFractionBy(df, "grp", 0.3,
      col("score").desc, col("id"))
    val counts = got.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts == Map("0" -> 3, "1" -> 3), s"got $counts")
    // and the kept rows are the actual top scores per stratum
    val top = df.as[(Long, String, Double)].collect().toSeq
      .groupBy(_._2).values.flatMap(rows =>
        rows.sortBy(r => (-r._3, r._1)).take(3)).map(_._1).toSet
    assert(got.select("id").as[Long].collect().toSet == top)
  }

  // driver-side replica of priorityColumn: md5 → first 13 hex → +1 → w/u
  private def prioRef(key: String, w: Long): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = digest.map(b => f"$b%02x").mkString
    val u = java.lang.Long.parseLong(hex.substring(0, 13), 16) + 1L
    w.toDouble / u.toDouble
  }

  test("prioritySample: top-k by weight/u matches driver-side brute force") {
    val rows = (0L until 500L).map(i => (i, (i % 7) * 100 + 1))
    val df = rows.toDF("id", "w")
    val got = Sampling.prioritySample(df, col("id"), col("w"), k = 50)
      .select("id").as[Long].collect().toSeq
    val expected = rows
      .map { case (id, w) => (id, prioRef(id.toString, w)) }
      .sortBy { case (id, p) => (-p, id) }.take(50).map(_._1)
    assert(got === expected)
    // deterministic: same call, same set, same order
    val again = Sampling.prioritySample(df, col("id"), col("w"), k = 50)
      .select("id").as[Long].collect().toSeq
    assert(again === got)
  }

  test("prioritySampleByStratum: per-stratum top-k, ranks dense from 1") {
    val rows = (0L until 300L).map(i => (i, s"s${i % 3}", i % 11 + 1))
    val df = rows.toDF("id", "grp", "w")
    val got = Sampling.prioritySampleByStratum(df, "grp", col("id"), col("w"), k = 5)
      .select("grp", "prio_rank", "id").as[(String, Long, Long)].collect()
    assert(got.length === 15)
    got.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to 5L), s"ranks in $g")
    }
    // matches the per-stratum brute force
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      rs.map { case (id, _, w) => (g, id, prioRef(id.toString, w)) }
        .sortBy { case (_, id, p) => (-p, id) }.take(5).map(t => (g, t._2))
    }.toSet
    assert(got.map(r => (r._1, r._3)).toSet === expected)
  }

  test("prioritySample: weight monotonicity — heavier duplicate key wins") {
    // same key hash, different weight: priority strictly scales with w
    assert(prioRef("42", 100L) > prioRef("42", 1L))
    // zero weight never beats a positive weight of the same key
    val df = Seq((1L, 0L), (2L, 5L)).toDF("id", "w")
    val got = Sampling.prioritySample(df, col("id"), col("w"), k = 1)
      .select("id").as[Long].collect()
    assert(got.toSeq === Seq(2L))
  }

  test("sampling is a scan-stage filter: no shuffle in the plan") {
    val plan = Sampling.stratifiedSample(
      ids.withColumn("grp", lit("a")), "grp", col("id"), Map("a" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("uniMaxBudgets: leveling, binding caps, and the lexicographic remainder") {
    // no cap binds: near-equal integer partition, remainder to 'a'
    val b1 = Sampling.uniMaxBudgets(Map("a" -> 5L, "b" -> 5L, "c" -> 5L), 10L, 1)
    assert(b1 === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // a tiny source binds at its cap, the rest re-level
    val b2 = Sampling.uniMaxBudgets(
      Map("s" -> 1L, "big" -> 100L, "mid" -> 50L), 30L, 2)
    assert(b2 === Map("s" -> 2L, "big" -> 14L, "mid" -> 14L))
    // budget above the total cap: everyone capped, leftover unassigned
    val b3 = Sampling.uniMaxBudgets(Map("a" -> 3L, "b" -> 4L), 100L, 2)
    assert(b3 === Map("a" -> 6L, "b" -> 8L))
    // invariants on a mixed case
    val counts = Map("w" -> 7L, "x" -> 19L, "y" -> 2L, "z" -> 401L)
    val b4 = Sampling.uniMaxBudgets(counts, 300L, 4)
    assert(b4.values.sum === math.min(300L,
      counts.values.map(_ * 4).sum))
    counts.foreach { case (s, n) => assert(b4(s) <= n * 4) }
    intercept[IllegalArgumentException](Sampling.uniMaxBudgets(Map.empty, 1L, 1))
    intercept[IllegalArgumentException](
      Sampling.uniMaxBudgets(Map("a" -> 1L), 1L, 0))
  }

  test("epochMix: full passes repeat every row, partial epoch is the md5 subset") {
    val docs = Seq(
      (1L, "a", "w w w"), (2L, "a", "w w"), (3L, "b", "w w w w w"))
      .toDF("id", "src", "text")
    val wc = size(split(trim(col("text")), "\\s+"))
    // token volumes a=5, b=5; budget 15, cap 2 epochs → caps 10/10,
    // share 7+remainder → a=8 (full 1, frac 3/5), b=7 (full 1, frac 2/5)
    val got = Sampling.epochMix(docs, "src", col("id"), wc, 15L, 2)
      .select(col("id"), col("src"), col("epoch"))
      .as[(Long, String, Long)].collect().toSeq.sorted
    val e1 = got.filter(_._3 == 1L).map(_._1)
    assert(e1 === Seq(1L, 2L, 3L), "every row gets the full pass")
    assert(got.forall(_._3 <= 2L), "the epoch cap holds")
    // partial-epoch membership replays the salted md5 threshold
    def inPartial(id: Long, frac: Double): Boolean =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$id:ep") <
        Sampling.hexThreshold(frac)
    val expect2 = Seq(1L -> 0.6, 2L -> 0.6, 3L -> 0.4)
      .collect { case (id, f) if inPartial(id, f) => id }
    assert(got.filter(_._3 == 2L).map(_._1) === expect2)
    // determinism
    val again = Sampling.epochMix(docs, "src", col("id"), wc, 15L, 2)
      .select(col("id"), col("src"), col("epoch"))
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(again === got)
  }

  test("cappedMix: head capped to K-proportional, tail kept whole") {
    // sizes a=10, b=4, c=2; cap 4 → targets 4/4/2, scale = min(10/4,
    // 4/4, 2/2) = 1 → frac a = 0.4, b = c = 1.0 (binding strata)
    val rows = (1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 14).map(i => (i.toLong, "b")) ++
      (15 to 16).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "s")
    val got = Sampling.cappedMix(df, "s", col("id"), cap = 4L)
      .as[(Long, String)].collect().toSet
    assert(got.filter(_._2 == "b").map(_._1) === Set(11L, 12L, 13L, 14L))
    assert(got.filter(_._2 == "c").map(_._1) === Set(15L, 16L))
    val expectA = (1 to 10).map(_.toLong).filter(i =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString) <
        Sampling.hexThreshold(0.4)).toSet
    assert(got.filter(_._2 == "a").map(_._1) === expectA)
    intercept[IllegalArgumentException](
      Sampling.cappedMix(df, "s", col("id"), cap = 0L))
  }

  test("epochMix: a budget at the total cap yields exact full epochs, no partial") {
    val docs = Seq(
      (1L, "a", "w w w"), (2L, "b", "w w"), (3L, null.asInstanceOf[String], "w"))
      .toDF("id", "src", "text")
    val wc = size(split(trim(col("text")), "\\s+"))
    // caps: a=9, b=6 at 3 epochs; budget 100 > 15 → both fully capped
    val got = Sampling.epochMix(docs, "src", col("id"), wc, 100L, 3)
      .select(col("id"), col("epoch")).as[(Long, Long)].collect().toSeq.sorted
    assert(got === Seq(1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 1L, 2L -> 2L,
      2L -> 3L).sorted, "capped strata repeat exactly maxEpochs; NULL stratum drops")
  }

  test("largestRemainderQuotas: hand-computed Hamilton allocation with tie order (r12)") {
    // 10 seats over 31 rows: ideal 10·n/31 = {a 2.58, b 3.23, c 4.19}
    // → floors {2, 3, 4} = 9, one seat left → largest remainder is a
    assert(Sampling.largestRemainderQuotas(
      Map("a" -> 8L, "b" -> 10L, "c" -> 13L), 10L) ===
      Map("a" -> 3L, "b" -> 3L, "c" -> 4L))
    // equal counts, equal remainders: ties resolve by stratum NAME, so
    // 7 seats over 3×5 give the extra to "a" (floor 2 each, one left)
    assert(Sampling.largestRemainderQuotas(
      Map("c" -> 5L, "a" -> 5L, "b" -> 5L), 7L) ===
      Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
    // exact-total invariant and boundaries
    assert(Sampling.largestRemainderQuotas(
      Map("a" -> 3L, "b" -> 4L), 7L).values.sum === 7L)
    assert(Sampling.largestRemainderQuotas(
      Map("a" -> 3L, "b" -> 4L), 0L).values.forall(_ == 0L))
    intercept[IllegalArgumentException](
      Sampling.largestRemainderQuotas(Map("a" -> 3L), 4L))
    intercept[IllegalArgumentException](
      Sampling.largestRemainderQuotas(Map.empty[String, Long], 0L))
  }

  test("property: Hamilton quotas satisfy the quota rule on random inputs (r12)") {
    // largest-remainder always lands every stratum inside
    // [floor(ideal), ceil(ideal)] and sums exactly to the total —
    // the no-seat-vanishes / no-stratum-robbed invariant pair
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 30) {
      val k = 1 + rnd.nextInt(9)
      val counts = (0 until k)
        .map(i => s"s$i" -> (1L + rnd.nextInt(1000))).toMap
      val n = counts.values.sum
      val total = rnd.nextLong(n + 1)
      val q = Sampling.largestRemainderQuotas(counts, total)
      assert(q.values.sum === total, s"trial $trial")
      counts.foreach { case (s, c) =>
        val lo = (BigInt(total) * c / n).toLong
        val ideal = BigInt(total) * c
        val hi = if (ideal % n == 0) lo else lo + 1
        assert(q(s) >= lo && q(s) <= hi,
          s"trial $trial stratum $s: quota ${q(s)} outside [$lo,$hi]")
      }
    }
  }

  test("largestRemainderSample: exact total, per-stratum quota, md5-order fill (r12)") {
    val df = spark.range(90)
      .select(col("id"), concat(lit("s"), col("id") % 3).as("grp"))
    val picked = Sampling.largestRemainderSample(df, "grp", col("id"), 25L)
      .as[(Long, String)].collect()
    assert(picked.length === 25)
    val byGrp = picked.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quotas = Sampling.largestRemainderQuotas(
      Map("s0" -> 30L, "s1" -> 30L, "s2" -> 30L), 25L)
    assert(byGrp.view.mapValues(_.size.toLong).toMap === quotas)
    // each stratum holds exactly its md5-order minimum quota ids
    def md5s(id: Long) = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(id.toString)
    (0L until 90L).groupBy(i => s"s${i % 3}").foreach { case (g, all) =>
      val want = all.sortBy(i => (md5s(i), i)).take(quotas(g).toInt).toSet
      assert(byGrp(g) === want, s"stratum $g")
    }
    // the rank window rewrites to the group-top-k shape
    val plan = Sampling.largestRemainderSample(df, "grp", col("id"), 25L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    // quota refinement is a broadcast join against the quota table,
    // not a stratum-count-linear CASE chain (r13)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CASE WHEN grp"), plan)
    // NULL stratum refused (its seats would silently vanish)
    val withNull = df.withColumn("grp",
      when(col("id") === 0, lit(null)).otherwise(col("grp")))
    intercept[IllegalArgumentException](
      Sampling.largestRemainderSample(withNull, "grp", col("id"), 5L))
  }

  test("largestRemainderSample: helper-column clash and empty-input edges are named errors (r13)") {
    val df = spark.range(10)
      .select(col("id"), concat(lit("s"), col("id") % 2).as("grp"))
    // a caller frame already carrying _lrq_rn used to be silently
    // REPLACED by the rank column and restored with rank values
    val clash = df.withColumn("_lrq_rn", lit(7L))
    val e = intercept[IllegalArgumentException](
      Sampling.largestRemainderSample(clash, "grp", col("id"), 5L))
    assert(e.getMessage.contains("_lrq_rn"))
    // empty input: total = 0 returns the empty frame; a positive total
    // is unfillable and must be a NAMED error, not max-of-empty
    val empty = df.filter(lit(false))
    assert(Sampling.largestRemainderSample(empty, "grp", col("id"), 0L)
      .count() === 0L)
    val e2 = intercept[IllegalArgumentException](
      Sampling.largestRemainderSample(empty, "grp", col("id"), 5L))
    assert(e2.getMessage.contains("empty input"))
  }

  test("stratifiedSample: broadcast-join lookup past the CASE limit ≡ the CASE path (r13)") {
    // 100 strata forces the join shape; the same fractions through a
    // ≤64-stratum call (two disjoint halves unioned) take the CASE
    // shape — both must pick the identical set
    val df = spark.range(2000)
      .select(col("id"), concat(lit("s"), col("id") % 100).as("grp"))
    val fracs = (0 until 100).map(i => s"s$i" -> (i % 7 + 1) / 10.0).toMap
    val joined = Sampling.stratifiedSample(df, "grp", col("id"), fracs)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val (loF, hiF) = fracs.partition(_._1.drop(1).toInt < 50)
    val viaCase = Sampling.stratifiedSample(df, "grp", col("id"), loF)
      .unionByName(Sampling.stratifiedSample(df, "grp", col("id"), hiF))
    assert(!viaCase.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(joined.select("id").as[Long].collect().sorted.toSeq ==
      viaCase.select("id").as[Long].collect().sorted.toSeq)
    // unlisted + NULL strata fall to defaultFrac on BOTH shapes
    val dfn = df.withColumn("grp",
      when(col("id") < 40, lit(null)).otherwise(col("grp")))
    val keptNull = Sampling.stratifiedSample(dfn, "grp", col("id"), fracs,
      defaultFrac = 1.0)
    assert(keptNull.filter(col("grp").isNull).count() === 40)
  }

  test("stratumLookup boundary: exactly 64 strata keeps the CASE shape, 65 switches to the join — same function either side (r13 ask #7)") {
    // the r13 fresh-eyes item: the shape flip at CaseBranchLimit must
    // be invisible in the sampled SET — both shapes are checked against
    // a driver-side md5 oracle, so a boundary off-by-one in EITHER
    // shape (not just a disagreement between them) fails
    for ((n, joinShape) <- Seq(64 -> false, 65 -> true)) {
      val df = spark.range(1300)
        .select(col("id"), concat(lit("s"), col("id") % n).as("grp"))
      val fracs = (0 until n).map(i => s"s$i" -> (i % 5 + 3) / 10.0).toMap
      val out = Sampling.stratifiedSample(df, "grp", col("id"), fracs)
      assert(out.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin") == joinShape,
        s"n=$n expected joinShape=$joinShape")
      val expected = (0L until 1300L).filter { id =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString) <
          Sampling.hexThreshold(fracs(s"s${id % n}"))
      }
      assert(out.select("id").as[Long].collect().sorted.toSeq == expected,
        s"n=$n sampled set diverges from the md5 oracle")
    }
  }

  test("epochMixFromCounts: join-shape lookup past the CASE limit ≡ CASE shape (r13)") {
    val df = spark.range(700)
      .select(col("id"), concat(lit("s"), col("id") % 70).as("grp"),
        lit(1L).as("w"))
    val counts = (0 until 70).map(i => s"s$i" -> 10L).toMap
    val viaJoin = Sampling.epochMixFromCounts(df, "grp", col("id"),
      counts, budget = 1500L, maxEpochs = 4)
    assert(viaJoin.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // driver-side oracle from the SAME budget allocation: full epochs
    // are budgets/count passes; the partial epoch keeps ids whose
    // md5(id:ep) clears the remainder-fraction threshold
    val budgets = Sampling.uniMaxBudgets(counts, 1500L, 4)
    def md5s(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val expected = (0L until 700L).flatMap { id =>
      val g = s"s${id % 70}"
      val full = budgets(g) / 10L
      val rem = budgets(g) % 10L
      val fullRows = (1L to full).map(e => (id, g, e))
      val partial =
        if (md5s(s"$id:ep") < Sampling.hexThreshold(rem.toDouble / 10.0))
          Seq((id, g, full + 1L))
        else Seq.empty
      fullRows ++ partial
    }
    val got = viaJoin.select("id", "grp", "epoch")
      .as[(Long, String, Long)].collect().toSeq
    assert(got.sorted == expected.sorted)
  }
}
