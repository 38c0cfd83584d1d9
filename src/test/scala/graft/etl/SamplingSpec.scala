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

  test("sampling is a scan-stage filter: no shuffle in the plan") {
    val plan = Sampling.stratifiedSample(
      ids.withColumn("grp", lit("a")), "grp", col("id"), Map("a" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}
