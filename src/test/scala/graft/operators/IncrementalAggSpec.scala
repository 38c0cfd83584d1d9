package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("cnt"), col("sm").cast("string"),
        col("mn"), col("mx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1).toSeq

  private val keys = Seq("k")

  test("merge(build(base), delta) == build(base ∪ delta) on an arbitrary split") {
    val all = Seq(
      ("a", 1.25), ("a", -2.50), ("a", 7.00),
      ("b", 0.75), ("b", 0.75),
      ("c", -1.00)).toDF("k", "v")
    val base = all.filter(col("v") >= 0)
    val delta = all.filter(col("v") < 0) // drops key-c entirely from base
    val merged = IncrementalAgg.merge(
      IncrementalAgg.build(base, keys, "v"), delta, keys, "v")
    assert(rows(merged) == rows(IncrementalAgg.build(all, keys, "v")))
  }

  test("delta-only keys appear; base-only keys survive untouched") {
    val base = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    val delta = Seq(("z", 5.0)).toDF("k", "v")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.build(base, keys, "v"), delta, keys, "v")
    val got = rows(merged)
    assert(got.map(_._1) == Seq("a", "z"))
    assert(got(0)._2 == 2L && got(0)._4 == 1.0 && got(0)._5 == 2.0)
    assert(got(1)._2 == 1L && got(1)._4 == 5.0 && got(1)._5 == 5.0)
  }

  test("empty delta is a no-op") {
    val base = Seq(("a", 1.0), ("b", -3.0)).toDF("k", "v")
    val state = IncrementalAgg.build(base, keys, "v")
    val merged = IncrementalAgg.merge(state, base.limit(0), keys, "v")
    assert(rows(merged) == rows(state))
  }

  test("repeated folds accumulate exactly (three batches == one)") {
    val b1 = Seq(("a", 0.10), ("b", 9.99)).toDF("k", "v")
    val b2 = Seq(("a", 0.20)).toDF("k", "v")
    val b3 = Seq(("a", 0.30), ("c", -0.01)).toDF("k", "v")
    val folded = Seq(b2, b3).foldLeft(IncrementalAgg.build(b1, keys, "v")) {
      (st, d) => IncrementalAgg.merge(st, d, keys, "v")
    }
    val full = IncrementalAgg.build(b1.union(b2).union(b3), keys, "v")
    assert(rows(folded) == rows(full))
    // exactness: decimal state, no double drift — 0.10+0.20+0.30 is 0.60
    assert(rows(folded).find(_._1 == "a").get._3 == "0.60")
  }

  test("property: merge(build(base), delta) == build(all) for random data and splits") {
    import org.scalacheck.{Gen, rng}
    // values at 2-decimal granularity: the state sum is DECIMAL(38,2),
    // so inputs must be representable or build(all) disagrees trivially
    val rowsGen = Gen.listOfN(40,
      Gen.zip(Gen.oneOf("a", "b", "c", "d"),
        Gen.choose(-10000L, 10000L).map(_ / 100.0)))
    val params = Gen.Parameters.default
    for (i <- 0 until 8) {
      val data = rowsGen(params, rng.Seed(7L + i)).getOrElse(Nil)
      if (data.nonEmpty) {
        val all = data.toDF("k", "v")
        val cut = data(i % data.size)._2
        val base = all.filter(col("v") <= cut)
        val delta = all.filter(col("v") > cut)
        val merged = IncrementalAgg.merge(
          IncrementalAgg.build(base, keys, "v"), delta, keys, "v")
        assert(rows(merged) == rows(IncrementalAgg.build(all, keys, "v")),
          s"case $i split at $cut")
      }
    }
  }

  test("merge rejects a state frame that did not come from build") {
    val bogus = Seq(("a", 1L)).toDF("k", "cnt")
    val delta = Seq(("a", 1.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.merge(bogus, delta, keys, "v")
    }
    assert(e.getMessage.contains("cnt/sm/mn/mx"))
  }
}
