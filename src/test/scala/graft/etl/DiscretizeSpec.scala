package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiscretizeSpec extends SparkSpec {
  import spark.implicits._

  test("quartile bins: edges from exact percentiles, ties go up") {
    // values 1..8: quartile edges (linear interpolation) = 2.75, 4.5, 6.25
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val bins = Discretize.withQuantileBins(df, "v", 4)
      .orderBy("v").collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(bins.toSeq == Seq(
      1.0 -> 0, 2.0 -> 0, 3.0 -> 1, 4.0 -> 1,
      5.0 -> 2, 6.0 -> 2, 7.0 -> 3, 8.0 -> 3))
  }

  test("a value equal to an edge lands in the upper bin") {
    // constant column: every edge equals the value → bin = nBins-1
    val df = Seq(5.0, 5.0, 5.0, 5.0).toDF("v")
    val bins = Discretize.withQuantileBins(df, "v", 4)
      .select("bin").collect().map(_.getInt(0)).toSet
    assert(bins == Set(3))
  }

  test("bins partition the data roughly evenly on distinct values") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val counts = Discretize.withQuantileBins(df, "v", 10)
      .groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 to 9).toSet)
    assert(counts.values.forall(c => c >= 99 && c <= 101), counts.toString)
  }

  test("NULL values get NULL bins, not bin 0") {
    // HOF filter drops elements on a NULL predicate, so without the
    // explicit guard size(filter(...)) is 0 and NULL lands in the
    // lowest decile
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None)
      .toDF("v")
    val got = Discretize.withQuantileBins(df, "v", 4)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0))) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got(None) == None)
    assert(got(Some(1.0)) == Some(0)) // non-null rows still bin normally
    assert(got(Some(4.0)) == Some(3))
  }

  test("guards: nBins < 2 and existing out column are named errors") {
    val df = Seq(1.0).toDF("v")
    assert(intercept[IllegalArgumentException] {
      Discretize.withQuantileBins(df, "v", 1)
    }.getMessage.contains("nBins"))
    assert(intercept[IllegalArgumentException] {
      Discretize.withQuantileBins(df.withColumn("bin", lit(0)), "v", 4)
    }.getMessage.contains("already exists"))
  }

  test("construction is lazy: no job until an action") {
    val planned = Discretize.withQuantileBins(
      graft.Tables.load(spark, sfDir, "orders"), "o_totalprice", 10)
    // the plan exists without having run the percentile aggregate;
    // explain would throw on an invalid plan
    assert(planned.queryExecution.logical != null)
  }

  test("ensembleQuantileScore: bin sum matches per-signal bins; NULL poisons") {
    // two signals pulling in OPPOSITE directions — the ensemble must
    // agree with the sum of the independently fitted per-signal bins
    val df = Seq(
      (1L, 10.0, 0.9), (2L, 20.0, 0.7), (3L, 30.0, 0.5), (4L, 40.0, 0.3))
      .toDF("id", "a", "b")
    val got = Discretize.ensembleQuantileScore(df, Seq("a", "b"), nBins = 4)
      .select("id", "ensemble_q").as[(Long, Long)].collect().toMap
    val binsA = Discretize.withQuantileBins(df, "a", 4, "ba")
      .select("id", "ba").as[(Long, Int)].collect().toMap
    val binsB = Discretize.withQuantileBins(df, "b", 4, "bb")
      .select("id", "bb").as[(Long, Int)].collect().toMap
    df.select("id").as[Long].collect().foreach { id =>
      assert(got(id) === binsA(id).toLong + binsB(id).toLong, s"id $id")
    }
    // opposite monotonicity really fused: neither signal's own order
    assert(got.values.toSet.size < 4 || got(1L) != got.values.max)
    // a NULL in any signal yields a NULL ensemble; other rows unaffected
    val withNull = Seq(
      (1L, Some(10.0), Some(0.9)), (2L, None, Some(0.7)),
      (3L, Some(30.0), Some(0.5)))
      .toDF("id", "a", "b")
    val gotN = Discretize.ensembleQuantileScore(withNull, Seq("a", "b"), 4)
      .select("id", "ensemble_q").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(gotN(2L).isEmpty && gotN(1L).nonEmpty && gotN(3L).nonEmpty)
    // guards
    assert(intercept[IllegalArgumentException] {
      Discretize.ensembleQuantileScore(df, Seq.empty, 4)
    }.getMessage.contains("signal"))
    assert(intercept[IllegalArgumentException] {
      Discretize.ensembleQuantileScore(
        df.withColumn("ensemble_q", lit(0)), Seq("a"), 4)
    }.getMessage.contains("already exists"))
  }
}
