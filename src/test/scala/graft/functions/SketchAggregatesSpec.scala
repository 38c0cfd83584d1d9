package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate is exact below k and within bounds above k") {
    // exact regime: 100 distinct < k=256
    val small = spark.range(1000).select((col("id") % 100).as("v"))
    val exactSmall = small.agg(
      SketchAggregates.kmvDistinct(col("v"), 256).as("est")).as[Long].collect()(0)
    assert(exactSmall == 100L)

    // estimate regime: 60k distinct >> k=256; KMV rse ≈ 1/sqrt(k-2) ≈ 6.3%
    val big = spark.range(60000).select(col("id").as("v")).repartition(8)
    val est = big.agg(
      SketchAggregates.kmvDistinct(col("v"), 256).as("est")).as[Long].collect()(0)
    assert(math.abs(est - 60000.0) / 60000.0 < 0.25, s"KMV estimate $est too far from 60000")
  }

  test("merge is partition-independent: same estimate for any layout") {
    val data = spark.range(30000).select((col("id") * 7919 % 50021).as("v"))
    def estWith(parts: Int): Long =
      data.repartition(parts).agg(
        SketchAggregates.kmvDistinct(col("v"), 128).as("est")).as[Long].collect()(0)
    // the k smallest hashes of a fixed value set are layout-invariant,
    // so partial-agg + merge must give bit-identical results
    assert(estWith(1) == estWith(2) && estWith(2) == estWith(16))
  }

  test("works per-group and over strings; NULLs ignored") {
    val df = Seq(
      ("a", Some("x")), ("a", Some("y")), ("a", None), ("a", Some("x")),
      ("b", Some("z"))).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(SketchAggregates.kmvDistinct(col("v"), 64).as("est"))
      .orderBy("g").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
  }

  test("SQL registration: graft_kmv_distinct usable from spark.sql") {
    GraftFunctions.register(spark)
    spark.range(500).select((col("id") % 37).as("v"))
      .createOrReplaceTempView("kmv_probe")
    val est = spark.sql("SELECT graft_kmv_distinct(v, 64) FROM kmv_probe")
      .as[Long].collect()(0)
    assert(est == 37L)
  }

  test("estimates agree with exact distinct on the documents corpus") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val r = docs.agg(
      SketchAggregates.kmvDistinct(col("text"), 256).as("est"),
      countDistinct(col("text")).as("exact")).collect()(0)
    val (est, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(est - exact) / exact < 0.25, s"KMV $est vs exact $exact")
  }
}
