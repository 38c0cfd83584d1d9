package graft

import org.apache.spark.sql.functions._

/** Sketch aggregations' accuracy contract vs the exact values (the
  * gate entry q58 is rows-only because sketch estimates are
  * engine-specific; the error bound is the testable contract).
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within HLL++ error of the exact distinct") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey")).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      // default rsd = 5%; 3 sigma margin
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"HLL estimate $approx too far from exact $exact")
    }
  }

  test("percentile_approx brackets the exact percentile") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val r = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"),
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi")).collect()(0)
    val (approx, exact, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // accuracy 10000 → rank error ≤ n/10000; on this data that is a
    // tight value band around the true median
    assert(approx >= lo && approx <= hi)
    assert(math.abs(approx - exact) / (hi - lo) <= 0.02,
      s"approx median $approx too far from exact $exact (domain [$lo,$hi])")
  }
}
