package graft

import org.apache.spark.sql.functions._

/** A1 — direct `df.summary()` parity (the reference calls it at
  * Feature_Store_Telco_Churn_Sean_Original.py:32): the exact rows
  * (count/mean/min/max) must agree with exact aggregates; the
  * percentile rows are approximate by contract (SURVEY.md §5.3) and
  * only sanity-bounded here.
  */
class SummaryParitySpec extends SparkSpec {

  test("summary(): count/mean/min/max rows match exact aggregates") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"))
    val sm = li.summary().collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    val ex = li.agg(
      count(lit(1)), avg(col("l_quantity")), min(col("l_quantity")), max(col("l_quantity")),
      avg(col("l_extendedprice")), min(col("l_extendedprice")), max(col("l_extendedprice")),
      expr("percentile(l_quantity, 0.5)")).head()

    assert(sm("count")._1.toLong == ex.getLong(0))
    assert(sm("count")._2.toLong == ex.getLong(0))
    // summary() computes the same avg/min/max expressions — parsed
    // doubles must agree to the bit
    assert(sm("mean")._1.toDouble == ex.getDouble(1))
    assert(sm("min")._1.toDouble == ex.getDouble(2))
    assert(sm("max")._1.toDouble == ex.getDouble(3))
    assert(sm("mean")._2.toDouble == ex.getDouble(4))
    assert(sm("min")._2.toDouble == ex.getDouble(5))
    assert(sm("max")._2.toDouble == ex.getDouble(6))
    // approx median within 10% of the exact percentile
    val p50 = ex.getDouble(7)
    assert(math.abs(sm("50%")._1.toDouble - p50) <= 0.1 * math.max(1.0, math.abs(p50)))
    // full stat set present
    assert(sm.keySet == Set("count", "mean", "stddev", "min", "25%", "50%", "75%", "max"))
  }
}
