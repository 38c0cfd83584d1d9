package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The optimizer rule turns a naive theta range join into the bucketed
  * equi join without changing results.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite()
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRewrite])
  }

  private def fixture = {
    val ev = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_start"),
        (col("ts") + expr("INTERVAL 90 SECONDS")).as("p_end"))
    val pt = ev.select(col("event_id"), col("ts"))
    iv.join(pt, col("ts") >= col("p_start") && col("ts") < col("p_end"))
  }

  test("naive range join loses its nested loop and keeps its results") {
    val baseline = fixture.select("p_id", "event_id")
      .as[(Long, Long)].collect().toSet
    assert(fixture.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "fixture should BNLJ without the rule")

    withRule {
      val rewritten = fixture
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
      assert(!plan.contains("CartesianProduct"))
      val got = rewritten.select("p_id", "event_id").as[(Long, Long)].collect().toSet
      assert(got == baseline,
        s"rewrite changed results: missing=${(baseline -- got).take(5)} " +
          s"extra=${(got -- baseline).take(5)}")
      assert(got.nonEmpty)
    }
  }

  test("equi joins and non-range conditions are left alone") {
    withRule {
      val c = graft.Tables.load(spark, sfDir, "customer")
      val o = graft.Tables.load(spark, sfDir, "orders")
      // equi join: untouched (no Generate node appears)
      val equi = c.join(o, col("c_custkey") === col("o_custkey"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("_rj_bucket"))
      assert(equi.count() > 0)
      // single-bound range: not a closed interval, untouched
      val half = c.limit(10).select(col("c_acctbal").as("lo"))
        .join(o.limit(100), col("o_totalprice") >= col("lo"))
      assert(!half.queryExecution.optimizedPlan.toString.contains("_rj_bucket"))
    }
  }

  test("rule is injected by GraftExtensions") {
    val f = new graft.functions.GraftExtensions()
    val e = new org.apache.spark.sql.SparkSessionExtensions()
    f(e)
    val rules = org.apache.spark.sql.graftbridge.Bridge.optimizerRules(e, spark)
    assert(rules.exists(_.isInstanceOf[RangeJoinRewrite]),
      "GraftExtensions does not inject RangeJoinRewrite")
  }
}
