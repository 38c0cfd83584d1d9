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

  test("BETWEEN (closed interval) rewrites too, boundary inclusive") {
    withRule {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      val iv = Seq(
        (1L, t("2024-01-01 10:00:00"), t("2024-01-01 10:02:00")),
        (2L, t("2024-01-01 10:05:00"), t("2024-01-01 10:05:00")) // degenerate [x, x]
      ).toDF("iv_id", "s", "e")
      val pts = Seq(
        (10L, t("2024-01-01 10:02:00")), // == e of iv 1: in (closed)
        (11L, t("2024-01-01 10:05:00")), // == both bounds of iv 2: in
        (12L, t("2024-01-01 10:02:01"))  // past e: out
      ).toDF("pt_id", "p")
      val joined = iv.join(pts, col("p").between(col("s"), col("e")))
      assert(!joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      val got = joined.select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 11L)))
    }
  }

  test("empty and inverted intervals match nothing instead of throwing") {
    withRule {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      val iv = Seq(
        (1L, t("2024-01-01 10:00:00"), t("2024-01-01 10:00:00")), // empty
        (2L, t("2024-01-01 12:00:00"), t("2024-01-01 11:00:00")), // inverted
        (3L, t("2024-01-01 10:00:00"), t("2024-01-01 10:02:00"))  // real
      ).toDF("iv_id", "s", "e")
      val pts = Seq((10L, t("2024-01-01 10:01:00"))).toDF("pt_id", "p")
      val joined = iv.join(pts, col("p") >= col("s") && col("p") < col("e"))
      assert(!joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      // Sequence(start > stop) would throw here without the guard
      assert(joined.select("iv_id").as[Long].collect().toSeq == Seq(3L))
    }
  }

  test("long-typed ranges are left to the explicit operator") {
    withRule {
      val iv = Seq((1L, 0L, 100L)).toDF("iv_id", "lo", "hi")
      val pts = Seq((10L, 50L)).toDF("pt_id", "v")
      val joined = iv.join(pts, col("v") >= col("lo") && col("v") < col("hi"))
      // no rewrite: a fixed micros width is meaningless on an id domain
      assert(!joined.queryExecution.optimizedPlan.toString.contains("_rj_bucket"))
      assert(joined.count() == 1)
    }
  }

  test("long intervals take the sentinel bucket instead of exploding") {
    withRule {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      val key = "spark.graft.rangejoin.max.buckets"
      try {
        spark.conf.set(key, "4") // 10-min interval at 1-min width = 10 buckets > 4
        val iv = Seq(
          (1L, t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00")), // long → sentinel
          (2L, t("2024-01-01 12:00:00"), t("2024-01-01 12:02:00"))  // short → buckets
        ).toDF("iv_id", "s", "e")
        val pts = Seq(
          (10L, t("2024-01-01 10:07:30")), // inside the long interval
          (11L, t("2024-01-01 12:01:00")), // inside the short interval
          (12L, t("2024-01-01 11:00:00"))  // inside neither
        ).toDF("pt_id", "p")
        val joined = iv.join(pts, col("p") >= col("s") && col("p") < col("e"))
        val plan = joined.queryExecution.optimizedPlan.toString
        assert(!joined.queryExecution.executedPlan.toString
          .contains("BroadcastNestedLoopJoin"), "rule did not fire")
        assert(plan.contains(Long.MinValue.toString),
          s"sentinel bucket missing from plan:\n$plan")
        // each pair meets exactly once: collect a Seq, not a Set
        val got = joined.select("iv_id", "pt_id").as[(Long, Long)].collect().toSeq.sorted
        assert(got == Seq((1L, 10L), (2L, 11L)))
      } finally spark.conf.unset(key)
    }
  }

  test("bucket width knob is read from the session conf") {
    withRule {
      val key = "spark.graft.rangejoin.bucket.micros"
      try {
        spark.conf.set(key, "3600000000") // 1 hour
        val plan = fixture.queryExecution.optimizedPlan.toString
        assert(plan.contains("3600000000"), s"conf width not used:\n$plan")
      } finally spark.conf.unset(key)
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

  test("timestamp band abs(a-b) <= interval rewrites and keeps results") {
    val ev = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val a = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = ev.select(col("event_id").as("b_id"), col("ts").as("b_ts"))
    def banded = a.join(b,
      abs(col("a_ts") - col("b_ts")) <= expr("INTERVAL 45 SECONDS") &&
        col("a_id") =!= col("b_id"))
    val baseline = banded.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(banded.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "fixture should BNLJ without the rule")
    withRule {
      val plan = banded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"band rule did not fire:\n$plan")
      // each pair must meet exactly once — Seq length equals Set size
      val rows = banded.select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.toSet.size, "a pair met more than once")
      assert(rows.toSet == baseline && baseline.nonEmpty)
    }
  }

  test("integral band rewrites (tolerance is the width); boundaries exact") {
    withRule {
      val a = Seq((1L, -7L), (2L, 0L), (3L, 100L)).toDF("a_id", "x")
      val b = Seq((10L, -12L), (11L, -2L), (12L, 4L), (13L, 106L), (14L, 107L))
        .toDF("b_id", "y")
      val leq = a.join(b, abs(col("x") - col("y")) <= lit(5L))
      assert(!leq.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
        "integral band did not rewrite")
      val got = leq.select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      // |-7-(-12)|=5 in, |-7-(-2)|=5 in, |0-(-2)|=2, |0-4|=4, |100-106|=6 out, 105? (none)
      assert(got == Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L)), s"got $got")
      // strict < excludes the |diff| == 5 boundary pairs
      val lt = a.join(b, abs(col("x") - col("y")) < lit(5L))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(lt == Seq((2L, 11L), (2L, 12L)), s"got $lt")
      // tol 0: exact equality only (w clamps to 1)
      val zero = a.join(b, abs(col("x") - col("y")) <= lit(0L))
        .select("a_id").as[Long].collect().toSeq
      assert(zero.isEmpty)
    }
  }

  test("band fires even when an unrewritable long-typed range shape coexists") {
    withRule {
      // the range PATTERN matches (v >= lo AND v < hi) but yields no
      // rewrite on longs; the band conjunct must still fire
      val a = Seq((1L, 0L, 100L, 10L)).toDF("a_id", "lo", "hi", "x")
      val b = Seq((10L, 50L, 12L), (11L, 99L, 30L)).toDF("b_id", "v", "y")
      val joined = a.join(b,
        col("v") >= col("lo") && col("v") < col("hi") &&
          abs(col("x") - col("y")) <= lit(5L))
      assert(!joined.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "band did not fire next to a dead range shape")
      val got = joined.select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 10L)), s"got $got")
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
