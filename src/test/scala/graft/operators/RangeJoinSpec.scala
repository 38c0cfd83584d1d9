package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed range join ≡ the naive non-equi join, on a plan with no
  * nested-loop/cartesian node.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision fixture

  test("intervalJoin matches the naive theta join on real events") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_start"),
        (col("ts") + expr("INTERVAL 90 SECONDS")).as("p_end"))
    val pt = ev.select(col("event_id"), col("ts"))

    val got = RangeJoin.intervalJoin(iv, pt, "p_start", "p_end", "ts", "1 minute")
      .select("p_id", "event_id").as[(Long, Long)].collect().toSet
    val want = iv.join(pt, col("ts") >= col("p_start") && col("ts") < col("p_end"))
      .select("p_id", "event_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("boundary semantics: start inclusive, end exclusive, multi-bucket spans") {
    val w = 60000000L // 1 minute in µs
    // interval [2w, 5w) — spans buckets 2,3,4
    val iv = Seq((1L, 2 * w, 5 * w)).toDF("iv_id", "s_us", "e_us")
      .select(col("iv_id"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"))
    val pts = Seq(
      (10L, 2 * w),     // == start: in
      (11L, 5 * w - 1), // last µs before end: in
      (12L, 5 * w),     // == end: out (half-open)
      (13L, 2 * w - 1), // before start: out
      (14L, 3 * w)      // mid-span bucket boundary: in
    ).toDF("pt_id", "t_us")
      .select(col("pt_id"), timestamp_micros(col("t_us")).as("t"))
    val got = RangeJoin.intervalJoin(iv, pts, "s", "e", "t", "1 minute")
      .select("pt_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L, 14L))
  }

  test("empty and inverted intervals match nothing") {
    val iv = Seq((1L, 100L, 100L), (2L, 200L, 150L)).toDF("iv_id", "s_us", "e_us")
      .select(col("iv_id"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"))
    val pts = Seq((10L, 100L), (11L, 175L)).toDF("pt_id", "t_us")
      .select(col("pt_id"), timestamp_micros(col("t_us")).as("t"))
    assert(RangeJoin.intervalJoin(iv, pts, "s", "e", "t", "1 second").count() == 0)
  }

  test("bandJoin is symmetric and inclusive at the tolerance") {
    val left = Seq((1L, 1000000000L)).toDF("l_id", "l_us")
      .select(col("l_id"), timestamp_micros(col("l_us")).as("l_ts"))
    val right = Seq(
      (20L, 1000000000L - 30000000L), // exactly -tol: in
      (21L, 1000000000L + 30000000L), // exactly +tol: in
      (22L, 1000000000L + 30000001L), // 1 µs past: out
      (23L, 1000000000L - 30000001L)  // 1 µs before: out
    ).toDF("r_id", "r_us")
      .select(col("r_id"), timestamp_micros(col("r_us")).as("r_ts"))
    val got = RangeJoin.bandJoin(left, right, "l_ts", "r_ts", "30 seconds")
      .select("r_id").as[Long].collect().toSet
    assert(got == Set(20L, 21L))
  }

  test("intervalJoinLong matches a naive numeric range join") {
    val iv = (0L until 50L).map(i => (i, i * 7, i * 7 + 20)).toDF("iv_id", "s", "e")
    val pts = (0L until 300L).map(i => (i + 1000, i * 2)).toDF("pt_id", "p")
    val got = RangeJoin.intervalJoinLong(iv, pts, "s", "e", "p", 16L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    val want = iv.join(pts, col("p") >= col("s") && col("p") < col("e"))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("ntz semantics survive a DST session timezone (wall-clock mapping)") {
    // cast(ntz as timestamp) inverts order across a spring-forward gap;
    // the operator maps ntz via wall-clock micros instead, so it must
    // agree with the naive ntz comparison even in a DST zone.
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      // 2024-03-10 01:30–03:30 local: the 02:00–03:00 hour doesn't exist
      val iv = Seq((1L, "2024-03-10 01:45:00", "2024-03-10 03:15:00"))
        .toDF("iv_id", "s_str", "e_str")
        .select(col("iv_id"), col("s_str").cast("timestamp_ntz").as("s"),
          col("e_str").cast("timestamp_ntz").as("e"))
      val pts = Seq(
        (10L, "2024-03-10 01:50:00"), // in
        (11L, "2024-03-10 02:30:00"), // nonexistent local time, in by ntz order
        (12L, "2024-03-10 03:10:00"), // in
        (13L, "2024-03-10 03:20:00")  // out
      ).toDF("pt_id", "t_str")
        .select(col("pt_id"), col("t_str").cast("timestamp_ntz").as("t"))
      val got = RangeJoin.intervalJoin(iv, pts, "s", "e", "t", "30 minutes")
        .select("pt_id").as[Long].collect().toSet
      val want = iv.join(pts, col("t") >= col("s") && col("t") < col("e"))
        .select("pt_id").as[Long].collect().toSet
      assert(got == want && got == Set(10L, 11L, 12L))
    } finally spark.conf.set(tzKey, prev)
  }

  test("plan is a bucket equi-join: no nested loop, no cartesian product") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_start"),
        (col("ts") + expr("INTERVAL 60 SECONDS")).as("p_end"))
    val pt = ev.select(col("event_id"), col("ts"))
    val plan = RangeJoin.intervalJoin(iv, pt, "p_start", "p_end", "ts", "1 minute")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("width parser accepts fixed-length units and rejects the rest") {
    assert(RangeJoin.parseWidthMicros("1 minute") == 60000000L)
    assert(RangeJoin.parseWidthMicros("30 SECONDS") == 30000000L)
    assert(RangeJoin.parseWidthMicros("500 milliseconds") == 500000L)
    assert(RangeJoin.parseWidthMicros("2 days") == 172800000000L)
    intercept[IllegalArgumentException](RangeJoin.parseWidthMicros("1 month"))
    intercept[IllegalArgumentException](RangeJoin.parseWidthMicros("minute"))
  }

  test("inputs that already carry internal _rj_* columns are rejected") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val iv = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00")))
      .toDF("id", "s", "e")
    val pt = Seq((2L, ts("2024-01-01 10:00:30"))).toDF("pid", "p")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(iv.withColumn("_rj_s", lit(0L)), pt, "s", "e", "p")
    }
    assert(e1.getMessage.contains("_rj_s"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(iv, pt.withColumn("_rj_bucket", lit(0L)), "s", "e", "p")
    }
    assert(e2.getMessage.contains("_rj_bucket"))
    val e3 = intercept[IllegalArgumentException] {
      RangeJoin.bandJoin(iv.withColumn("_rj_band_e", lit(0L)), pt, "s", "p", "1 minute")
    }
    assert(e3.getMessage.contains("_rj_band_e"))
    val e4 = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoinLong(
        Seq((1L, 0L, 10L)).toDF("id", "lo", "hi").withColumn("_rj_bucket", lit(0L)),
        Seq((2L, 5L)).toDF("pid", "v"), "lo", "hi", "v", 10L)
    }
    assert(e4.getMessage.contains("_rj_bucket"))
  }
}
