package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("decayedSumQuantized: hand-computed shifts anchored at newest event") {
    // newest event 2024-01-31 → ages 0, 1, 2, 30 days; S = 30
    val events = Seq(
      (1L, ts("2024-01-31 12:00:00"), 1.00),  // age 0  → 100 << 30
      (1L, ts("2024-01-30 12:00:00"), 2.00),  // age 1  → 200 << 29
      (1L, ts("2024-01-29 10:00:00"), 0.50),  // age 2  → 50  << 28
      (2L, ts("2024-01-01 12:00:00"), 9.99),  // age 30 → cut off
      (2L, ts("2024-01-02 00:00:00"), 4.00))  // age 29 → 400 << 1
      .toDF("user_id", "ts", "value")
    val got = Decay.decayedSumQuantized(events, "user_id", "ts", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val u1 = (100L << 30) + (200L << 29) + (50L << 28)
    assert(got === Seq((1L, 3L, u1), (2L, 1L, 400L << 1)))
  }

  test("decayedSumQuantized: halfLife steps the shift down in day blocks") {
    // halfLife 7: ages 0-6 → step 0, 7-13 → step 1; S = 30/7 = 4
    val events = Seq(
      (1L, ts("2024-01-15 00:00:00"), 1.00),  // age 0, step 0 → 100 << 4
      (1L, ts("2024-01-09 00:00:00"), 1.00),  // age 6, step 0 → 100 << 4
      (1L, ts("2024-01-08 00:00:00"), 1.00))  // age 7, step 1 → 100 << 3
      .toDF("user_id", "ts", "value")
    val got = Decay.decayedSumQuantized(events, "user_id", "ts", "value",
      maxAgeDays = 30, halfLifeDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3L, (100L << 4) * 2 + (100L << 3))))
  }

  test("decayedSumQuantized: NULL ts/value rows are excluded up front") {
    val events = Seq(
      (1L, Some(ts("2024-01-31 00:00:00")), Some(1.00)),
      (1L, None, Some(5.0)),
      (1L, Some(ts("2024-01-30 00:00:00")), None))
      .toDF("user_id", "ts", "value")
    val got = Decay.decayedSumQuantized(events, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 100L << 30)))
  }

  test("decayedSumQuantized: single hash agg, 1-row broadcast, no window") {
    val events = Seq((1L, ts("2024-01-31 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val plan = Decay.decayedSumQuantized(events, "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), "reference ts must broadcast")
  }
}
