package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Recency-weighted (exponentially decayed) aggregates —
  * the feature-store staple "recent behavior counts more": each event
  * contributes value·2^(−age/halfLife), so a user's feature refreshes
  * toward recent activity without storing per-event state. The
  * reference's order features (FS:168-210) are plain lifetime sums;
  * this is their time-aware upgrade.
  *
  * Exactness contract (§5.3): the decay weight is a POWER OF TWO on
  * integer day steps — weight = 2^(S−step) with step = age_days div
  * halfLifeDays and S the step count at the cutoff — so the weighted
  * sum is exact BIGINT arithmetic (a shift, not a float pow) and
  * replays hash-for-hash in any engine. Events older than
  * `maxAgeDays` weigh zero (the cutoff also bounds the shift, hence
  * the magnitude: caller guarantees Σ v_q·2^S < 2^63 via valueScale).
  * The reported `decayed_q` is fixed-point: divide by
  * valueScale·2^S for the real-valued decayed sum.
  *
  * Scale shape: the reference timestamp is a 1-row max aggregate
  * broadcast-crossed back (the lazy corpus-constant pattern); age,
  * step, and the shifted contribution all fold into the scan
  * projection; ONE hash aggregate on the key ends the plan. No
  * window, no sort, no per-event state.
  */
object Decay {

  /** Per-key decayed sum anchored at the newest event in `df`.
    * Output: (keyCol, n_events, decayed_q) — n_events counts only
    * in-window (age < maxAgeDays) events.
    */
  def decayedSumQuantized(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, maxAgeDays: Int = 30, halfLifeDays: Int = 1,
      valueScale: Double = 100.0): DataFrame = {
    require(maxAgeDays >= 1, s"decayedSumQuantized: maxAgeDays >= 1, got $maxAgeDays")
    require(halfLifeDays >= 1, s"decayedSumQuantized: halfLifeDays >= 1, got $halfLifeDays")
    val s = maxAgeDays / halfLifeDays
    require(s <= 62, s"decayedSumQuantized: 2^$s overflows BIGINT")
    // exact integer division for non-negative operands: subtracting
    // the remainder makes the double division exact
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val dayUs = lit(86400000000L)
    val events = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol),
        unix_micros(col(tsCol).cast("timestamp")).as("_us"),
        floor(col(valueCol) * lit(valueScale) + lit(0.5)).cast("long").as("_vq"))
    val ref = events.agg(max(col("_us")).as("_ref"))
    val age = idiv(col("_ref") - col("_us"), dayUs)
    val step = idiv(age, lit(halfLifeDays.toLong))
    // variable shift distance: the Scala `shiftleft` helper only takes
    // a literal Int, but the underlying ShiftLeft expression is
    // column-column — build it via the bridge
    val shift = org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.graftbridge.Bridge.expression(lit(1L)),
        org.apache.spark.sql.graftbridge.Bridge.expression(
          (lit(s.toLong) - step).cast("int"))))
    events.crossJoin(broadcast(ref))
      .filter(age < lit(maxAgeDays.toLong))
      .select(col(keyCol), (col("_vq") * shift).as("_wv"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("_wv")).as("decayed_q"))
  }

  /** Per-(key, calendar-day) quantized value sums — the MERGEABLE
    * state behind the day-bucketed decay tier: unlike pre-decayed
    * weights (which would re-anchor every batch — the frozen-grid
    * trap in reverse), raw daily sums merge exactly across
    * micro-batches and the decay applies at READ time against any
    * anchor. Streaming maintenance:
    * `StreamingFeatures.maintainDailyValueSums`.
    */
  def dailySums(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, valueScale: Double = 100.0): DataFrame =
    df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol),
        unix_micros(date_trunc("day", col(tsCol).cast("timestamp")))
          .as("day_us"),
        floor(col(valueCol) * lit(valueScale) + lit(0.5)).cast("long").as("_vq"))
      .groupBy(col(keyCol), col("day_us"))
      .agg(count(lit(1)).as("n_events"), sum(col("_vq")).as("sum_vq"))

  /** Decayed per-key score from a (key, day_us, n_events, sum_vq)
    * frame ([[dailySums]] or its maintained streaming state), anchored
    * at the newest day present: weight 2^(−day_age/halfLife), same
    * exact shift arithmetic as [[decayedSumQuantized]], applied to
    * day-level sums. Output: (keyCol, n_events, decayed_q).
    */
  def decayedFromDailySums(daily: DataFrame, keyCol: String,
      maxAgeDays: Int = 30, halfLifeDays: Int = 1): DataFrame = {
    require(maxAgeDays >= 1, s"decayedFromDailySums: maxAgeDays >= 1, got $maxAgeDays")
    require(halfLifeDays >= 1, s"decayedFromDailySums: halfLifeDays >= 1, got $halfLifeDays")
    val s = maxAgeDays / halfLifeDays
    require(s <= 62, s"decayedFromDailySums: 2^$s overflows BIGINT")
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val dayUs = lit(86400000000L)
    val ref = daily.agg(max(col("day_us")).as("_ref"))
    val age = idiv(col("_ref") - col("day_us"), dayUs)
    val step = idiv(age, lit(halfLifeDays.toLong))
    val shift = org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.graftbridge.Bridge.expression(lit(1L)),
        org.apache.spark.sql.graftbridge.Bridge.expression(
          (lit(s.toLong) - step).cast("int"))))
    daily.crossJoin(broadcast(ref))
      .filter(age < lit(maxAgeDays.toLong))
      .select(col(keyCol), col("n_events"), (col("sum_vq") * shift).as("_wv"))
      .groupBy(col(keyCol))
      .agg(sum(col("n_events")).as("n_events"), sum(col("_wv")).as("decayed_q"))
  }

  /** Day-bucketed decayed sum, batch formulation — the read-side twin
    * of the maintained daily state (stream≡batch parity in
    * StreamingFeaturesSpec). Differs from [[decayedSumQuantized]] only
    * in granularity: ages count CALENDAR-day buckets from the newest
    * bucket, not event-timestamp day spans.
    */
  def decayedDailySumQuantized(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, maxAgeDays: Int = 30, halfLifeDays: Int = 1,
      valueScale: Double = 100.0): DataFrame =
    decayedFromDailySums(dailySums(df, keyCol, tsCol, valueCol, valueScale),
      keyCol, maxAgeDays, halfLifeDays)
}
