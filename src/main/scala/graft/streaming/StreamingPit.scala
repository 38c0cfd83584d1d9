package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [extension] Streaming point-in-time (as-of) feature join — the
  * streaming counterpart of `graft.fs.PointInTime.asOfJoin`: each spine
  * event (key, ts) is joined to the LATEST feature version with
  * feature-ts ≤ ts, with event-time correctness under out-of-order
  * arrival on BOTH streams.
  *
  * Construction: union the two streams with an origin tag (the same
  * trick the batch operator plays), group by key, and run ONE
  * `flatMapGroupsWithState`:
  *
  *   - feature rows land in per-key state (a version list);
  *   - spine probes BUFFER in state and emit only once the watermark
  *     passes their event time — at that point every feature version
  *     at-or-before the probe has arrived (the watermark contract), so
  *     the lookup is exact, not best-effort;
  *   - an event-time timeout set to the earliest buffered probe
  *     guarantees emission even when no further input reaches the key
  *     (Spark's no-data final micro-batch fires it);
  *   - feature versions strictly older than the newest version at-or-
  *     below the emission horizon are pruned — per key the state is
  *     O(pending probes + recent feature versions), watermark-bounded;
  *   - probe-quiescent keys retire entirely `featureRetention` after
  *     their newest feature version (one-shot event-time timeout), so
  *     TOTAL state is bounded by recently-active keys, not lifetime
  *     key cardinality.
  *
  * Late data past the watermark is dropped by the watermark operator
  * itself, identical to every other stateful streaming operator here.
  * Emission latency equals the watermark delay — the price of
  * exactness; set a shorter delay for fresher-but-riskier output.
  */
object StreamingPit extends Serializable {

  case class PitInput(user_id: Long, ts: Timestamp, origin: Int,
      probe_id: Long, value: Double)
  case class PitState(
      features: List[(Long, Double)],        // (tsUs, value), newest first
      probes: List[(Long, Long)])            // (tsUs, probe_id)
  case class PitJoined(probe_id: Long, user_id: Long, ts_us: Long,
      feature_ts_us: Option[Long], feature_value: Option[Double])

  /** `spine` needs (`keyCol`, `tsCol`, `idCol`); `features` needs
    * (`keyCol`, `featTsCol`, `valueCol`). Both must be streaming
    * frames. Output: one row per spine probe whose event time the
    * watermark has passed, with the as-of feature attached (None if no
    * version precedes it — the batch operator's NULL contract).
    *
    * `featureRetention = "forever"` (or null) disables the
    * probe-quiescent retirement entirely: state for a key then lives as
    * long as the query, and a probe arriving arbitrarily late (in event
    * time) after the key's newest feature version still sees the
    * stale-but-correct value — exact batch/`PointInTime` parity, at the
    * cost of state growing with lifetime key cardinality.
    */
  def asOfJoin(
      spine: DataFrame,
      features: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      featTsCol: String = "feat_ts",
      valueCol: String = "value",
      watermarkDelay: String = "10 minutes",
      featureRetention: String = "7 days"): Dataset[PitJoined] = {
    val spark = spine.sparkSession
    import spark.implicits._
    // state TTL for probe-quiescent keys (Flink-state-TTL semantics):
    // a key with no pending probes keeps its feature state only until
    // `featureRetention` past its newest feature version, then a
    // ONE-SHOT event-time timeout drops it. Without this, total state
    // grows with key cardinality forever — every key that stops
    // receiving probes parks its pruned-but-nonempty version list.
    // The trade: a probe arriving later than retention after the key's
    // last feature update sees feature=None. Per-arrival probe keys are
    // unaffected (pending probes always extend the state's life).
    // "forever"/null opts out — batch-parity semantics, unbounded state.
    val retentionUsOpt: Option[Long] =
      Option(featureRetention).filterNot(_.equalsIgnoreCase("forever"))
        .map(graft.operators.RangeJoin.parseWidthMicros)

    // tag and union: one stateful operator sees both streams. Each
    // stream is watermarked BEFORE the union, so Spark tracks the two
    // event-time clocks separately and the operator sees their MIN
    // (default multipleWatermarkPolicy): a fast spine cannot advance
    // the watermark past a lagging feature stream and silently drop
    // on-time feature versions — that would break the exactness
    // guarantee. NULL keys/timestamps/ids are dropped up front (the
    // deserializer would crash on them; the batch operator groups them
    // meaninglessly).
    val probes = spine.select(
      col(keyCol).cast("long").as("user_id"),
      col(tsCol).cast("timestamp").as("ts"),
      lit(1).as("origin"),
      col(idCol).cast("long").as("probe_id"),
      lit(0.0).as("value"))
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("probe_id").isNotNull)
      .withWatermark("ts", watermarkDelay)
    val feats = features.select(
      col(keyCol).cast("long").as("user_id"),
      col(featTsCol).cast("timestamp").as("ts"),
      lit(0).as("origin"),
      lit(0L).as("probe_id"),
      col(valueCol).cast("double").as("value"))
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
    val unioned = probes.unionByName(feats).as[PitInput]

    import EventTime.toUs

    // single O(F) pass: newest (ts, value) with ts <= probe ts
    def lookup(features: List[(Long, Double)], tsUs: Long): (Option[Long], Option[Double]) =
      features.foldLeft((Option.empty[Long], Option.empty[Double])) {
        case (best @ (Some(bts), _), (fts, _)) if fts <= tsUs && fts <= bts => best
        case (best, (fts, v)) if fts <= tsUs => (Some(fts), Some(v))
        case (best, _) => best
      }

    def fn(key: Long, it: Iterator[PitInput],
        state: GroupState[PitState]): Iterator[PitJoined] = {
      var st = state.getOption.getOrElse(PitState(Nil, Nil))
      for (r <- it) {
        if (r.origin == 0) st = st.copy(features = (toUs(r.ts), r.value) :: st.features)
        else st = st.copy(probes = (toUs(r.ts), r.probe_id) :: st.probes)
      }
      val wm = state.getCurrentWatermarkMs() * 1000 // ms → µs horizon
      // exact emission: the watermark guarantees every feature version
      // ≤ the probe's ts has been folded into state
      val (ready, pending) = st.probes.partition(_._1 <= wm)
      val out = ready.sortBy(p => (p._1, p._2)).map { case (tsUs, id) =>
        val (fts, v) = lookup(st.features, tsUs)
        PitJoined(id, key, tsUs, fts, v)
      }
      // prune feature versions strictly older than the newest at-or-
      // below the watermark: every pending (and future, on-time) probe
      // has ts > wm, so the newest version ≤ wm is the lookup floor no
      // later probe can need to look past
      val floor = st.features.foldLeft(Option.empty[Long]) {
        case (acc, (fts, _)) if fts <= wm && acc.forall(fts > _) => Some(fts)
        case (acc, _) => acc
      }
      val kept = floor match {
        case Some(f) => st.features.filter(_._1 >= f)
        case None    => st.features
      }
      if (pending.nonEmpty) {
        state.update(PitState(kept, pending))
        // wake at the earliest pending probe's ts (µs → ms, rounded UP
        // so the timeout is never at or below the current watermark)
        state.setTimeoutTimestamp((pending.map(_._1).min + 999) / 1000 + 1)
      } else if (kept.isEmpty) state.remove()
      else retentionUsOpt match {
        case Some(retentionUs) =>
          // feature-only key: retire the state once the watermark passes
          // newest-version + retention. A ONE-SHOT timeout at that event
          // time (not at the watermark — that would re-fire on every
          // advance, an O(all keys) rewrite per micro-batch) fires this
          // function with an empty iterator; the branch below then sees
          // wm >= retireUs and removes. Derived from kept alone, so no
          // extra state field is needed.
          val retireUs = kept.map(_._1).max + retentionUs
          if (wm >= retireUs) state.remove()
          else {
            state.update(PitState(kept, Nil))
            state.setTimeoutTimestamp(
              math.max((retireUs + 999) / 1000, state.getCurrentWatermarkMs() + 1))
          }
        case None =>
          // retention opt-out: keep the pruned version list forever (no
          // timeout set → the key never retires) so arbitrarily-late
          // probes keep batch parity
          state.update(PitState(kept, Nil))
      }
      out.iterator
    }

    unioned
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
