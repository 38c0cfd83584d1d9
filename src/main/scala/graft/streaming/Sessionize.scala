package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** [extension] Sessionization — gap-based session windows over the
  * events stream, in two equivalent forms:
  *
  *   - `batch`: lag/window formulation (one shuffle + sort per user);
  *     oracle-checkable in ANSI SQL;
  *   - `streaming`: `flatMapGroupsWithState` with event-time timeout —
  *     the custom-state path the builder brief calls for; emits a
  *     session when the gap elapses past the watermark.
  *
  * Both share the session definition: consecutive events of a user
  * belong to one session while the gap between adjacent events is
  * ≤ `gapMicros`.
  */
object Sessionize {

  // ------------------------------------------------------------ batch

  /** Batch sessionize: session id = running count of gap-breaks per
    * user (lag window), then per-session aggregates. `value` sums run
    * on DECIMAL(18,4) (exact) for oracle portability.
    */
  def batch(events: DataFrame, gapMicros: Long): DataFrame = {
    assignBatch(events, gapMicros).groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("_us")).as("start_us"),
        max(col("_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
  }

  /** Skip-gram co-occurrence pair mining over sessions — the
    * item2vec/word2vec training-pair extraction applied to behavioral
    * events: for every event, each of the next `maxDist` events of
    * the SAME session contributes one directed (src_type, dst_type)
    * pair, and the output is the corpus-wide pair-count table an
    * embedding trainer (or a PMI-style association analysis) consumes.
    *
    * Scale shape: the naive formulation is a within-session self-join
    * — quadratic in session length, and one marathon session stalls
    * the stage. Here the window is BOUNDED by construction: all
    * `maxDist` lookaheads are `lead()` columns over the ONE
    * (user | ts, event_id) sort that session assignment already
    * needs, with a same-session guard (`lead(session_id) ===
    * session_id`) instead of a second (user, session) exchange; the
    * pair stream then explodes from an in-row array and hash-aggs on
    * the pair key. One exchange + one sort + one agg at any session
    * length; `maxDist` is an enforced contract (each distance adds a
    * window expression), not advisory.
    */
  def coOccurrencePairs(events: DataFrame, gapMicros: Long,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 1 && maxDist <= 16,
      s"coOccurrencePairs: maxDist must be in [1,16], got $maxDist")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // window expressions are not allowed inside a generator (the
    // top-level-generator rule's sibling): land each guarded lookahead
    // as a plain column first, then explode the assembled array
    val withLeads = (1 to maxDist).foldLeft(assignBatch(events, gapMicros)) {
      (acc, k) =>
        acc.withColumn(s"_dst_$k",
          when(lead(col("session_id"), k).over(w) === col("session_id"),
            lead(col("event_type"), k).over(w)))
    }
    withLeads
      .select(col("event_type").as("src_type"),
        explode(array((1 to maxDist).map(k => col(s"_dst_$k")): _*)).as("dst_type"))
      .filter(col("dst_type").isNotNull)
      .groupBy(col("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Association (lift) scores over the [[coOccurrencePairs]] table —
    * the log-free sibling of PMI (ln is excluded from the portable
    * tier, SURVEY §5.3): lift(a→b) = P(pair) / (P(src=a)·P(dst=b)),
    * computed as the exact integer-rational
    * `floor(n_pairs · N · 1e6 / (n_src · n_dst))` where N is the
    * total pair count and the marginals count each type's
    * appearances as src / as dst. Lift > 1e6 means a follows b more
    * often than the session traffic predicts — the association a
    * recommender or a prompt-sequencing curriculum reads.
    *
    * Three aggregates over the (already tiny) pair table + two
    * broadcast joins back; nothing event-scale shuffles beyond the
    * pair extraction itself.
    */
  def coOccurrenceLift(events: DataFrame, gapMicros: Long,
      maxDist: Int = 3): DataFrame = {
    val pairs = coOccurrencePairs(events, gapMicros, maxDist)
      .localCheckpoint(true) // three aggregate consumers below — an
                             // uncut lineage re-mines the pairs per arm
    val srcTot = pairs.groupBy(col("src_type"))
      .agg(sum(col("n_pairs")).as("n_src"))
    val dstTot = pairs.groupBy(col("dst_type"))
      .agg(sum(col("n_pairs")).as("n_dst"))
    val total = pairs.agg(sum(col("n_pairs")).as("_n"))
    pairs
      .join(broadcast(srcTot), Seq("src_type"))
      .join(broadcast(dstTot), Seq("dst_type"))
      .crossJoin(broadcast(total))
      .select(col("src_type"), col("dst_type"), col("n_pairs"),
        floor(col("n_pairs").cast("double") * col("_n").cast("double")
          * lit(1e6) / (col("n_src").cast("double") * col("n_dst").cast("double")))
          .cast("long").as("lift_q"))
  }

  /** Per-event session assignment: every input column plus `_us`
    * (epoch micros) and `session_id` (1-based running break count per
    * user). One exchange on user_id; both window passes share the
    * (user_id | ts, event_id) sort. Factored out of [[batch]] so
    * session-scoped analyses (funnels, paths) can group the raw events
    * themselves.
    */
  def assignBatch(events: DataFrame, gapMicros: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.withColumn("_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("_new_sess",
        when(col("_us") - lag(col("_us"), 1).over(byUser) > gapMicros, 1)
          .when(lag(col("_us"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("_new_sess")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_sess")
  }

  // -------------------------------------------------------- streaming

  case class SessEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessState(startUs: Long, endUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** Streaming sessionize via flatMapGroupsWithState (event-time
    * timeout). A session closes — and is emitted — when the watermark
    * passes its end + gap, or when a new event arrives beyond the gap.
    * State per user is one open session: O(users) state, bounded by the
    * watermark.
    */
  def streaming(events: Dataset[SessEvent], gapMicros: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    import EventTime.toUs

    def fn(userId: Long, evs: Iterator[SessEvent],
        state: GroupState[SessState]): Iterator[Session] = {
      var out = List.empty[Session]
      var cur = state.getOption
      if (state.hasTimedOut) {
        cur.foreach(s => out ::= Session(userId, s.startUs, s.endUs, s.n, s.sum))
        state.remove()
        cur = None
      }
      for (e <- evs.toSeq.sortBy(x => toUs(x.ts))) {
        val us = toUs(e.ts)
        cur match {
          case Some(s) if us - s.endUs <= gapMicros =>
            cur = Some(SessState(s.startUs, math.max(s.endUs, us), s.n + 1, s.sum + e.value))
          case Some(s) =>
            out ::= Session(userId, s.startUs, s.endUs, s.n, s.sum)
            cur = Some(SessState(us, us, 1, e.value))
          case None =>
            cur = Some(SessState(us, us, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.endUs / 1000 + gapMicros / 1000)
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class CoPairState(endUs: Long, recent: List[String])
  case class CoPair(src_type: String, dst_type: String)

  /** Streaming co-occurrence mining — [[coOccurrencePairs]] as an
    * incremental emitter: state per user is the open session's end
    * time plus its last `maxDist` event TYPES (a bounded deque —
    * O(maxDist) per user regardless of session length, unlike a
    * whole-session buffer), and each arriving in-gap event emits its
    * pairs IMMEDIATELY against that deque, so a session's pairs are
    * complete the moment its last event is processed and the
    * event-time timeout merely clears state. Feed the output through
    * [[StreamingFeatures.maintainAggState]] keyed on (src, dst) for
    * the continuously-maintained pair-count table.
    *
    * Parity contract (spec-asserted): over any replay whose event
    * times are distinct per user, the emitted pair multiset equals
    * the batch [[coOccurrencePairs]] pair stream. Equal-timestamp
    * events order by arrival within a micro-batch (the batch path
    * tie-breaks on event_id), so distinct timestamps are the
    * determinism boundary — the [[streaming]] sessionizer's same
    * caveat.
    */
  def streamingCoOccurrence(events: Dataset[TypedEvent], gapMicros: Long,
      maxDist: Int = 3,
      watermarkDelay: String = "10 minutes"): Dataset[CoPair] = {
    require(maxDist >= 1 && maxDist <= 16,
      s"streamingCoOccurrence: maxDist must be in [1,16], got $maxDist")
    import events.sparkSession.implicits._

    import EventTime.toUs

    def fn(userId: Long, evs: Iterator[TypedEvent],
        state: GroupState[CoPairState]): Iterator[CoPair] = {
      var out = List.empty[CoPair]
      var cur = state.getOption
      if (state.hasTimedOut) {
        state.remove()
        cur = None
      }
      for (e <- evs.toSeq.sortBy(x => toUs(x.ts))) {
        val us = toUs(e.ts)
        cur match {
          case Some(s) if us - s.endUs <= gapMicros =>
            s.recent.foreach(r => out ::= CoPair(r, e.event_type))
            cur = Some(CoPairState(math.max(s.endUs, us),
              (e.event_type :: s.recent).take(maxDist)))
          case _ =>
            cur = Some(CoPairState(us, List(e.event_type)))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.endUs / 1000 + gapMicros / 1000)
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
