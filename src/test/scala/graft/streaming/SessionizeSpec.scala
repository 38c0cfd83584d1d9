package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SlidingWindowSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("sliding window agg: each event in exactly length/slide windows") {
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val n = events.count()
    val windowed = events
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    // 2h windows sliding 1h → every event counted exactly twice
    val total = windowed.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total == 2 * n)
    // window bounds are aligned, half-open, length 2h
    val w = windowed.select(col("window.start").cast("long"), col("window.end").cast("long"))
      .collect()
    assert(w.forall(r => r.getLong(1) - r.getLong(0) == 7200))
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val GAP = 4L * 3600 * 1000000 // 4h in micros

  test("batch sessionize: gap splits, aggregates per session") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, t("2024-01-01 11:00:00"), 2.0),  // same session (1h gap)
      (3L, 1L, t("2024-01-01 16:00:00"), 4.0),  // 5h gap → new session
      (4L, 2L, t("2024-01-01 10:30:00"), 8.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Sessionize.batch(events, GAP)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 8.0)))
  }

  test("streaming sessionize matches batch on closed sessions") {
    val batchEvents = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val streamDir = Files.createTempDirectory("graft-sess-in-").toString
    batchEvents.write.mode("overwrite").parquet(streamDir)

    val schema = spark.read.parquet(streamDir).schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
      .select(col("user_id"), col("ts"), col("value")).as[Sessionize.SessEvent]
    val sessions = Sessionize.streaming(stream, GAP, watermarkDelay = "1 minute")

    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-sess-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions_out")
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val batch = Sessionize.batch(batchEvents, GAP)
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet

    // The stream emits sessions closed by a subsequent event or the
    // final watermark; each emitted session must match a batch session
    // on bounds and count, with sums equal modulo float-accumulation
    // order (streaming state adds doubles; batch sums exact decimals).
    assert(streamed.nonEmpty, "no sessions emitted")
    val batchByKey = batch.map(s => (s._1, s._2, s._3, s._4) -> s._5).toMap
    val unmatched = streamed.filterNot { s =>
      batchByKey.get((s._1, s._2, s._3, s._4)).exists(v => math.abs(v - s._5) < 1e-6)
    }
    assert(unmatched.isEmpty, s"streamed sessions disagree with batch: ${unmatched.take(3)}")
    assert(streamed.size >= batch.size / 2, s"only ${streamed.size}/${batch.size} sessions closed")
  }

  test("equal-timestamp events cannot split a session: stream ≡ batch on ties") {
    // the q201 gate's documented tie argument, pinned: a zero gap is
    // ≤ gapMicros in BOTH formulations, so duplicate (user, ts) events
    // always share a session, and with integer-valued doubles the
    // state sum is exact whatever the arrival order
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), 1.0),
      (1L, t("2024-01-01 10:00:00"), 2.0),  // tie with the row above
      (1L, t("2024-01-01 10:00:05"), 4.0),
      (1L, t("2024-01-01 16:00:00"), 8.0),  // 6h gap → second session
      (2L, t("2024-01-01 11:00:00"), 1.0),  // triple tie: one session,
      (2L, t("2024-01-01 11:00:00"), 2.0),  // start = end, n = 3
      (2L, t("2024-01-01 11:00:00"), 4.0),
      (99L, t("2024-01-03 00:00:00"), 0.0)) // watermark sentinel
    val events = rows.zipWithIndex
      .map { case ((u, ts, v), i) => (i.toLong, u, ts, v) }
      .toDF("event_id", "user_id", "ts", "value")
    val streamDir = Files.createTempDirectory("graft-sess-tie-in-").toString
    events.select("user_id", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(streamDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(streamDir).schema).parquet(streamDir)
      .as[Sessionize.SessEvent]
    val q = Sessionize.streaming(stream, GAP, watermarkDelay = "1 minute")
      .toDF.writeStream.outputMode("append")
      .format("memory").queryName("sessions_tie_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sess-tie-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("user_id") =!= 99L)
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val streamed = key(spark.table("sessions_tie_out"))
    val batch = key(Sessionize.batch(events.filter(col("user_id") =!= 99L), GAP))
    assert(streamed == batch,
      s"tie sessions diverge: stream $streamed vs batch $batch")
    // and the triple tie really is ONE session with start = end
    assert(streamed.count(s => s._1 == 2L) == 1)
    assert(streamed.find(_._1 == 2L).exists(s => s._2 == s._3 && s._4 == 3L && s._5 == 7.0))
  }

  test("streamingCoOccurrence pair counts ≡ batch over distinct-ts replay") {
    // distinct (user, ts) is the determinism boundary (batch breaks
    // ties on event_id, a stream on micro-batch arrival) — dedupe the
    // fixture to it, then the pair MULTISETS must agree exactly
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
      .dropDuplicates("user_id", "ts")
    val streamDir = Files.createTempDirectory("graft-cooc-in-").toString
    events.select("user_id", "ts", "event_type")
      .write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
      .as[Sessionize.TypedEvent]
    val q = Sessionize.streamingCoOccurrence(stream, GAP, maxDist = 3,
        watermarkDelay = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("cooc_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cooc-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream timed out")
    val streamed = spark.table("cooc_out")
      .groupBy("src_type", "dst_type").count()
      .as[(String, String, Long)].collect().toSet
    val batch = Sessionize.coOccurrencePairs(events, GAP, maxDist = 3)
      .as[(String, String, Long)].collect().toSet
    assert(streamed === batch,
      "streaming pair counts must equal the batch extraction")
    assert(streamed.nonEmpty)
  }

  test("coOccurrencePairs: bounded lookahead, session boundaries respected") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: session A = [a, b, c], then a 5h gap, session B = [d];
    // user 2: session = [a, c]
    val events = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), "a"),
      (2L, 1L, t("2024-01-01 10:10:00"), "b"),
      (3L, 1L, t("2024-01-01 10:20:00"), "c"),
      (4L, 1L, t("2024-01-01 16:00:00"), "d"),  // new session — never pairs
      (5L, 2L, t("2024-01-01 09:00:00"), "a"),
      (6L, 2L, t("2024-01-01 09:30:00"), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessionize.coOccurrencePairs(events, GAP, maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    // session A at dist<=2: a→b, a→c, b→c; user 2: a→c; d pairs with
    // nothing (its session has one event, and cross-session is barred)
    assert(got === Set(("a", "b", 1L), ("a", "c", 2L), ("b", "c", 1L)))
    // maxDist=1 drops the skip pair a→c from session A
    val adj = Sessionize.coOccurrencePairs(events, GAP, maxDist = 1)
      .as[(String, String, Long)].collect().toSet
    assert(adj === Set(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L)))
    intercept[IllegalArgumentException](
      Sessionize.coOccurrencePairs(events, GAP, maxDist = 0))
    // one exchange only: the lookaheads ride the sessionize sort
    val plan = Sessionize.coOccurrencePairs(events, GAP, maxDist = 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected sessionize + agg exchanges only:\n$plan")
    assert(!plan.contains("Join"), s"no self-join allowed:\n$plan")
  }
}
