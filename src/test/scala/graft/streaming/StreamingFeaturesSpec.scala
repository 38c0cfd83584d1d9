package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fs.{FeatureStore, FeatureTableSpec, WriteMode}

/** Streaming feature refresh: readStream → windowed agg → foreachBatch
  * merge into a feature table (SURVEY.md §7.6). Driven synchronously:
  * AvailableNow trigger + awaitTermination over the sf0.001 events
  * parquet as a file stream.
  */
class StreamingFeaturesSpec extends SparkSpec {

  test("streaming dedup drops re-delivered events within the watermark") {
    import org.apache.spark.sql.functions._
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp")).limit(200)
    // simulate at-least-once: write the same batch twice into the source
    val streamDir = Files.createTempDirectory("graft-dedup-in-").toString
    events.write.mode("overwrite").parquet(streamDir)
    events.write.mode("append").parquet(streamDir)
    assert(spark.read.parquet(streamDir).count() == 400)

    val schema = spark.read.parquet(streamDir).schema
    val stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    val deduped = StreamingFeatures.dedupEvents(stream)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-dedup-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("dedup_out").count() == 200)
  }

  test("streaming content dedup collapses same-fingerprint docs across time") {
    import org.apache.spark.sql.functions._
    // documents re-posted later with different ids/case/whitespace:
    // content fingerprint must collapse them; distinct content survives
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(100)
      .withColumn("ts", timestamp_seconds(
        unix_timestamp(to_timestamp(lit("2024-01-01 00:00:00"))) + col("doc_id")))
    val reposted = docs
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", upper(col("text"))) // case-insensitive key
      .withColumn("ts", col("ts") + expr("INTERVAL 10 MINUTES"))
    val streamDir = Files.createTempDirectory("graft-cdedup-in-").toString
    docs.unionByName(reposted).write.mode("overwrite").parquet(streamDir)

    val schema = spark.read.parquet(streamDir).schema
    val stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    val deduped = StreamingFeatures.dedupDocsByContent(stream, watermarkDelay = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("cdedup_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-cdedup-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // parity with batch exactDedup on the same 200-row input
    val batchDistinct = graft.ext.Dedup.exactDedup(
      spark.read.parquet(streamDir)).count()
    assert(spark.table("cdedup_out").count() == batchDistinct,
      s"stream dedup != batch dedup ($batchDistinct)")
  }

  test("content dedup: fingerprint state EVICTS past the watermark delay (re-post re-emits)") {
    import org.apache.spark.sql.functions._
    // The contract BOUNDARY the q200 gate's 40-day delay is sized
    // against: this is dedup-WITHIN-watermark, not global dedup — once
    // the watermark passes a fingerprint's event time + delay its
    // state entry is evicted, so the same content re-posted later than
    // the delay window re-emits. Eviction is also what keeps the state
    // store at O(delay window), never O(corpus) — the 100 TB/day
    // posture claim in dedupDocsByContent's Scaladoc, pinned here.
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(50)
      .select(col("doc_id"), col("text"))
      .withColumn("ts", timestamp_seconds(
        unix_timestamp(to_timestamp(lit("2024-01-01 00:00:00"))) + col("doc_id")))
    val streamDir = Files.createTempDirectory("graft-cdedup-ev-in-").toString
    docs.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val ckpt = Files.createTempDirectory("graft-cdedup-ev-ck-").toString
    // foreachBatch, not the memory sink: only foreachBatch/file sinks
    // support recovering from an existing checkpoint, and the restart
    // IS the thing under test here
    def phase(name: String): Long = {
      val emitted = new java.util.concurrent.atomic.LongAdder
      val stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
      val q = StreamingFeatures
        .dedupDocsByContent(stream, watermarkDelay = "30 minutes")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted.add(b.count())
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), s"$name timed out")
      emitted.sum()
    }
    assert(phase("cdedup_ev_p1") == 50, "all distinct content emits")
    // one FRESH doc 2 h later, same checkpoint: its batch advances the
    // watermark past every phase-1 fingerprint's expiry (ts + 30 min),
    // evicting their state
    docs.limit(1)
      .withColumn("doc_id", lit(900000L))
      .withColumn("text", lit("watermark advancer - unique content"))
      .withColumn("ts", to_timestamp(lit("2024-01-01 02:00:00")))
      .write.mode("append").parquet(streamDir)
    assert(phase("cdedup_ev_p2") == 1, "the advancer is distinct content")
    // the SAME 50 texts re-posted past the delay window: state was
    // evicted, so every one re-emits
    docs.withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("ts", to_timestamp(lit("2024-01-01 02:10:00")))
      .write.mode("append").parquet(streamDir)
    assert(phase("cdedup_ev_p3") == 50,
      "re-posted duplicates past the delay window must re-emit (state evicted)")
  }

  test("streaming windowed agg merges into a feature table (K5 reuse)") {
    val batchEvents = graft.Tables.load(spark, sfDir, "events")
    // stage events as a stream-readable dir with micros timestamps
    // (streaming parquet source rejects TIMESTAMP(NANOS) the same way
    // batch does, so the staged copy uses the converted column)
    val streamDir = Files.createTempDirectory("graft-stream-in-").toString
    batchEvents.withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(streamDir)

    val schema = spark.read.parquet(streamDir).schema
    val stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    val agg = StreamingFeatures.userEventFeatures(stream,
      windowLength = "6 hours", watermarkDelay = "1 hour")

    val store = FeatureStore.temp(spark)
    store.createTable(FeatureTableSpec("user_stream_features",
      Seq("user_id", "window_start"),
      agg.schema, "streaming per-user window features"))

    val ckpt = Files.createTempDirectory("graft-stream-ck-").toString
    val q = StreamingFeatures.refreshFeatureTable(agg, store, "user_stream_features", ckpt)
    q.awaitTermination(120000)

    val result = store.readTable("user_stream_features")
    val n = result.count()
    assert(n > 0, "streaming merge produced no rows")

    // parity with the equivalent batch aggregation
    val expected = batchEvents
      .groupBy(window(col("ts").cast("timestamp"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .count()
    assert(n == expected)

    // re-running the same stream from a fresh checkpoint is idempotent
    // thanks to key-based merge
    val q2 = StreamingFeatures.refreshFeatureTable(agg, store, "user_stream_features",
      Files.createTempDirectory("graft-stream-ck2-").toString)
    q2.awaitTermination(120000)
    assert(store.readTable("user_stream_features").count() == n)
  }

  test("maintainAggState: running totals match IncrementalAgg.build across restarts") {
    import graft.operators.IncrementalAgg
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val first = events.filter(col("event_id") % 2 === 0)
    val second = events.filter(col("event_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-aggstate-in-").toString
    first.write.mode("overwrite").parquet(streamDir)

    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    val keys = Seq("event_type")
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    // state schema = IncrementalAgg.build's output
    val stateSchema = IncrementalAgg.build(
      spark.read.parquet(streamDir), keys, "value").schema
    store.createTable(FeatureTableSpec("agg_state", keys, stateSchema,
      "running per-event-type value state"))
    val ckpt = Files.createTempDirectory("graft-aggstate-ck-").toString

    val q1 = StreamingFeatures.maintainAggState(stream, store, "agg_state",
      keys, "value", ckpt)
    assert(q1.awaitTermination(120000), "first run timed out")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("cnt"), col("sm").cast("string"),
        col("mn"), col("mx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(rows(store.readTable("agg_state")) ==
      rows(IncrementalAgg.build(first, keys, "value")))

    // second chunk arrives; SAME checkpoint — the streaming state store
    // carries the running totals across the restart, only new files read
    second.write.mode("append").parquet(streamDir)
    val q2 = StreamingFeatures.maintainAggState(stream, store, "agg_state",
      keys, "value", ckpt)
    assert(q2.awaitTermination(120000), "second run timed out")
    assert(rows(store.readTable("agg_state")) ==
      rows(IncrementalAgg.build(events, keys, "value")),
      "running state != batch build over all data")
  }

  test("temperatureMix served from maintained counts ≡ batch mix") {
    // the serve-from-state posture: per-source counts live in a
    // maintainAggState table; re-mixing against CURRENT counts costs
    // zero extra aggregation and must keep the SAME set as the batch
    // temperatureMix (whose counts come from its own in-plan agg)
    import graft.operators.IncrementalAgg
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-tmix-in-").toString
    first.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    val keys = Seq("source")
    val stateSchema = IncrementalAgg.build(
      spark.read.parquet(streamDir), keys, "n_chars").schema
    store.createTable(FeatureTableSpec("src_counts", keys, stateSchema,
      "per-source corpus counts"))
    val ckpt = Files.createTempDirectory("graft-tmix-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    val q1 = StreamingFeatures.maintainAggState(stream, store, "src_counts",
      keys, "n_chars", ckpt)
    assert(q1.awaitTermination(120000), "first run timed out")
    second.write.mode("append").parquet(streamDir)
    val q2 = StreamingFeatures.maintainAggState(stream, store, "src_counts",
      keys, "n_chars", ckpt)
    assert(q2.awaitTermination(120000), "second run timed out")

    val maintained = store.readTable("src_counts")
      .select(col("source"), col("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val servedFracs = graft.etl.Sampling.temperatureFracs(maintained, 0.5)
    val served = graft.etl.Sampling.stratifiedSample(docs, "source",
        col("doc_id"), servedFracs, defaultFrac = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = graft.etl.Sampling.temperatureMix(docs, "source",
        col("doc_id"), alpha = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(served == batch,
      "mix from streaming-maintained counts must equal the batch mix")
    assert(served.nonEmpty)
  }

  test("epochMix served from maintained token volumes ≡ batch plan") {
    // the data-constrained plan at scale: per-source token volumes
    // live in a maintainAggState table; re-planning epochs against
    // CURRENT volumes costs zero extra aggregation and must produce
    // the SAME (doc, epoch) set as the batch epochMix (whose volumes
    // come from its own in-plan agg)
    import graft.operators.IncrementalAgg
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-emix-in-").toString
    first.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    val keys = Seq("source")
    val stateSchema = IncrementalAgg.build(
      spark.read.parquet(streamDir), keys, "n_chars").schema
    store.createTable(FeatureTableSpec("src_volumes", keys, stateSchema,
      "per-source token volumes"))
    val ckpt = Files.createTempDirectory("graft-emix-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    val q1 = StreamingFeatures.maintainAggState(stream, store, "src_volumes",
      keys, "n_chars", ckpt)
    assert(q1.awaitTermination(120000), "first run timed out")
    second.write.mode("append").parquet(streamDir)
    val q2 = StreamingFeatures.maintainAggState(stream, store, "src_volumes",
      keys, "n_chars", ckpt)
    assert(q2.awaitTermination(120000), "second run timed out")

    val maintained = store.readTable("src_volumes")
      .select(col("source"), col("sm").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = 2L * maintained.values.sum
    val served = graft.etl.Sampling.epochMixFromCounts(docs, "source",
        col("doc_id"), maintained, budget, maxEpochs = 3)
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.etl.Sampling.epochMix(docs, "source",
        col("doc_id"), col("n_chars"), budget, maxEpochs = 3)
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == batch,
      "epoch plan from streaming-maintained volumes must equal the batch plan")
    assert(served.nonEmpty)
  }

  test("contentManifest served from maintained digest sums ≡ batch manifest") {
    // the manifest-at-scale posture: the per-source digest is a SUM of
    // per-doc fingerprint integers, so maintainAggState over that term
    // IS the manifest — incremental updates instead of corpus re-reads
    import graft.operators.IncrementalAgg
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        graft.ext.TextAnalysis.fingerprintInt(col("text")).as("fpi"))
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-man-in-").toString
    first.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    val stateSchema = IncrementalAgg.build(
      spark.read.parquet(streamDir), Seq("source"), "fpi").schema
    store.createTable(FeatureTableSpec("src_manifest", Seq("source"),
      stateSchema, "per-source content digests"))
    val ckpt = Files.createTempDirectory("graft-man-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    val q1 = StreamingFeatures.maintainAggState(stream, store, "src_manifest",
      Seq("source"), "fpi", ckpt)
    assert(q1.awaitTermination(120000), "first run timed out")
    second.write.mode("append").parquet(streamDir)
    val q2 = StreamingFeatures.maintainAggState(stream, store, "src_manifest",
      Seq("source"), "fpi", ckpt)
    assert(q2.awaitTermination(120000), "second run timed out")

    // the maintained state is the plain running sum; the digest is its
    // pmod 2^52 (modular addition commutes with the fold — at a scale
    // where the running long sum itself would overflow, the maintainer
    // folds the mod at every merge instead)
    val served = store.readTable("src_manifest")
      .select(col("source"), col("cnt"),
        pmod(col("sm").cast("long"), lit(1L << 52)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.ext.TextAnalysis.contentManifest(
        graft.Tables.load(spark, sfDir, "documents"), "text", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(served === batch,
      "manifest from streaming-maintained sums must equal the batch manifest")
  }

  test("numericDrift served from maintained bin counts ≡ batch drift") {
    // the drift-at-scale posture made real: the CURRENT snapshot's
    // per-bin histogram lives in a maintainAggState table (the stream
    // bins under FROZEN base edges before the stateful agg), and drift
    // against the frozen base costs zero extra corpus aggregation
    import graft.etl.Discretize
    import graft.operators.Drift
    val events = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "value").filter(col("value").isNotNull)
    val base = events.filter(col("event_id") % 2 === 0)
    val current = events.filter(col("event_id") % 2 === 1)
    val edges = Discretize.quantileEdges(base, "value", nBins = 4)
      .localCheckpoint(true)
    val streamDir = Files.createTempDirectory("graft-drift-in-").toString
    current.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    val binned = StreamingFeatures.readEventStream(spark, streamDir, schema)
      .crossJoin(broadcast(edges))
      .withColumn("bin",
        size(filter(col("_edges"), e => e <= col("value"))).cast("int"))
      .drop("_edges")
    val stateSchema = graft.operators.IncrementalAgg.build(
      Discretize.withBins(current, "value", edges), Seq("bin"), "value").schema
    store.createTable(FeatureTableSpec("bin_counts", Seq("bin"), stateSchema,
      "per-bin histogram of the current stream under frozen base edges"))
    val ckpt = Files.createTempDirectory("graft-drift-ck-").toString
    val q = StreamingFeatures.maintainAggState(binned, store, "bin_counts",
      Seq("bin"), "value", ckpt)
    assert(q.awaitTermination(120000), "drift-bin run timed out")

    val maintained = store.readTable("bin_counts")
      .select(col("bin"), col("cnt").as("n"))
    val baseCounts = Discretize.withBins(base, "value", edges)
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val served = rows(Drift.categoricalDrift(baseCounts, maintained, "bin", "n"))
    val batch = rows(Drift.numericDrift(base, current, "value", nBins = 4))
    assert(served == batch,
      "drift from streaming-maintained bin counts must equal batch numericDrift")
    assert(served.nonEmpty && served.exists(_._4 >= 0))
  }

  test("applyChangeStream: CDC micro-batches apply upserts+deletes atomically") {
    import spark.implicits._
    val store = FeatureStore.temp(spark)
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "x")
    store.createTable(FeatureTableSpec("cdc", Seq("id"), base.schema))
    store.writeTable("cdc", base, WriteMode.Merge)
    val streamDir = Files.createTempDirectory("graft-cdc-in-").toString
    Seq((1L, 0.0, "delete"), (2L, 99.0, "upsert")).toDF("id", "x", "_op")
      .write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val ckpt = Files.createTempDirectory("graft-cdc-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    def rows = store.readTable("cdc").orderBy("id")
      .as[(Long, Double)].collect().toSeq

    val q1 = StreamingFeatures.applyChangeStream(stream, store, "cdc", "_op", ckpt)
    assert(q1.awaitTermination(120000), "first CDC run timed out")
    assert(rows === Seq((2L, 99.0), (3L, 30.0)))

    // later change file, same checkpoint: only the new batch applies
    Seq((4L, 40.0, "upsert")).toDF("id", "x", "_op")
      .write.mode("append").parquet(streamDir)
    val q2 = StreamingFeatures.applyChangeStream(stream, store, "cdc", "_op", ckpt)
    assert(q2.awaitTermination(120000), "second CDC run timed out")
    assert(rows === Seq((2L, 99.0), (3L, 30.0), (4L, 40.0)))
  }

  test("applyChangeStream resolves multi-event keys last-wins via seqCol") {
    import spark.implicits._
    val store = FeatureStore.temp(spark)
    val base = Seq((1L, 10.0)).toDF("id", "x")
    store.createTable(FeatureTableSpec("cdc2", Seq("id"), base.schema))
    store.writeTable("cdc2", base, WriteMode.Merge)
    val streamDir = Files.createTempDirectory("graft-cdc2-in-").toString
    // one micro-batch, three events for key 1: upsert, upsert, delete
    Seq((1L, 50.0, "upsert", 1L), (1L, 60.0, "upsert", 2L),
      (1L, 0.0, "delete", 3L))
      .toDF("id", "x", "_op", "seq")
      .write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val ckpt = Files.createTempDirectory("graft-cdc2-ck-").toString
    val q = StreamingFeatures.applyChangeStream(
      StreamingFeatures.readEventStream(spark, streamDir, schema),
      store, "cdc2", "_op", ckpt, seqCol = Some("seq"))
    assert(q.awaitTermination(120000), "CDC run timed out")
    // last event (delete@3) wins: key 1 is gone
    assert(store.readTable("cdc2").count() === 0)
  }

  test("maintainDocFrequency: streaming df equals batch term stats across micro-batches") {
    import graft.ext.TextAnalysis
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-df-in-").toString
    first.write.mode("overwrite").parquet(streamDir)

    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    // batch reference: per-term document frequency (termStats' df,
    // deduped to one row per term)
    def ref(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.termStats(d, "text", "doc_id")
        .select(col("term"), col("df")).distinct()
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val stateSchema = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("df",
          org.apache.spark.sql.types.LongType, nullable = false)))).schema
    store.createTable(FeatureTableSpec("df_state", Seq("term"), stateSchema,
      "running per-term document frequency"))
    val ckpt = Files.createTempDirectory("graft-df-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)

    val q1 = StreamingFeatures.maintainDocFrequency(stream, store, "df_state",
      "text", ckpt)
    assert(q1.awaitTermination(120000), "first run timed out")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows(store.readTable("df_state").select("term", "df")) === ref(first))

    second.write.mode("append").parquet(streamDir)
    val q2 = StreamingFeatures.maintainDocFrequency(stream, store, "df_state",
      "text", ckpt)
    assert(q2.awaitTermination(120000), "second run timed out")
    assert(rows(store.readTable("df_state").select("term", "df")) === ref(docs),
      "running df state != batch document frequency over all docs")
  }

  test("frozen-grid SQ8: maintained bounds reproduce batch codes; OOD clamps") {
    import spark.implicits._
    import graft.ext.Pq
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-sq-in-").toString
    first.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    import org.apache.spark.sql.types._
    store.createTable(FeatureTableSpec("q_bounds", Seq("pos"), StructType(Seq(
      StructField("pos", IntegerType), StructField("mn", DoubleType),
      StructField("mx", DoubleType)))))
    val ckpt = Files.createTempDirectory("graft-sq-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    assert(StreamingFeatures.maintainQuantBounds(stream, store, "q_bounds",
      "embedding", ckpt).awaitTermination(120000))
    second.write.mode("append").parquet(streamDir)
    assert(StreamingFeatures.maintainQuantBounds(stream, store, "q_bounds",
      "embedding", ckpt).awaitTermination(120000))

    val bounds = store.readTable("q_bounds").orderBy("pos")
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val fromState = Pq.scalarQuantizeWithBounds(emb, "embedding", "vec_id",
      bounds.map(_._1), bounds.map(_._2))
      .as[(Long, Array[Int])].collect().toMap
    val batch = Pq.scalarQuantize(emb, "embedding", "vec_id")
      .as[(Long, Array[Int])].collect().toMap
    assert(fromState.keySet === batch.keySet)
    for (k <- batch.keySet)
      assert(fromState(k).toSeq === batch(k).toSeq, s"vec $k codes differ")

    // out-of-distribution value clamps instead of leaving [0,255]
    val dim = bounds.length
    val ood = Seq((0L, Array.fill(dim)(1e9f)), (1L, Array.fill(dim)(-1e9f)))
      .toDF("vec_id", "embedding")
    val codes = Pq.scalarQuantizeWithBounds(ood, "embedding", "vec_id",
      bounds.map(_._1), bounds.map(_._2))
      .as[(Long, Array[Int])].collect().toMap
    assert(codes(0L).forall(_ == 255) && codes(1L).forall(_ == 0))
  }

  test("live BM25: scores from maintained state equal the batch operator") {
    import graft.ext.Retrieval
    val terms = Seq("spark", "vector", "stream")
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-bm25-in-").toString
    first.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    import org.apache.spark.sql.types._
    store.createTable(FeatureTableSpec("df_state", Seq("term"), StructType(Seq(
      StructField("term", StringType), StructField("df", LongType)))))
    store.createTable(FeatureTableSpec("corpus_stats", Seq("corpus_key"),
      StructType(Seq(StructField("corpus_key", StringType),
        StructField("n_docs", LongType), StructField("sum_dl", LongType)))))
    val ck1 = Files.createTempDirectory("graft-bm25-ck1-").toString
    val ck2 = Files.createTempDirectory("graft-bm25-ck2-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)

    // two micro-batches through BOTH maintainers, shared checkpoints
    assert(StreamingFeatures.maintainDocFrequency(stream, store, "df_state",
      "text", ck1).awaitTermination(120000))
    assert(StreamingFeatures.maintainCorpusStats(stream, store, "corpus_stats",
      "text", ck2).awaitTermination(120000))
    second.write.mode("append").parquet(streamDir)
    assert(StreamingFeatures.maintainDocFrequency(stream, store, "df_state",
      "text", ck1).awaitTermination(120000))
    assert(StreamingFeatures.maintainCorpusStats(stream, store, "corpus_stats",
      "text", ck2).awaitTermination(120000))

    // score the full corpus against the MAINTAINED stats
    val stats = store.readTable("corpus_stats").collect().head
    val dfs = store.readTable("df_state")
      .filter(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromState = Retrieval.bm25TopKWithStats(docs, "text", "doc_id",
      terms, k = 50, nDocs = stats.getAs[Long]("n_docs"),
      sumDl = stats.getAs[Long]("sum_dl"), dfs = dfs)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val batch = Retrieval.bm25TopK(docs, "text", "doc_id", terms, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(fromState === batch,
      "state-derived BM25 != batch BM25 on identical corpus stats")
  }

  test("maintainFunnelState: streaming funnel equals batch conversionFunnel across micro-batches") {
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val first = events.filter(col("event_id") % 2 === 0)
    val streamDir = Files.createTempDirectory("graft-funnel-in-").toString
    first.write.mode("overwrite").parquet(streamDir)

    val schema = spark.read.parquet(streamDir).schema
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    def batchFunnel(ev: org.apache.spark.sql.DataFrame) =
      graft.PipelinesExt.funnelAgg(ev.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")))
    val store = FeatureStore.temp(spark)
    store.createTable(FeatureTableSpec("funnel", Seq("user_id"),
      batchFunnel(events).schema, "running per-user funnel state"))
    val ckpt = Files.createTempDirectory("graft-funnel-ck-").toString

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getInt(3))).sortBy(_._1).toSeq

    val q1 = StreamingFeatures.maintainFunnelState(stream, store, "funnel", ckpt)
    assert(q1.awaitTermination(120000), "first run timed out")
    assert(rows(store.readTable("funnel")) == rows(batchFunnel(first)))

    // second micro-batch: same checkpoint, the running mins must merge
    // (a user whose purchase arrives in batch 2 flips to converted)
    val second = events.filter(col("event_id") % 2 === 1)
    second.write.mode("append").parquet(streamDir)
    val q2 = StreamingFeatures.maintainFunnelState(stream, store, "funnel", ckpt)
    assert(q2.awaitTermination(120000), "second run timed out")
    assert(rows(store.readTable("funnel")) == rows(batchFunnel(events)),
      "streaming funnel state != batch funnel over all data")
  }

  test("maintainSketchState: streaming sketches equal batch sketches across micro-batches") {
    import graft.functions.SketchAggregates
    import spark.implicits._
    val events = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val first = events.filter(col("event_id") % 2 === 0)
    val streamDir = Files.createTempDirectory("graft-sketch-in-").toString
    first.write.mode("overwrite").parquet(streamDir)

    val schema = spark.read.parquet(streamDir).schema
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    def batchSketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type")).agg(
        SketchAggregates.kmvDistinct(col("user_id")).as("distinct_est"),
        SketchAggregates.cmTopK(col("user_id").cast("string"), 5).as("top_items"))

    val store = FeatureStore.temp(spark)
    store.createTable(FeatureTableSpec("sketches", Seq("event_type"),
      batchSketch(events).schema, "running per-type sketch state"))
    val ckpt = Files.createTempDirectory("graft-sketch-ck-").toString

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("distinct_est"),
        to_json(col("top_items")).as("top"))
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq

    val q1 = StreamingFeatures.maintainSketchState(stream, store, "sketches",
      Seq("event_type"), "user_id", "user_id", 5, ckpt)
    assert(q1.awaitTermination(120000), "first run timed out")
    assert(rows(store.readTable("sketches")) == rows(batchSketch(first)))

    // second micro-batch: the state-store sketches must MERGE, landing
    // on the same summaries a batch pass over all data computes
    val second = events.filter(col("event_id") % 2 === 1)
    second.write.mode("append").parquet(streamDir)
    val q2 = StreamingFeatures.maintainSketchState(stream, store, "sketches",
      Seq("event_type"), "user_id", "user_id", 5, ckpt)
    assert(q2.awaitTermination(120000), "second run timed out")
    assert(rows(store.readTable("sketches")) == rows(batchSketch(events)),
      "streaming sketch state != batch sketches over all data")
  }

  test("guarded refresh merges clean rows and quarantines violations with reasons") {
    import graft.operators.Expectations._
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp")).limit(300)
    val streamDir = Files.createTempDirectory("graft-guard-in-").toString
    events.write.mode("overwrite").parquet(streamDir)

    val schema = spark.read.parquet(streamDir).schema
    val stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
      .select("event_id", "user_id", "event_type", "value")

    val cap = 100.0 // low cap so real violations exist in the fixture
    val checks = Seq(NotNull("user_id"), InRange("value", 0, cap))
    val store = FeatureStore.temp(spark)
    val rowSchema = spark.read.parquet(streamDir)
      .select("event_id", "user_id", "event_type", "value").schema
    store.createTable(FeatureTableSpec("clean_events", Seq("event_id"),
      rowSchema, "guarded ingest: clean rows"))
    store.createTable(FeatureTableSpec("quarantined_events", Seq("event_id"),
      rowSchema.add("violations", "string"), "guarded ingest: quarantine"))

    val q = StreamingFeatures.refreshFeatureTableGuarded(stream, store,
      "clean_events", checks, "quarantined_events",
      Files.createTempDirectory("graft-guard-ck-").toString)
    assert(q.awaitTermination(120000), "guarded refresh timed out")

    val clean = store.readTable("clean_events")
    val bad = store.readTable("quarantined_events")
    // oracle over the WRITTEN fixture, not the unordered limit() plan
    // (re-executing limit(300) has no determinism guarantee), with the
    // full InRange predicate (both bounds)
    val staged = spark.read.parquet(streamDir)
    val rangeBad = col("value").isNotNull && (col("value") < 0 || col("value") > cap)
    val expectedBad = staged.filter(rangeBad || col("user_id").isNull).count()
    assert(bad.count() == expectedBad && expectedBad > 0,
      s"quarantine has ${bad.count()}, expected $expectedBad")
    assert(clean.count() + bad.count() == 300)
    assert(clean.agg(max(col("value"))).collect()(0).getDouble(0) <= cap)
    assert(bad.filter(col("violations").contains("in_range(value,0.0,100.0)")).count()
      == staged.filter(rangeBad).count())
  }

  test("maintained DSIR buckets: state-derived scores equal batch across micro-batches") {
    import graft.ext.TextAnalysis
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-dsir-in-").toString
    first.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    import org.apache.spark.sql.types._
    store.createTable(FeatureTableSpec("dsir_buckets", Seq("bucket"),
      StructType(Seq(StructField("bucket", StringType),
        StructField("n_raw", LongType), StructField("n_target", LongType)))))
    val ckpt = Files.createTempDirectory("graft-dsir-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    val pred = col("lang") === "en"

    assert(StreamingFeatures.maintainDsirBuckets(stream, store, "dsir_buckets",
      "text", pred, ckpt).awaitTermination(120000), "first run timed out")
    // mid-stream state equals the batch bucket counts over batch 1
    def buckets(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(buckets(store.readTable("dsir_buckets")) ===
      buckets(TextAnalysis.dsirBucketCounts(first, "text", pred)))

    second.write.mode("append").parquet(streamDir)
    assert(StreamingFeatures.maintainDsirBuckets(stream, store, "dsir_buckets",
      "text", pred, ckpt).awaitTermination(120000), "second run timed out")

    // scoring the full corpus against the MAINTAINED model == batch op
    def scores(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val fromState = TextAnalysis.hashedImportanceScoresWithStats(
      docs, "doc_id", "text", store.readTable("dsir_buckets"))
    val batch = TextAnalysis.hashedImportanceScores(docs, "doc_id", "text", pred)
    assert(scores(fromState) === scores(batch),
      "state-derived DSIR scores != batch scores over the same corpus")
  }

  test("maintained bigram-LM counts: state-derived scores equal batch across micro-batches") {
    import graft.ext.TextAnalysis
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-lm2-in-").toString
    first.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    import org.apache.spark.sql.types._
    store.createTable(FeatureTableSpec("term_counts", Seq("term"), StructType(
      Seq(StructField("term", StringType), StructField("cnt", LongType)))))
    store.createTable(FeatureTableSpec("bigram_counts", Seq("prev", "cur"),
      StructType(Seq(StructField("prev", StringType),
        StructField("cur", StringType), StructField("cnt", LongType)))))
    val ck1 = Files.createTempDirectory("graft-lm2-ck1-").toString
    val ck2 = Files.createTempDirectory("graft-lm2-ck2-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)

    assert(StreamingFeatures.maintainTermCounts(stream, store, "term_counts",
      "text", ck1).awaitTermination(120000))
    assert(StreamingFeatures.maintainBigramCounts(stream, store,
      "bigram_counts", "text", ck2).awaitTermination(120000))
    second.write.mode("append").parquet(streamDir)
    assert(StreamingFeatures.maintainTermCounts(stream, store, "term_counts",
      "text", ck1).awaitTermination(120000))
    assert(StreamingFeatures.maintainBigramCounts(stream, store,
      "bigram_counts", "text", ck2).awaitTermination(120000))

    // the running pair counts merged exactly (spot-check vs batch)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(pairs(store.readTable("bigram_counts")) ===
      pairs(TextAnalysis.bigramPairCounts(docs, "text")))

    def scores(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val fromState = TextAnalysis.bigramLmScoresWithStats(docs, "doc_id",
      "text", store.readTable("term_counts"), store.readTable("bigram_counts"))
    val batch = TextAnalysis.bigramLmScores(docs, "doc_id", "text")
    assert(scores(fromState) === scores(batch),
      "state-derived bigram-LM scores != batch scores over the same corpus")
  }

  test("maintained daily value sums: state-derived decay equals batch across micro-batches") {
    import graft.operators.Decay
    val events = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "value")
    val first = events.filter(col("event_id") % 2 === 0)
    val second = events.filter(col("event_id") % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-decay-in-").toString
    first.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    import org.apache.spark.sql.types._
    store.createTable(FeatureTableSpec("daily_sums", Seq("user_id", "day_us"),
      StructType(Seq(StructField("user_id", LongType),
        StructField("day_us", LongType), StructField("n_events", LongType),
        StructField("sum_vq", LongType)))))
    val ckpt = Files.createTempDirectory("graft-decay-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)

    assert(StreamingFeatures.maintainDailyValueSums(stream, store,
      "daily_sums", "user_id", "ts", "value", ckpt).awaitTermination(120000))
    second.write.mode("append").parquet(streamDir)
    assert(StreamingFeatures.maintainDailyValueSums(stream, store,
      "daily_sums", "user_id", "ts", "value", ckpt).awaitTermination(120000))

    // the maintained (user, day) sums merged exactly across batches
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "day_us", "n_events", "sum_vq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(store.readTable("daily_sums")) ===
      rows(Decay.dailySums(events, "user_id", "ts", "value")))

    // decay applied to the maintained state == the batch operator
    def scores(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val fromState = Decay.decayedFromDailySums(
      store.readTable("daily_sums"), "user_id",
      maxAgeDays = 30, halfLifeDays = 7)
    val batch = Decay.decayedDailySumQuantized(events, "user_id", "ts",
      "value", maxAgeDays = 30, halfLifeDays = 7)
    assert(scores(fromState) === scores(batch),
      "state-derived decayed sums != batch decayed sums")
  }

  test("maintained daily value sums, bounded mode: watermarked day windows match batch when data is in-bound") {
    import graft.operators.Decay
    val events = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "value")
    val streamDir = Files.createTempDirectory("graft-decayw-in-").toString
    events.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val store = FeatureStore.temp(spark)
    import org.apache.spark.sql.types._
    store.createTable(FeatureTableSpec("daily_sums_w", Seq("user_id", "day_us"),
      StructType(Seq(StructField("user_id", LongType),
        StructField("day_us", LongType), StructField("n_events", LongType),
        StructField("sum_vq", LongType)))))
    val ckpt = Files.createTempDirectory("graft-decayw-ck-").toString
    val stream = StreamingFeatures.readEventStream(spark, streamDir, schema)

    // a single batch never trails its own watermark, so bounded mode
    // must reproduce the exact batch sums — this pins that the
    // window(ts, "1 day") group key buckets identically to
    // date_trunc("day") (both UTC-day aligned)
    assert(StreamingFeatures.maintainDailyValueSums(stream, store,
      "daily_sums_w", "user_id", "ts", "value", ckpt,
      watermarkDelay = Some("25 hours")).awaitTermination(120000))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "day_us", "n_events", "sum_vq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(store.readTable("daily_sums_w")) ===
      rows(Decay.dailySums(events, "user_id", "ts", "value")))
  }

  test("maintainDupComponents: incremental labels across micro-batches equal batch CC") {
    import graft.ext.{Components, Similarity}
    // the REAL dup graph: exact cosine pairs over the embeddings
    // fixture, split by parity into two deltas arriving as separate
    // micro-batches
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val pairs = Similarity.cosineAllPairsTiled(emb, threshold = 0.4)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val first = pairs.filter((col("src") + col("dst")) % 2 === 0)
    val second = pairs.filter((col("src") + col("dst")) % 2 === 1)
    val streamDir = Files.createTempDirectory("graft-dupcc-in-").toString
    first.write.mode("overwrite").parquet(streamDir)

    val store = FeatureStore.temp(spark)
    import org.apache.spark.sql.types._
    store.createTable(FeatureTableSpec("dup_labels", Seq("node"),
      StructType(Seq(StructField("node", LongType),
        StructField("component", LongType)))))
    val ckpt = Files.createTempDirectory("graft-dupcc-ck-").toString
    val schema = spark.read.parquet(streamDir).schema
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)

    assert(StreamingFeatures.maintainDupComponents(stream, store,
      "dup_labels", ckpt).awaitTermination(120000))
    second.write.mode("append").parquet(streamDir)
    assert(StreamingFeatures.maintainDupComponents(stream, store,
      "dup_labels", ckpt).awaitTermination(120000))

    def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("node", "component").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(store.readTable("dup_labels")) ===
      labels(Components.connectedComponents(pairs)),
      "maintained labels != batch CC over the full pair set")

    // ...and retention SERVED from the maintained table equals the
    // full-recompute retention — the streaming half of the q152
    // contract: min-id survivors off incremental labels, singletons
    // (absent from the labeling) surviving by construction
    val dropped = store.readTable("dup_labels")
      .filter(col("node") =!= col("component"))
      .select(col("node").as("_drop_id"))
    val served = emb.join(dropped, col("vec_id") === col("_drop_id"), "left_anti")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val batch = graft.ext.Dedup.retainFromPairs(emb, pairs, "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(served === batch,
      "retention over maintained labels != full-recompute retention")
  }

  test("maintainIvfIndex: streamed appends answer like a same-centroid batch rewrite") {
    import graft.ext.Similarity
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 === 0)
    val delta = emb.filter(col("vec_id") % 3 =!= 0)
    val idxDir = Files.createTempDirectory("graft-ivfstream-idx-").toString
    Similarity.ivfIndexWrite(base, idxDir, nlist = 8)

    // the delta arrives as TWO micro-batches through the maintainer
    val streamDir = Files.createTempDirectory("graft-ivfstream-in-").toString
    delta.filter(col("vec_id") % 3 === 1).select("vec_id", "embedding")
      .write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val ckpt = Files.createTempDirectory("graft-ivfstream-ck-").toString
    def stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    assert(StreamingFeatures.maintainIvfIndex(stream, idxDir, ckpt)
      .awaitTermination(120000))
    delta.filter(col("vec_id") % 3 === 2).select("vec_id", "embedding")
      .write.mode("append").parquet(streamDir)
    assert(StreamingFeatures.maintainIvfIndex(stream, idxDir, ckpt)
      .awaitTermination(120000))

    // reference: one-shot write of the full corpus under the SAME
    // frozen centroids
    val cents = spark.read.parquet(s"$idxDir/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)
    val refDir = Files.createTempDirectory("graft-ivfstream-ref-").toString
    Similarity.ivfIndexWriteWithCentroids(emb, refDir, cents)
    val q = emb.filter(col("vec_id").isin(0L, 5L, 11L))
    def probe(dir: String) =
      Similarity.ivfIndexedTopK(spark, dir, q, k = 5, nprobe = 3)
        .orderBy("query_id", "rank").collect().toSeq
    assert(probe(idxDir) == probe(refDir),
      "streamed index answers differently from the batch rewrite")
  }

  test("maintainDailyValueSums: bounded mode requires a UTC session time zone") {
    // bounded mode's day window is epoch-aligned while exact mode's
    // date_trunc follows the session zone — a non-UTC session would
    // silently break exact == bounded parity, so it must fail fast
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp")).limit(10)
    val streamDir = Files.createTempDirectory("graft-tz-in-").toString
    events.write.mode("overwrite").parquet(streamDir)
    val schema = spark.read.parquet(streamDir).schema
    val stream = StreamingFeatures.readEventStream(spark, streamDir, schema)
    val store = FeatureStore.temp(spark)
    val ckpt = Files.createTempDirectory("graft-tz-ck-").toString
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        StreamingFeatures.maintainDailyValueSums(stream, store, "tz_sums",
          "user_id", "ts", "value", ckpt, watermarkDelay = Some("25 hours"))
      }
      assert(e.getMessage.contains("UTC"), e.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
