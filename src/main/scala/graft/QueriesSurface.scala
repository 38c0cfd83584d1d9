package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.etl.Features
import graft.ext.{Chunking, Components, Dedup, Pq, Similarity, TextAnalysis}
import graft.fs.{FeatureTableSpec, PointInTime, WriteMode}

/** Gate queries — reference-surface completion: U1 per-row counts, summary
  * stats, events window/json ops, SQL/catalog/online surfaces,
  * point-in-time training sets, sampling splits, CSV ingest.
  *
  * Mixed into [[PipelinesExt]]; the sibling [[OraclesSurface]]
  * (own file since r13 — this one hit the 700-line split bound)
  * keeps each query's DuckDB oracle SQL adjacent.
  */
private[graft] trait PipelinesSurface { this: PipelinesBase =>

  // U1 pattern — per-row count of "Yes"-valued string columns across a
  // row (pandas_udf FS:413-416 rewritten as a codegen'd expression).
  def numOptionalServices(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .withColumn("svc_open", when(col("o_orderstatus") === "O", "Yes").otherwise("No"))
      .withColumn("svc_urgent", when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "Yes").otherwise("No"))
      .withColumn("svc_big", when(col("o_totalprice") > 200000, "Yes").otherwise("No"))
      .select(col("o_orderkey"),
        Features.numOptionalServices(Seq("svc_open", "svc_urgent", "svc_big"))
          .as("num_optional_services"))
      .orderBy("o_orderkey")

  // A1 — summary() parity with exact aggregates (SURVEY.md §5.3: the
  // built-in summary() uses approx percentiles, so the checked variant
  // recomputes count/mean/min/max/stddev from exact decimal sums).
  def summaryStats(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    def statsFor(c: String): DataFrame = {
      val dec = col(c).cast(DecimalType(18, 2))
      li.agg(
        count(lit(1)).as("n_rows"),
        sum(dec).cast("double").as("sum_val"),
        min(col(c)).as("min_val"),
        max(col(c)).as("max_val"),
        sum((dec * dec).cast(DecimalType(38, 4))).cast("double").as("_sumsq"))
        .select(
          lit(c).as("column_name"), col("n_rows"), col("sum_val"),
          (col("sum_val") / col("n_rows")).as("mean_val"),
          col("min_val"), col("max_val"),
          sqrt((col("_sumsq") - col("sum_val") * col("sum_val") / col("n_rows"))
            / (col("n_rows") - 1)).as("stddev_val"))
    }
    Seq("l_quantity", "l_extendedprice", "l_discount").map(statsFor)
      .reduce(_.union(_)).orderBy("column_name")
  }

  // window dedup — latest event per (user, event_type) via row_number.
  def windowDedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, d, "events")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      .orderBy("user_id", "event_type")
  }

  // JSON extraction from the events.props payload column.
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy("event_id")

  // tumbling-window aggregation (batch analog of the streaming feature
  // refresh in graft.streaming — same groupBy plan).
  def eventWindowAgg(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(unix_micros(col("hour_ts").cast("timestamp")).as("hour_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("hour_us", "event_type")

  // S3 — SQL-text entry point over registered temp views (K1): the
  // reference drives everything through spark.sql names
  // (FS:73 `SELECT * FROM {db}.{table}`); here a TPC-H Q5-shaped
  // multi-join aggregate so Catalyst's join reorder + broadcast
  // selection are exercised through the SQL path too.
  def sqlRevenuePerNation(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lineitems
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin)
  }

  // J2 — keyed inner-join export (FS:499 AutoML-table export shape).
  def exportJoin(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(Features.orderFeatures(t(s, d, "orders")), Seq("c_custkey"), "inner")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_orders"), col("total_spent"))
      .orderBy("c_custkey")

  // K2/K3/K8/K9/S4/A2 — catalog DDL surface: database + CTAS-as-parquet
  // saveAsTable + spark.table read-back + cache (the reference's
  // setup.py:190-247 lifecycle, Delta swapped for parquet per §7.4).
  def catalogOps(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    // Explicit throwaway locations: the default spark-warehouse dir
    // outlives the (in-memory) metastore across sessions, so a managed
    // CTAS would hit LOCATION_ALREADY_EXISTS on the second run.
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse-")
    s.sql(s"CREATE DATABASE IF NOT EXISTS graft_db LOCATION '$wh/graft_db'")
    s.sql("DROP TABLE IF EXISTS graft_db.customer_snapshot")
    s.sql(
      s"""CREATE TABLE graft_db.customer_snapshot USING PARQUET
         |LOCATION '$wh/customer_snapshot' AS
         |SELECT c_custkey, c_name, c_mktsegment FROM customer""".stripMargin)
    s.table("graft_db.customer_snapshot").cache().orderBy("c_custkey")
  }

  // K7 — publish to the online store and read the snapshot back.
  def publishOnline(s: SparkSession, d: String): DataFrame = {
    val store = Pipelines.buildStore(s, d)
    store.publishTable("order_features")
    store.readOnlineTable("order_features").orderBy("c_custkey")
  }

  // K7-serve — point lookups against the published snapshot: the
  // key-manifest prunes the read to the range files containing the
  // requested keys (FeatureStoreSpec asserts the file count); the
  // oracle recomputes the same rows from orders directly.
  def onlineLookup(s: SparkSession, d: String): DataFrame = {
    val store = Pipelines.buildStore(s, d)
    store.publishTable("order_features")
    store.lookupOnline("order_features", (1L to 50L))
      .orderBy("c_custkey")
  }

  // J3-PIT — point-in-time training set: spine = purchase events, time-
  // versioned feature table = per-(user, day) event counts written
  // through the store with (user_id, day_ts) keys; each spine row gets
  // the latest daily feature at-or-before its timestamp (Databricks
  // timestamp_lookup_key semantics; DuckDB checks it with ASOF JOIN).
  def pitTrainingSet(s: SparkSession, d: String): DataFrame = {
    val events = t(s, d, "events")
    val daily = events
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day_ts"))
      .agg(count(lit(1)).as("day_events"))
    val store = fsTempStoreFor(s, d)
    if (!store.tableExists("user_daily_features")) {
      store.createTable(FeatureTableSpec("user_daily_features",
        Seq("user_id", "day_ts"), daily.schema, "time-versioned daily user features"))
      store.writeTable("user_daily_features", daily, WriteMode.Overwrite)
    }
    val spine = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    PointInTime.createTrainingSet(store, spine, "user_daily_features",
      featureCols = Seq("day_events"), spineTs = "ts", featTs = "day_ts")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("value"), col("day_events"))
      .orderBy("event_id")
  }

  // Forward PIT — label attachment: each purchase gets the EARLIEST
  // daily aggregate at-or-after its timestamp ("outcome window"), the
  // mirror of q33's backward feature lookup. DuckDB checks it with a
  // forward ASOF JOIN (s.ts <= d.day_ts).
  def pitForwardLabels(s: SparkSession, d: String): DataFrame = {
    val events = t(s, d, "events")
    val daily = events
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day_ts"))
      .agg(count(lit(1)).as("day_events"))
    val spine = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    PointInTime.asOfJoinForward(spine, daily, keys = Seq("user_id"),
      spineTs = "ts", featTs = "day_ts", featureCols = Seq("day_events"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("value"), col("day_events"))
      .orderBy("event_id")
  }

  // multimodal plumbing — binary payload synthesized from text, decoded
  // by the stubbed mapPartitions pass; only the portable byte count is
  // oracle-checked (intensity stats are spec-tested).
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import graft.ext.Multimodal
    Multimodal.extractFeatures(Multimodal.fromText(t(s, d, "documents")))
      .toDF()
      .select(col("media_id"), col("n_bytes"))
      .orderBy("media_id")
  }

  /** End-to-end MJPEG-in-AVI video frame sampling as a hash gate
    * (r12): per doc, a deterministic container of (doc_id % 5) + 1
    * solid-color JPEG frames is assembled (ImageIO encode, RIFF
    * writer), run through [[graft.ext.Multimodal.sampleVideoFrames]]
    * (RIFF parse → keep every 2nd frame → re-assemble), and the gate
    * hashes the PORTABLE fact: frames_kept = ceil(n/2), which the
    * oracle recomputes from doc_id arithmetic. JPEG bytes themselves
    * never cross to the oracle (encoder output is JRE-specific);
    * byte-exactness of the sampler is MultimodalSpec's round-trip pin.
    * One narrow mapPartitions pass each way — no shuffle.
    */
  def videoFrameSample(s: SparkSession, d: String): DataFrame = {
    import graft.ext.Multimodal
    import s.implicits._
    val media = tSpread(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        // memory-cache ImageIO streams before the first encode: the
        // default temp-FILE cache serializes parallel tasks on the
        // temp dir (see graft.ext.Multimodal's object note)
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val n = (id % 5 + 1).toInt
          val frames = (0 until n).map { i =>
            val img = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = ((id * 31 + i) & 0xFFFFFF).toInt
            (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, rgb)))
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", bos)
            bos.toByteArray
          }
          (id, Multimodal.aviFromJpegFrames(frames, 8, 8))
        }
      }
      .toDF("media_id", "payload")
    // no input meta: sampleVideoFrames consumes only (media_id,
    // payload) and rebuilds meta from the SAMPLED container's RIFF
    // re-parse — frames_kept comes from that re-parse, not from the
    // synthesized frame count (r12 review: a decorative input struct
    // here misread as feeding the output)
    Multimodal.sampleVideoFrames(media, everyK = 2)
      .select(col("media_id"), col("meta.n_frames").as("frames_kept"))
      .orderBy("media_id")
  }

  // gap-based batch sessionization (4h gap) — ANSI-portable windows.
  def sessionize(s: SparkSession, d: String): DataFrame =
    graft.streaming.Sessionize.batch(t(s, d, "events"), gapMicros = 4L * 3600 * 1000000)
      .orderBy("user_id", "session_id")

  // IVF ANN as an INVARIANT gate (r12; centroids aren't
  // SQL-expressible): k distinct neighbors, dense ranks, true cosines
  // bounded by the exact top-1, corpus recall@5 over the
  // AnnRecallGateSpec floor — all hashed by the driver.
  def ivfAnn(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    annInvariantGate(
      Similarity.ivfTopK(emb, q, k = 5),
      annExactTop5(s, d),
      k = 5, recallFloor = Some(0.45))
  }

  // salted skew join: events (probe) ⋈ customer (build, replicated ×8)
  // on the user key; the salt never leaks into results, so the oracle
  // is the plain join.
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val probe = t(s, d, "events").withColumnRenamed("user_id", "c_custkey")
    val build = t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
    graft.operators.SkewJoin.saltedJoin(probe, build, "c_custkey", salts = 8)
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .orderBy("c_custkey")
  }

  // exact distinct aggregation (expand + two-phase agg under the hood).
  def distinctCounts(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  // ROLLUP grouping sets — subtotals + grand total with NULL markers.
  def rollupSummary(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  // CUBE grouping sets — all 4 grouping combinations in one pass.
  def cubeSummary(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  // set operations: union / intersect / except between order-key slices.
  def setOps(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val both = urgent.intersect(open).withColumn("set_op", lit("intersect"))
    val onlyUrgent = urgent.except(open).withColumn("set_op", lit("except"))
    both.unionByName(onlyUrgent)
      .groupBy(col("set_op")).agg(count(lit(1)).as("n_custs"))
      .orderBy("set_op")
  }

  // exact percentiles (extends A1 beyond the §5.3 approx-percentile
  // caveat: Spark `percentile` and DuckDB `quantile_cont` both do
  // linear interpolation over the same exact doubles). Scale note:
  // exact percentile buffers each group's values — fine for the 6-group
  // key here at any row count, but for high-cardinality groups at
  // 100 TB use approx_percentile (t-digest, bounded memory) and accept
  // the §5.3 non-portability.
  def percentiles(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("qty_p25"),
        expr("percentile(l_quantity, 0.5)").as("qty_p50"),
        expr("percentile(l_quantity, 0.75)").as("qty_p75"),
        expr("percentile(l_extendedprice, 0.5)").as("price_p50"))
      .orderBy("l_returnflag")

  // TF-IDF term statistics over documents (explode → two-level agg →
  // join); idf as exact integer ratio, log left to callers (libm
  // portability, see TextAnalysis.termStats).
  def termStats(s: SparkSession, d: String): DataFrame =
    TextAnalysis.termStats(t(s, d, "documents"), "text", "doc_id")
      .orderBy("doc_id", "term")

  // deterministic train/test split via the md5 bucket labeller
  // (Sampling.hashSplit) — engine-portable, so the split SET, not
  // just the per-side sizes, is hash-gated against DuckDB replaying
  // the same md5-threshold arithmetic (the q98/q103 discipline). The
  // xxhash64 variant (Splits.hashSplit) keeps its spec coverage; it
  // trades portability for a cheaper hash.
  def trainTestSplit(s: SparkSession, d: String): DataFrame = {
    val customer = t(s, d, "customer")
    graft.etl.Sampling.hashSplit(customer, col("c_custkey"),
      Seq("train" -> 0.8, "test" -> 0.2), labelCol = "side")
      .select(col("c_custkey"), col("side"))
      .orderBy("c_custkey")
  }

  // S1 — CSV ingest through the real reader path: materialize the
  // customer slice as CSV (the fixture the reference ships as
  // Telco-Customer-Churn.csv, setup.py:206-221), then
  // Cleanse.readCsv (header + schema inference) + recode/cast. The
  // oracle reads the SAME files via DuckDB read_csv_auto, so the
  // CSV parse itself is under cross-engine test. The dump path is a
  // pure function of the dataset dir (concurrent SF runs never
  // overwrite each other's fixture mid-oracle-read), and the oracle
  // SQL resolves it through the SF Verify pins in
  // [[PipelinesRound12.oracleDatasetDir]] — the same r13 fix as q196:
  // a query-run-recorded mutable path leaked the second SF's fixture
  // into the first SF's oracle when one process ran both.
  def csvFixturePathFor(d: String): String =
    "/tmp/graft_q44_csv_" + d.replaceAll("[^A-Za-z0-9.-]", "_")

  def csvIngest(s: SparkSession, d: String): DataFrame = {
    val fixture = csvFixturePathFor(d)
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .write.mode("overwrite").option("header", "true").csv(fixture)
    graft.etl.Cleanse.readCsv(s, fixture)
      .select(
        col("c_custkey").cast("long").as("c_custkey"),
        length(trim(col("c_name"))).as("name_len"),
        graft.etl.Cleanse.recode(col("c_mktsegment"),
          Seq("BUILDING" -> 1, "AUTOMOBILE" -> 2, "MACHINERY" -> 3)).as("segment_code"),
        col("c_acctbal").cast("double").as("acctbal"))
      .orderBy("c_custkey")
  }

  // A1 — the actual df.summary() API (Sean_Original.py:32) as an
  // INVARIANT gate (r12): percentile rows are approximate and every
  // cell is a formatted string, so the gate parses each cell back and
  // hashes BOOLEANS — exact rows (count/mean/stddev/min/max) must
  // match the exactly-computed aggregates (ulp tolerance on the
  // double-accumulated mean/stddev), percentile rows are checked
  // RANK-wise: the parsed cell's exact rank must sit inside a generous
  // q±0.03 band (summary()'s sketch has rank error 1e-4; an exact
  // percentile() comparator would sort-collect every value — 11 s at
  // sf0.1 where these hash aggs cost fractions of a second). The q153
  // gate hash-checks the exact rows verbatim; SummaryParitySpec keeps
  // the cell-level parity pins.
  def summaryParity(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val qrows = Seq("25" -> 0.25, "50" -> 0.50, "75" -> 0.75)
    val li = t(s, d, "lineitem").select(cols.map(col): _*)
    // 8 rows, consumed by BOTH the pct extraction and the final output
    // — without the checkpoint the approximate-percentile sweep over
    // lineitem runs twice per action (the shared-consumer lesson)
    val sm = li.summary().localCheckpoint(true)
    // the sketch's percentile answers, parsed back into ONE row
    val pctCols = for { c <- cols; (qn, _) <- qrows } yield
      max(when(col("summary") === s"$qn%", col(c).cast("double")))
        .as(s"_q${qn}_$c")
    val pcts = sm.agg(pctCols.head, pctCols.tail: _*)
    val stats = li.crossJoin(broadcast(pcts)).agg(
      count(lit(1)).as("_n"),
      cols.flatMap { c =>
        Seq(avg(col(c)).as(s"_mean_$c"),
          stddev_samp(col(c)).as(s"_sd_$c"),
          min(col(c)).as(s"_min_$c"), max(col(c)).as(s"_max_$c")) ++
        qrows.flatMap { case (qn, _) =>
          Seq(
            sum(when(col(c) <= col(s"_q${qn}_$c"), 1L).otherwise(0L))
              .as(s"_le${qn}_$c"),
            sum(when(col(c) < col(s"_q${qn}_$c"), 1L).otherwise(0L))
              .as(s"_lt${qn}_$c"))
        }
      }: _*)
    def ok(c: String): Column = {
      val v = col(c).cast("double")
      def near(target: Column) =
        abs(v - target) <= greatest(abs(target) * 1e-9, lit(1e-12))
      // duplicate-safe rank band: cnt(<= v) >= (q−δ)n AND cnt(< v) <= (q+δ)n
      def rankOk(qn: String, q: Double) =
        col(s"_le${qn}_$c") >= col("_n") * (q - 0.03) &&
          col(s"_lt${qn}_$c") <= col("_n") * (q + 0.03)
      when(col("summary") === "count", col(c).cast("long") === col("_n"))
        .when(col("summary") === "mean", near(col(s"_mean_$c")))
        .when(col("summary") === "stddev", near(col(s"_sd_$c")))
        .when(col("summary") === "min", v === col(s"_min_$c"))
        .when(col("summary") === "max", v === col(s"_max_$c"))
        .when(col("summary") === "25%", rankOk("25", 0.25))
        .when(col("summary") === "50%", rankOk("50", 0.50))
        .when(col("summary") === "75%", rankOk("75", 0.75))
    }
    sm.crossJoin(broadcast(stats))
      .select(col("summary"),
        ok("l_quantity").as("quantity_ok"),
        ok("l_extendedprice").as("extendedprice_ok"),
        ok("l_discount").as("discount_ok"))
      .orderBy("summary")
  }
}
