package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-materialized parquet tables (TESTDATA.md).
  * One parquet file per table under `$dir/` — the engine treats these as
  * its "raw tables" (SURVEY.md §1.1: raw table ≈ catalog table; here a
  * parquet path). At 100 TB these would be multi-file partitioned
  * directories; `spark.read.parquet` handles both identically.
  */
object Tables {

  // JVM-global, idempotent: ImageIO's default temp-FILE stream cache
  // serializes parallel image encodes on the temp directory (see
  // graft.ext.Multimodal's object note for the measurement); memory
  // caching is byte-identical. Set here too because the image-fixture
  // gates (q214/q215 BMP encodes) build payloads in closures that
  // may run before any Multimodal reference loads that object.
  javax.imageio.ImageIO.setUseCache(false)

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** High-cardinality unique key per table, used by the scan spread
    * (below) so the repartition is a deterministic hash exchange —
    * never round-robin, whose sort-before-repartition pays a local
    * sort of the whole input (guide §2.5) and whose output depends on
    * input order. nation/region are deliberately absent: 5/25-row
    * broadcast-side tables gain nothing from parallelism.
    */
  private val spreadKeys: Map[String, String] = Map(
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** Scan partition count of the bare table read, memoized per
    * (dir, name): the probe plans a trivial FileSourceScan (no job
    * runs) and is metadata, not data — safe to keep across bench
    * passes.
    */
  private val scanPartsMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Integer]()

  /** Scale-adaptive scan spread (optimization guide §2.5 "input skew:
    * one huge unsplittable file — repartition immediately after the
    * read"). The driver's testdata tables are ONE parquet file with
    * ONE row group each, so every expression Catalyst fuses into the
    * scan stage — per-row projection, codec decode, n-gram explode,
    * map-side partial aggregation — ran on a single task regardless
    * of core count. A deterministic hash repartition on the table's
    * unique key spreads that first stage across the session's
    * parallelism for the price of shuffling the (tiny relative to the
    * compute) base bytes once.
    *
    * OPT-IN, not blanket (measured this round): every task pays a
    * fixed cost roughly proportional to the serialized plan subtree
    * it executes (task-binary Java deserialization, hash-agg map
    * allocation/zeroing, JIT-cold generated code — JFR-profiled), so
    * spreading a light query multiplies that fixed cost by the task
    * count for no amortizing per-row work. A blanket spread inflated
    * the full-board bench 380 s → 495 s wall / 566 s → 3 889 s CPU;
    * only queries whose scan-stage per-row compute dominates (the
    * wall ≈ cpu serial family) opt in via [[loadSpread]].
    *
    * Scale honesty: the spread only fires when the scan's own
    * partition count is BELOW the target — at 100 TB a table scan has
    * thousands of splits and this is a no-op, so nothing here is
    * tuned to local[32]. The target derives from the session's
    * default parallelism (`spark.graft.scan.spread.parts` overrides
    * for A/B measurement; `spark.graft.scan.spread=false` disables).
    */
  private def spread(spark: SparkSession, dir: String, name: String,
      df: DataFrame): DataFrame = {
    val dflt = sys.env.getOrElse("SPARK_GRAFT_SCAN_SPREAD", "true")
    if (!spark.conf.get("spark.graft.scan.spread", dflt).toBoolean)
      return df
    spreadKeys.get(name) match {
      case None => df
      case Some(key) =>
        // default: parallelism/4, floored at 4 — measured sweet spot
        // (q290 at 8/16/32 parts: warm wall 2.9/3.1/4.6 s, cpu
        // 4.5/5.7/8.0 s): enough fan-out to break the serial scan,
        // few enough tasks that the per-task fixed cost stays small;
        // scales DOWN with the session's cores so the low-core bench
        // run is not taxed 32 fixed costs per stage
        val target = spark.conf.getOption("spark.graft.scan.spread.parts")
          .orElse(sys.env.get("SPARK_GRAFT_SCAN_SPREAD_PARTS"))
          .map(_.toInt)
          .getOrElse(math.max(4, spark.sparkContext.defaultParallelism / 4))
        val parts = scanPartsMemo.computeIfAbsent((dir, name),
          _ => Integer.valueOf(df.rdd.getNumPartitions))
        if (parts >= target) df
        else df.repartition(target, org.apache.spark.sql.functions.col(key))
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** [[load]] + the opt-in scan [[spread]] — for query paths whose
    * scan-stage per-row compute is heavy enough to amortize the
    * per-task fixed costs the spread multiplies (see [[spread]]).
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    spread(spark, dir, name, load(spark, dir, name))

  /** `events.ts` has shipped in two physical layouts across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects (PARQUET_TYPE_ILLEGAL) unless read as long via the
    * `nanosAsLong` legacy conf — and plain TIMESTAMP(MICROS), which
    * Spark reads natively. Normalize BY OBSERVED TYPE so either layout
    * yields the same `timestamp_ntz` column (matching how DuckDB sees
    * the data, truncated to micros):
    *   - LongType (nanos-as-long): integer-divide to micros (plain `/`
    *     would go through double and lose precision at ~1.7e18 ns).
    *   - any timestamp type: cast straight to timestamp_ntz.
    *
    * Known side effect of the nanos path: `nanosAsLong` is a SESSION
    * conf (there is no per-read option), and it must stay set for the
    * lifetime of the returned lazy DataFrame, so it is set and left on.
    * For this engine that's benign — `events` is the only NANOS table —
    * but other NANOS parquet read after this call would surface as
    * LongType instead of erroring.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case LongType => expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
      case _        => expr("cast(ts as timestamp_ntz)")
    }
    raw.withColumn("ts", ts)
  }

  /** Register every table as a temp view (K1) so spark.sql queries work. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
