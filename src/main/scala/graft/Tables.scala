package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-materialized parquet tables (TESTDATA.md).
  * One parquet file per table under `$dir/` — the engine treats these as
  * its "raw tables" (SURVEY.md §1.1: raw table ≈ catalog table; here a
  * parquet path). At 100 TB these would be multi-file partitioned
  * directories; `spark.read.parquet` handles both identically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

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
