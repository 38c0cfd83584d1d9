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

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long, then
    * integer-divide to micros (plain `/` would go through double and lose
    * precision at ~1.7e18 ns) and convert to timestamp_ntz to match how
    * Spark reads the other tables' micro timestamps (and how DuckDB sees
    * them, truncated to micros).
    *
    * Known side effect: `nanosAsLong` is a SESSION conf (there is no
    * per-read option), and it must stay set for the lifetime of the
    * returned lazy DataFrame, so it is set and left on. For this engine
    * that's benign — `events` is the only NANOS table — but other NANOS
    * parquet read after this call would surface as LongType instead of
    * erroring.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }

  /** Register every table as a temp view (K1) so spark.sql queries work. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
