package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 gates. Each query sits next to its DuckDB oracle (trait
  * pair discipline, VERDICT r9 #4).
  */
private[graft] trait PipelinesRound13 { this: PipelinesBase =>

  /** Stream-stream interval join as a hash gate (r12 verdict ask #4 —
    * the THIRD real streaming tier made driver-visible, after q184's
    * flatMapGroupsWithState and q195's watermarked window agg):
    * purchases and clicks read as TWO file-source streams off the
    * staged events fixture, joined per user on
    * click.ts ∈ [purchase.ts, purchase.ts + 1 day) through
    * [[graft.streaming.StreamJoins.intervalJoin]] — Spark's
    * symmetric-hash stream-stream join, watermarks on BOTH sides —
    * run to completion with Trigger.AvailableNow into a memory sink.
    *
    * Determinism under arbitrary file/micro-batch order: an INNER
    * stream-stream join emits each pair in whatever micro-batch sees
    * its second member, so the emitted SET is order-independent as
    * long as the watermark never overtakes a pending match — the
    * 40-day delay clears the fixture's whole 30-day span. The DuckDB
    * oracle replays the identical interval join as batch SQL; dt_us
    * is an exact integer epoch difference, so the driver hashes every
    * joined pair.
    */
  def streamIntervalJoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = t(s, d, "events").schema
    val streamDir = PipelinesTextSim.stagedStreamDir(d, "events.parquet")
    // def, not val: two INDEPENDENT readStream lineages — a shared one
    // would trip DetectAmbiguousSelfJoin on the key equality
    def src = s.readStream.schema(schema).parquet(streamDir)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").cast("timestamp").as("p_ts"))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").cast("timestamp").as("c_ts"))
    val joined = graft.streaming.StreamJoins.intervalJoin(purchases, clicks,
      keyCol = "user_id", leftTsCol = "p_ts", rightTsCol = "c_ts",
      window = "1 day", watermarkDelay = "40 days")
    val qname = "graft_stream_ivj_" +
      PipelinesTextSim.streamGateRuns.incrementAndGet()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-q197-ck-").toString
    val query = joined.writeStream.format("memory").queryName(qname)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    // materialize off the memory sink, then DROP it and the checkpoint
    // (the q195 scratch discipline — Bench runs every gate twice)
    val out = s.table(qname)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("p_ts"))).as("dt_us"))
      .orderBy("purchase_id", "click_id")
      .localCheckpoint(true)
    s.catalog.dropTempView(qname)
    PipelinesRound12.deleteRecursively(java.nio.file.Paths.get(ckpt))
    out
  }
}

private[graft] trait OraclesRound13 { this: OracleSnippets =>
  protected def sqlRound13: Map[String, String] = Map(

    // the batch replay of the streaming interval join: same key
    // equality, same half-open [p_ts, p_ts + 1 day) band, exact
    // integer micros difference
    "q197_stream_interval_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS click_id, ts AS c_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT p.user_id, purchase_id, click_id,
        |  epoch_us(c_ts) - epoch_us(p_ts) AS dt_us
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c_ts >= p_ts AND c_ts < p_ts + INTERVAL 1 DAY
        |ORDER BY purchase_id, click_id""".stripMargin
  )
}
