package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming LSH near-dup ≡ batch `Dedup.minhashPairs` on the same
  * corpus (same signatures, same banding — only the join is replaced by
  * bucket state).
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docsWithTs = {
    // planted-dup corpus (batch near-dup fixture): original docs at
    // t0, perturbed copies 5 minutes later — dup pairs always span
    // micro-batches when the source feeds one file per trigger
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    docs.select(col("doc_id"), col("text"), t0.as("ts"))
      .unionByName(docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s*", "").as("text"),
        (t0 + expr("INTERVAL 5 MINUTES")).as("ts")))
  }

  test("streaming near-dup pairs match batch minhashPairs across micro-batches") {
    val inDir = Files.createTempDirectory("graft-neardup-in-").toString
    // two files, fed one per trigger → originals land in state before
    // the perturbed copies arrive
    docsWithTs.filter(col("doc_id") < 1000000L).coalesce(1)
      .write.mode("overwrite").parquet(s"$inDir/batch0")
    docsWithTs.filter(col("doc_id") >= 1000000L).coalesce(1)
      .write.mode("append").parquet(s"$inDir/batch0")

    val schema = spark.read.parquet(s"$inDir/batch0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$inDir/batch0")

    val pairs = NearDup.nearDupPairs(stream,
      n = 2, numHashes = 32, bands = 8, minJaccard = 0.5,
      watermarkDelay = "10 minutes")

    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-neardup-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming query timed out")

    val streamed = spark.table("neardup_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val batch = graft.ext.Dedup.minhashPairs(
        docsWithTs.drop("ts"), "text", "doc_id",
        k = 2, numHashes = 32, bands = 8, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "batch fixture produced no near-dup pairs")
    assert(streamed == batch,
      s"streaming pairs diverge: missing=${(batch -- streamed).take(5)} " +
        s"extra=${(streamed -- batch).take(5)}")
    // est_jaccard is the same minhash-agreement fraction as batch
    val ests = spark.table("neardup_out").select("est_jaccard").as[Double].collect()
    assert(ests.forall(e => e >= 0.5 && e <= 1.0))
  }

  test("bucket state runs on the RocksDB state store (off-heap scale path)") {
    // At 100 TB the banded-bucket state outgrows executor heap; the
    // RocksDB provider is the production answer. Same query, same
    // parity contract — only the state backend changes.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val inDir = Files.createTempDirectory("graft-neardup-rocks-in-").toString
      docsWithTs.coalesce(1).write.mode("overwrite").parquet(inDir)
      val stream = spark.readStream.schema(docsWithTs.schema).parquet(inDir)

      val q = NearDup.nearDupPairs(stream,
        n = 2, numHashes = 32, bands = 8, minJaccard = 0.5)
        .writeStream.outputMode("append")
        .format("memory").queryName("neardup_rocks_out")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-neardup-rocks-ck-").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "streaming query timed out")

      val streamed = spark.table("neardup_rocks_out")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val batch = graft.ext.Dedup.minhashPairs(
          docsWithTs.drop("ts"), "text", "doc_id",
          k = 2, numHashes = 32, bands = 8, minJaccard = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        s"RocksDB-backed pairs diverge: missing=${(batch -- streamed).take(5)} " +
          s"extra=${(streamed -- batch).take(5)}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("same-batch arrivals pair too, and short docs never pair") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val local = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", t("2024-01-01 00:00:00")),
      (2L, "quick brown fox jumps over the lazy dog again and again", t("2024-01-01 00:00:30")),
      (3L, "one", t("2024-01-01 00:00:10")), // < n tokens: NULL sig
      (4L, "two", t("2024-01-01 00:00:11"))  // would sentinel-collide with 3
    ).toDF("doc_id", "text", "ts")
    val inDir = Files.createTempDirectory("graft-neardup2-in-").toString
    local.coalesce(1).write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream.schema(local.schema).parquet(inDir)

    val q = NearDup.nearDupPairs(stream, minJaccard = 0.3)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out2")
      .option("checkpointLocation", Files.createTempDirectory("graft-neardup2-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming query timed out")

    val got = spark.table("neardup_out2")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"same-batch near-dup not found: $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 4L), s"short docs paired: $got")
  }
}
