package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Stream-stream interval join ≡ the equivalent batch join on the same
  * events.
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming interval join matches the batch join") {
    val events = graft.Tables.load(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val inDir = Files.createTempDirectory("graft-ssj-in-").toString
    events.coalesce(1).write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema

    def stream() = spark.readStream.schema(schema).parquet(inDir)
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val follows = stream()
      .select(col("event_id").as("f_id"), col("user_id"), col("ts").as("f_ts"))

    val joined = StreamJoins.intervalJoin(purchases, follows,
      keyCol = "user_id", leftTsCol = "p_ts", rightTsCol = "f_ts",
      window = "1 hour", watermarkDelay = "1 minute")
      .filter(col("f_id") =!= col("p_id"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssj-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream-stream join query timed out")

    val streamed = spark.table("ssj_out")
      .select("p_id", "f_id").as[(Long, Long)].collect().toSet

    val bp = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val bf = events.select(col("event_id").as("f_id"),
      col("user_id").as("u2"), col("ts").as("f_ts"))
    val batch = bp.join(bf,
        col("user_id") === col("u2") &&
          col("f_ts") >= col("p_ts") &&
          col("f_ts") < col("p_ts") + expr("INTERVAL 1 HOUR"))
      .filter(col("f_id") =!= col("p_id"))
      .select("p_id", "f_id").as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "batch fixture join is empty")
    assert(streamed == batch,
      s"stream-stream join diverges: missing=${(batch -- streamed).take(5)} " +
        s"extra=${(streamed -- batch).take(5)}")
  }
}
