package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming as-of join ≡ batch `PointInTime.asOfJoin` once the
  * watermark passes the probes — regardless of arrival order, which is
  * the entire point of buffer-until-watermark.
  */
class StreamingPitSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("emitted probes carry exactly the batch as-of lookup") {
    val features = Seq(
      (1L, t("2024-01-01 00:00:00"), 10.0),
      (1L, t("2024-01-01 02:00:00"), 30.0),
      (2L, t("2024-01-01 01:00:00"), 99.0),
      // sentinel: the operator takes the MIN of the two stream clocks
      // (a lagging feature stream must hold probes back), so the
      // feature clock needs advancing past the probes too
      (9L, t("2024-01-02 12:00:00"), 0.0))
      .toDF("user_id", "feat_ts", "value")
    val spine = Seq(
      (100L, 1L, t("2024-01-01 01:00:00")), // between v1 and v2 → 10.0
      (101L, 1L, t("2024-01-01 02:00:00")), // at v2 → inclusive → 30.0
      (102L, 1L, t("2024-01-01 03:00:00")), // after all → 30.0
      (103L, 2L, t("2024-01-01 00:30:00")), // before first → NULL
      (104L, 3L, t("2024-01-01 01:00:00")), // unknown key → NULL
      // sentinel: pushes the final watermark past every real probe
      (999L, 9L, t("2024-01-02 12:00:00")))
      .toDF("event_id", "user_id", "ts")

    val dir = Files.createTempDirectory("graft-spit-").toString
    features.coalesce(1).write.mode("overwrite").parquet(s"$dir/features")
    spine.coalesce(1).write.mode("overwrite").parquet(s"$dir/spine")

    val joined = StreamingPit.asOfJoin(
      spark.readStream.schema(spine.schema).parquet(s"$dir/spine"),
      spark.readStream.schema(features.schema).parquet(s"$dir/features"),
      watermarkDelay = "1 minute")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("spit_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-spit-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming PIT query timed out")

    val got = spark.table("spit_out")
      .filter(col("probe_id") < 999L) // sentinel itself can't emit
      .select(col("probe_id"), col("feature_value"))
      .as[(Long, Option[Double])].collect().toMap

    val batch = graft.fs.PointInTime.asOfJoin(
        spine.filter(col("event_id") < 999L), features.filter(col("user_id") =!= 9L),
        keys = Seq("user_id"), spineTs = "ts", featTs = "feat_ts",
        featureCols = Seq("value"))
      .select(col("event_id"), col("value"))
      .as[(Long, Option[Double])].collect().toMap

    assert(got.keySet == batch.keySet,
      s"probe sets differ: stream=${got.keySet} batch=${batch.keySet}")
    assert(got == batch, s"as-of values differ: stream=$got batch=$batch")
  }

  test("feature versions prune but the as-of floor survives") {
    // many superseded versions; a probe AFTER them all still finds the
    // newest at-or-below — pruning must never evict the floor version
    val features = ((0 until 50).map(i => (1L, t(f"2024-01-01 00:$i%02d:00"), i.toDouble))
      :+ ((9L, t("2024-01-03 00:00:00"), 0.0))) // feature-clock sentinel
      .toDF("user_id", "feat_ts", "value")
    val spine = Seq(
      (100L, 1L, t("2024-01-01 01:30:00")),  // → newest = 49.0
      (999L, 9L, t("2024-01-03 00:00:00")))  // sentinel
      .toDF("event_id", "user_id", "ts")

    val dir = Files.createTempDirectory("graft-spit2-").toString
    features.coalesce(1).write.mode("overwrite").parquet(s"$dir/features")
    spine.coalesce(1).write.mode("overwrite").parquet(s"$dir/spine")

    val q = StreamingPit.asOfJoin(
        spark.readStream.schema(spine.schema).parquet(s"$dir/spine"),
        spark.readStream.schema(features.schema).parquet(s"$dir/features"),
        watermarkDelay = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("spit_out2")
      .option("checkpointLocation", Files.createTempDirectory("graft-spit2-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming PIT query timed out")

    val got = spark.table("spit_out2").filter(col("probe_id") === 100L)
      .select("feature_value").as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(49.0)), s"got $got")
  }

  test("probe-quiescent keys retire after featureRetention; active retention keeps them") {
    // phase 1: key 1 gets a feature, then only sentinel traffic pushes
    // the watermark ~1.5 days past it. With retention "1 hour" the
    // key's state retires (one-shot event-time timeout); with the
    // 7-day default it survives. phase 2 proves it behaviorally: a
    // late probe for key 1 sees None after retirement, Some before.
    def run(retention: String, name: String): Option[Double] = {
      val dir = Files.createTempDirectory(s"graft-spit3-$name-").toString
      val ck = Files.createTempDirectory(s"graft-spit3-ck-$name-").toString
      val featSchema = Seq((1L, t("2024-01-01 00:00:00"), 10.0))
        .toDF("user_id", "feat_ts", "value").schema
      val spineSchema = Seq((1L, 1L, t("2024-01-01 00:00:00")))
        .toDF("event_id", "user_id", "ts").schema

      // foreachBatch, not the memory sink: only foreachBatch supports
      // resuming from the phase-1 checkpoint
      val out = new scala.collection.concurrent.TrieMap[Long, Option[Double]]()
      def start() = StreamingPit.asOfJoin(
          spark.readStream.schema(spineSchema).parquet(s"$dir/spine"),
          spark.readStream.schema(featSchema).parquet(s"$dir/features"),
          watermarkDelay = "1 minute", featureRetention = retention)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingPit.PitJoined], _: Long) =>
          batch.collect().foreach(r => out.put(r.probe_id, r.feature_value)); ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()

      Seq((1L, t("2024-01-01 00:00:00"), 10.0), (9L, t("2024-01-02 12:00:00"), 0.0))
        .toDF("user_id", "feat_ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/features")
      Seq((999L, 9L, t("2024-01-02 12:00:00")))
        .toDF("event_id", "user_id", "ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/spine")
      val q1 = start()
      assert(q1.awaitTermination(120000), "phase-1 query timed out")

      // phase 2: the late probe for key 1, plus sentinels advancing
      // both clocks far enough to emit it
      Seq((9L, t("2024-01-03 12:00:00"), 0.0))
        .toDF("user_id", "feat_ts", "value")
        .coalesce(1).write.mode("append").parquet(s"$dir/features")
      Seq((200L, 1L, t("2024-01-02 13:00:00")), (998L, 9L, t("2024-01-03 12:00:00")))
        .toDF("event_id", "user_id", "ts")
        .coalesce(1).write.mode("append").parquet(s"$dir/spine")
      val q2 = start()
      assert(q2.awaitTermination(120000), "phase-2 query timed out")

      assert(out.contains(200L), s"probe 200 never emitted (got keys ${out.keySet})")
      out(200L)
    }

    assert(run("1 hour", "short") == None,
      "retired key should look up to None after retention passed")
    assert(run("7 days", "long") == Some(10.0),
      "key inside retention must keep its feature state")
    assert(run("forever", "forever") == Some(10.0),
      "retention opt-out must keep batch-parity semantics for late probes")
  }
}
