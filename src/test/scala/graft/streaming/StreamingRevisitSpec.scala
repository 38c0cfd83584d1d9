package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.StreamingFeatures.CaptureIn

/** Multi-micro-batch pins for [[StreamingFeatures.labelRevisits]] —
  * the q265 gate runs the fixture through ONE batch; these replay
  * captures across SEVERAL micro-batches (one file per trigger) to pin
  * the documented contracts: ordered replays are batch-equivalent
  * (`Warc.revisitRecords` field-for-field), and an OUT-OF-ORDER late
  * arrival emits against the stored original while state rolls DOWN to
  * the earliest capture so subsequent stubs re-converge with batch.
  */
class StreamingRevisitSpec extends SparkSpec {
  import spark.implicits._

  private val runs = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Feed the parquet files under `dir` one per trigger (mtimes set by
    * the caller fix the batch order) through labelRevisits; return the
    * accumulated Append output.
    */
  private def runStream(dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .as[CaptureIn]
    val out = StreamingFeatures.labelRevisits(stream)
    val qname = "revisit_spec_" + runs.incrementAndGet()
    val ckpt = Files.createTempDirectory("graft-revisit-ck-").toString
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query timed out")
    val res = spark.table(qname).localCheckpoint(true)
    spark.catalog.dropTempView(qname)
    res
  }

  /** Write one micro-batch file with a forced modification time so the
    * file source's oldest-first ordering replays batches as intended.
    */
  private def writeBatch(dir: String, rows: Seq[CaptureIn], mtime: Long): Unit = {
    val sub = s"$dir/b$mtime"
    rows.toDS().coalesce(1).write.mode("overwrite").parquet(sub)
    Files.list(Paths.get(sub)).forEach { p =>
      p.toFile.setLastModified(mtime); ()
    }
    Files.list(Paths.get(sub))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .forEach { p =>
        val dest = Paths.get(dir, p.getFileName.toString)
        Files.move(p, dest)
        dest.toFile.setLastModified(mtime); ()
      }
    graft.PipelinesRound12.deleteRecursively(Paths.get(sub))
  }

  private def cap(docId: Long, crawl: Int, url: String, ts: Long,
      payload: String): CaptureIn =
    CaptureIn(
      java.security.MessageDigest.getInstance("MD5")
        .digest(payload.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString,
      url, ts, docId, crawl)

  test("ordered multi-batch replay is field-for-field batch-equivalent") {
    val dir = Files.createTempDirectory("graft-revisit-in-").toString
    // crawl 1 then crawl 2 as separate micro-batches; docs 1,2 repeat
    // their payload across crawls (revisits), docs 3,4 change
    val crawl1 = (1L to 4L).map { i =>
      val body = if (i <= 2) s"stable $i" else s"body $i c1"
      cap(i, 1, s"http://h${i % 2}.com/p/$i", 100 + i, body)
    }
    val crawl2 = (1L to 4L).map { i =>
      val body = if (i <= 2) s"stable $i" else s"body $i c2"
      cap(i, 2, s"http://h${i % 2}.com/p/$i", 200 + i, body)
    }
    writeBatch(dir, crawl1, 1000000L)
    writeBatch(dir, crawl2, 2000000L)

    val streamed = runStream(dir)
      .select("doc_id", "crawl", "url", "ts", "payload_digest",
        "record_type", "refers_to_url", "refers_to_ts")
      .orderBy("doc_id", "crawl").collect().toSeq

    // revisitRecords md5s its payload column; feeding it OUR digest
    // string keys both sides on the same capture groups
    val batch = graft.ext.Warc.revisitRecords(
        (crawl1 ++ crawl2).toDS().toDF()
          .withColumnRenamed("digest", "body"),
        "url", "ts", "body")
      .select("doc_id", "crawl", "url", "ts", "body",
        "record_type", "refers_to_url", "refers_to_ts")
      .orderBy("doc_id", "crawl").collect().toSeq
    // record_type/refers_to must agree row-for-row (payload_digest
    // differs by construction: batch re-hashes, stream keys directly)
    assert(streamed.map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getString(5), Option(r.getString(6)))) ===
      batch.map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getString(5), Option(r.getString(6)))))
    graft.PipelinesRound12.deleteRecursively(Paths.get(dir))
  }

  test("out-of-order late arrival: emits vs stored original, state rolls down") {
    val dir = Files.createTempDirectory("graft-revisit-ooo-").toString
    val p = "shared payload"
    // batch 1 carries the LATER capture; batch 2 the earlier one
    // (out-of-order replay); batch 3 a fresh later capture
    writeBatch(dir, Seq(cap(10, 1, "http://b.com/", 200, p)), 1000000L)
    writeBatch(dir, Seq(cap(11, 1, "http://a.com/", 100, p)), 2000000L)
    writeBatch(dir, Seq(cap(12, 2, "http://c.com/", 300, p)), 3000000L)

    val got = runStream(dir)
      .select("doc_id", "record_type", "refers_to_url", "refers_to_ts")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq
    assert(got === Seq(
      // first seen → the stored response (Append cannot retract it)
      (10L, "response", None, None),
      // late EARLIER capture: revisit against the stored original...
      (11L, "revisit", Some("http://b.com/"), Some(200L)),
      // ...but state rolled DOWN: subsequent stubs point at the true
      // earliest capture, where batch revisitRecords points
      (12L, "revisit", Some("http://a.com/"), Some(100L))))
    graft.PipelinesRound12.deleteRecursively(Paths.get(dir))
  }
}
