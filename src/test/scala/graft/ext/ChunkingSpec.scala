package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int): (Long, String) =
    (id, (0 until nTokens).map(i => s"t$i").mkString(" "))

  test("chunkTokens: exact cover without overlap") {
    val df = Seq(doc(1, 10), doc(2, 4), doc(3, 12)).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(df, chunkSize = 4, overlap = 0)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String, Int)].collect()
    // doc 1: 10 tokens → chunks of 4,4,2; doc 2: one exact chunk; doc 3: 4,4,4
    assert(got.count(_._1 == 1) == 3 && got.count(_._1 == 2) == 1 &&
      got.count(_._1 == 3) == 3)
    // non-overlapping chunks re-concatenate to the original token stream
    val rebuilt = got.filter(_._1 == 1).sortBy(_._2).map(_._4).mkString(" ")
    assert(rebuilt == doc(1, 10)._2)
    // tail chunk is short and says so
    assert(got.filter(_._1 == 1).last._5 == 2)
    // start_tok = chunk_id * chunkSize when overlap = 0
    assert(got.forall { case (_, cid, start, _, _) => start == cid * 4 })
  }

  test("chunkTokens: overlap windows slide by the stride") {
    val df = Seq(doc(7, 20)).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(df, chunkSize = 8, overlap = 3)
      .orderBy("chunk_id")
      .as[(Long, Long, Long, String, Int)].collect()
    // stride 5: starts 0,5,10 cover to 18 — need one more at 15 to reach 20
    assert(got.map(_._3).toSeq == Seq(0L, 5L, 10L, 15L))
    // consecutive chunks share exactly `overlap` tokens
    val first = got(0)._4.split(" ").toSeq
    val second = got(1)._4.split(" ").toSeq
    assert(first.takeRight(3) == second.take(3))
    // every token index appears in some chunk
    val covered = got.flatMap(c => c._4.split(" ")).toSet
    assert(covered == (0 until 20).map(i => s"t$i").toSet)
  }

  test("chunkTokens: empty doc yields no rows, short doc one short chunk") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "only two tokens")).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(df, chunkSize = 16, overlap = 4)
      .as[(Long, Long, Long, String, Int)].collect()
    assert(got.length == 1 && got.head._1 == 3L && got.head._5 == 3)
    intercept[IllegalArgumentException](
      Chunking.chunkTokens(df, chunkSize = 4, overlap = 4))
  }

  test("chunkTokens is a narrow plan: no shuffle") {
    val df = Seq(doc(1, 10)).toDF("doc_id", "text")
    val plan = Chunking.chunkTokens(df, chunkSize = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("chunkTokens applies to a stream unchanged (narrow op, append mode)") {
    // narrow operators are streaming-compatible for free — pin it: the
    // same builder over a file stream emits exactly the batch rows
    import java.nio.file.Files
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").limit(100)
    val dir = Files.createTempDirectory("graft-chunk-in-").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = Chunking.chunkTokens(stream, chunkSize = 32, overlap = 8)
      .writeStream.outputMode("append").format("memory")
      .queryName("chunk_stream_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-chunk-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("chunk_stream_out")
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String, Int)].collect().toSeq
    val want = Chunking.chunkTokens(
        spark.read.parquet(dir), chunkSize = 32, overlap = 8)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String, Int)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("packingPlan: contiguous intervals per stream, correct pack spans") {
    val df = Seq(
      (1L, "a", (0 until 300).map(_ => "w").mkString(" ")),
      (2L, "a", (0 until 300).map(_ => "w").mkString(" ")),
      (3L, "a", ""),
      (4L, "a", (0 until 50).map(_ => "w").mkString(" ")),
      (5L, "b", (0 until 600).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Chunking.packingPlan(df, budget = 512)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
    // (doc_id, source, n_tokens, start, end, first_pack, last_pack)
    assert(got(0) == ((1L, "a", 300L, 0L, 300L, 0L, 0L)))
    // doc 2 straddles the 512 boundary: tokens 300..600 → packs 0 and 1
    assert(got(1) == ((2L, "a", 300L, 300L, 600L, 0L, 1L)))
    // zero-token doc pins to the pack of its offset, start == end
    assert(got(2) == ((3L, "a", 0L, 600L, 600L, 1L, 1L)))
    assert(got(3) == ((4L, "a", 50L, 600L, 650L, 1L, 1L)))
    // stream b starts its own offsets
    assert(got(4) == ((5L, "b", 600L, 0L, 600L, 0L, 1L)))
    // intervals within a stream are gap-free
    val a = got.filter(_._2 == "a").sortBy(_._1)
    assert(a.sliding(2).forall {
      case Array(x, y) => x._5 == y._4
      case _ => true
    })
  }
}
