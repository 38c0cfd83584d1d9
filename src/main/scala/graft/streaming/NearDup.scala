package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [extension] Streaming near-duplicate detection — the streaming leg
  * of `graft.ext.Dedup.minhashPairs`, for ingest pipelines that must
  * flag near-dup documents as they arrive instead of in a nightly batch
  * sweep.
  *
  * Same LSH construction as batch (MinHash over word n-grams, banded
  * bucket keys — identical expressions, so stream and batch agree on
  * candidates by construction), with the self-join replaced by
  * `flatMapGroupsWithState` keyed on the (band, bucket) pair:
  *
  *   - state per bucket = the recent docs' (id, event-µs, signature),
  *     capped at `maxPerBucket` (oldest evicted first) and dropped
  *     whole when the event-time timeout fires — watermark-bounded
  *     state, the streaming contract;
  *   - an arriving doc is compared against its bucket's stored docs
  *     (and earlier docs of the same micro-batch); pairs at
  *     `est_jaccard ≥ minJaccard` are emitted with the LATER doc's
  *     event time.
  *
  * A colliding pair is emitted once per band it collides in (bands are
  * independent groups that cannot see each other's output; the same
  * holds for Spark's own stream-stream join duplicates under
  * at-least-once sinks). Consumers that need exactly-one-row-per-pair
  * apply `dropDuplicates("id_a", "id_b")` on the bounded result or
  * sink via an idempotent key-merge (`FeatureStore` Merge), which is
  * how the spec checks parity with the batch operator.
  *
  * Scale: state is O(buckets × maxPerBucket × numHashes); the shuffle
  * is the groupByKey on (band, bucket) — the same key the batch
  * self-join shuffles on. No O(n²) anywhere: per-doc work is bounded by
  * bucket occupancy, exactly as in the batch LSH analysis.
  */
// Serializable: the state function references module-level helpers, so
// the task closure carries the (stateless) module instance.
object NearDup extends Serializable {

  // carries the watermarked `ts` column itself (not a derived long):
  // the streaming checker requires the watermark column to reach the
  // flatMapGroupsWithState input for event-time timeouts
  case class BandedDoc(band: Int, bucket: Long, id: Long, ts: Timestamp, sig: Seq[Long])
  case class BucketEntry(id: Long, tsUs: Long, sig: Seq[Long])
  case class BucketState(entries: List[BucketEntry])
  case class NearDupPair(id_a: Long, id_b: Long, est_jaccard: Double, ts: Timestamp)

  /** Near-dup pairs over a streaming document frame. `docs` must carry
    * `idCol` (long), `tsCol` (timestamp event time) and `textCol`.
    */
  def nearDupPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      tsCol: String = "ts",
      n: Int = 2,
      numHashes: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.5,
      watermarkDelay: String = "10 minutes",
      maxPerBucket: Int = 1000,
      portableHash: Boolean = false): Dataset[NearDupPair] = {
    require(numHashes % bands == 0,
      s"streaming nearDupPairs: bands ($bands) must divide numHashes ($numHashes)")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = numHashes / bands

    val banded = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(
        col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"),
        graft.ext.Dedup.minhashSignatureWords(col(textCol), n, numHashes,
          portableHash).as("sig"))
      .filter(col("sig").isNotNull) // short docs carry no evidence (batch rule)
      .select(col("id"), col("ts"), col("sig"),
        explode(graft.ext.Dedup.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("id"), col("ts"), col("sig"))
      .as[BandedDoc]

    import EventTime.toUs

    // full micro precision round-trip (Timestamp(ms) alone truncates)
    def usToTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
      var eq = 0
      var i = 0
      while (i < numHashes) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / numHashes
    }

    def fn(key: (Int, Long), it: Iterator[BandedDoc],
        state: GroupState[BucketState]): Iterator[NearDupPair] = {
      if (state.hasTimedOut) {
        // watermark passed every stored doc's horizon: no future
        // arrival can still pair with them
        state.remove()
        Iterator.empty
      } else {
        var entries = state.getOption.map(_.entries).getOrElse(Nil)
        val out = List.newBuilder[NearDupPair]
        // deterministic intra-batch order: a pair is always (earlier,
        // later) by (ts, id), matching the batch operator's id_a < id_b
        // after the planted-dup id offset
        for (d <- it.toSeq.sortBy(x => (toUs(x.ts), x.id))) {
          val dUs = toUs(d.ts)
          for (e <- entries if e.id != d.id) {
            val est = estJaccard(e.sig, d.sig)
            if (est >= minJaccard) {
              val (a, b) = if (e.id < d.id) (e.id, d.id) else (d.id, e.id)
              // the LATER doc's event time, as documented — a late
              // (out-of-order) arrival pairs with a newer stored doc,
              // so the current doc's ts is not necessarily the max
              out += NearDupPair(a, b, est, usToTs(math.max(e.tsUs, dUs)))
            }
          }
          entries = (BucketEntry(d.id, dUs, d.sig) :: entries).take(maxPerBucket)
        }
        state.update(BucketState(entries))
        // keep the bucket alive until the watermark passes its newest
        // doc by the full delay; then no in-order arrival can pair
        val newest = entries.iterator.map(_.tsUs).foldLeft(0L)(math.max)
        state.setTimeoutTimestamp(newest / 1000 + delayMs(watermarkDelay))
        out.result().iterator
      }
    }

    banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  private[streaming] def delayMs(delay: String): Long =
    graft.operators.RangeJoin.parseWidthMicros(delay) / 1000L
}
