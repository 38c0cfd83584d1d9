package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** [extension] Dense global index assignment under a total order — the
  * curriculum-schedule / global-sample-numbering step of a training
  * pipeline ("order the corpus easy→hard with a deterministic shuffle
  * inside each difficulty bucket, then number the examples 0..n−1 so
  * step t reads example t"). No reference analog.
  *
  * Spark's own `row_number() OVER (ORDER BY …)` — an EMPTY window
  * partition spec — funnels the ENTIRE dataset through one window
  * partition: the documented single-partition cliff that makes it
  * unusable past one executor's memory. This operator is the scale-safe
  * form, the TeraSort two-pass:
  *
  *   1. range-repartition + sort within partitions on the total order
  *      (the same distributed sort `orderBy` plans — no cliff);
  *   2. one O(#partitions) job counts rows per partition; the driver
  *      prefix-sums the counts into start offsets (bounded by the task
  *      count, never the row count);
  *   3. a narrow `mapPartitions` adds offset + local position — the
  *      genuinely imperative per-partition step (SURVEY §4's last
  *      resort, used for exactly its intended case).
  *
  * The sorted frame is persisted across the two passes: pass 2's
  * offsets must describe the SAME physical partitioning pass 3 walks —
  * recomputation could legally resample range boundaries. On a real
  * cluster prefer `.checkpoint()` (or write/read the sorted frame) over
  * memory-and-disk persist for 100 TB inputs; the contract is
  * identical.
  *
  * The sort columns must be a TOTAL order (include a unique tiebreak
  * key): equal rows straddling a partition boundary would otherwise get
  * arbitrary indices.
  */
object GlobalIndex {

  /** Append `outCol`: the 0-based dense rank of each row under
    * `sortCols`. One range shuffle of the data + one O(#partitions)
    * count job; output preserves the sorted order within and across
    * partitions.
    *
    * Caching contract: the sorted intermediate stays persisted for the
    * life of the returned plan (see object doc — the offsets must
    * describe the partitioning the final pass walks). One-shot
    * pipelines can ignore this; a long-lived session issuing many
    * indexed frames should use [[withGlobalIndexManaged]] and release
    * each intermediate once the result is consumed, or the cached
    * sorts accumulate until the block store evicts under pressure.
    */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "idx"): DataFrame =
    withGlobalIndexManaged(df, sortCols, outCol)._1

  /** As [[withGlobalIndex]], plus the cached intermediate's release
    * handle. Call it AFTER the returned frame has been materialized
    * (written, collected, or checkpointed) — the plan reads the cache
    * lazily, and an early release would recompute the range sort with
    * legally different partition boundaries than the offsets describe.
    */
  def withGlobalIndexManaged(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "idx"): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist()
    // per-partition counts: spark_partition_id is stable on the
    // PERSISTED frame; the groupBy shuffles #partitions rows, not data
    val counts = sorted
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
      p += 1
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val indexed = sorted.mapPartitions { it =>
      var i = bc.value(TaskContext.getPartitionId())
      it.map { row =>
        val r = Row.fromSeq(row.toSeq :+ i)
        i += 1
        r
      }
    }(enc)
    (indexed, () => { sorted.unpersist(); () })
  }

  /** As [[withGlobalIndex]], with the cache lifecycle CLOSED before
    * returning (r17 verdict watch item #2): the indexed frame is
    * materialized once into the block store (`localCheckpoint` — on a
    * real cluster substitute a reliable `checkpoint()` or a
    * write/read round-trip for executor-loss safety; the lifecycle
    * contract is identical) and the range-sort cache released
    * immediately, so a long-lived session issuing many ranked frames
    * never accumulates cached sorts — the failure mode the dropped
    * release handles of one-shot callers (q108, q273) are immune to
    * but a resident service is not. The returned frame re-reads the
    * materialized blocks; the sorted intermediate is gone
    * (GlobalIndexSpec pins the block-store state).
    */
  def withGlobalIndexMaterialized(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "idx"): DataFrame = {
    val (indexed, release) = withGlobalIndexManaged(df, sortCols, outCol)
    val materialized = indexed.localCheckpoint(true)
    release()
    materialized
  }
}
