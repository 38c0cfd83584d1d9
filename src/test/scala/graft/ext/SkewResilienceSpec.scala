package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-level skew-resilience proof for the clustered dedup joins.
  *
  * `SemanticDedup.retainClustered` and `Dedup.editDistancePairs` lean on
  * "a skewed giant cell / hot gram is ordinary AQE skew territory" in
  * their Scaladoc. This suite asserts that claim instead of prosing it:
  * build a deliberately skewed key (one dominant k-means cell, one hot
  * q-gram), lower the AQE skew thresholds so test-scale bytes qualify,
  * and pin `skew=true` in the final adaptive plan — the
  * OptimizeSkewedJoin split actually firing on these operators' joins.
  */
class SkewResilienceSpec extends SparkSpec {
  import spark.implicits._

  /** Run `df`'s own physical plan (count() would build a separate
    * QueryExecution and leave this one un-finalized under AQE), then
    * return the finalized plan string.
    */
  private def executedPlan(df: DataFrame): String = {
    df.queryExecution.executedPlan.execute().count()
    df.queryExecution.executedPlan.toString
  }

  // 32 shuffle partitions spread the non-hot keys thin, so the hot
  // key's partition towers over the median; thresholds drop to a few
  // KB because skew detection reads COMPRESSED map-output sizes and
  // the synthetic rows compress hard
  private val skewConfs = Map(
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    // a skewed partition splits along MAP-output block boundaries; the
    // default 1MB coalesce floor would collapse the upstream stage to
    // one map task at test scale, leaving a single unsplittable block
    // (OptimizeSkewedJoin then reports the partition as non-skewed)
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withSkewConfs[A](body: => A): A = {
    val prev = skewConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("retainClustered: AQE splits the giant-cell join partition") {
    withSkewConfs {
      // 4000 vectors, dim 4: ids 0-3949 all AT one point — identical
      // vectors land in one cell no matter how Lloyd's places (or
      // collapses) centroids, so the giant cell is guaranteed, not
      // init-dependent. The remaining 50 spread over distinct
      // directions by deterministic id arithmetic — no RNG.
      val vecs = spark.range(4000).select(
        col("id").as("vec_id"),
        when(col("id") < 3950,
          array(lit(1.0), lit(1.0), lit(0.0), lit(0.0)))
          .otherwise(array(col("id") % 11 - 5.0, col("id") % 13 - 6.0,
            lit(1.0), col("id") % 5 - 2.0))
          .cast("array<float>").as("embedding"))
      val retained = SemanticDedup.retainClustered(
        vecs, threshold = 0.999999, nlist = 4)
      val plan = executedPlan(retained)
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no skew-join split in retainClustered's final AQE plan:\n$plan")
    }
  }

  test("editDistancePairs: AQE splits the hot-gram join partition") {
    withSkewConfs {
      // 4000 names "zz" + 6 md5-hex chars: length 8 (>= minSafe 6, the
      // long q-gram branch), every name carries the hot gram "zz" ('z'
      // never appears in hex, so no accidental extras), and the
      // suffixes are high-entropy — skew detection reads COMPRESSED
      // map-output sizes, so a low-entropy corpus (sequential digits)
      // compresses below any threshold and hides the skew.
      val names = spark.range(4000)
        .select(concat(lit("zz"),
          substring(md5(col("id").cast("string")), 1, 6)).as("nm"))
      val pairs = Dedup.editDistancePairs(names.toDF(), "nm", maxDist = 2)
      val plan = executedPlan(pairs)
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no skew-join split in editDistancePairs' final AQE plan:\n$plan")
      // and the count filter still holds the line: only the
      // consecutive-suffix pairs within edit distance 2 survive
      val got = pairs.count()
      assert(got > 0, "expected some within-distance pairs")
    }
  }
}
