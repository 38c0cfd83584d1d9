package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the engine-side answer to the
  * reference's pandas `train_test_split` (FS:326, post-collect,
  * SURVEY.md §2.7): split by hash bucket of a stable key so the
  * assignment is reproducible across runs, executors, and re-reads —
  * properties a random split only has within one materialization.
  * Distributed: a narrow filter on each side, no shuffle, no collect.
  */
object Splits {

  private def bucket(keyCol: Column, buckets: Int): Column =
    pmod(xxhash64(keyCol), lit(buckets))

  /** (train, test) with ~trainPct of key-space in train. */
  def hashSplit(df: DataFrame, key: String, trainPct: Int): (DataFrame, DataFrame) = {
    require(trainPct > 0 && trainPct < 100, "trainPct must be in (0, 100)")
    val b = bucket(col(key), 100)
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** Stratified variant: per-stratum deterministic split by salting the
    * hash with the stratum value, so each stratum is split ~trainPct
    * regardless of its size.
    */
  def stratifiedHashSplit(df: DataFrame, key: String, stratum: String,
      trainPct: Int): (DataFrame, DataFrame) = {
    require(trainPct > 0 && trainPct < 100, "trainPct must be in (0, 100)")
    val b = pmod(xxhash64(col(key), col(stratum)), lit(100))
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** Chronological split with an EMBARGO gap — the leakage-safe
    * evaluation split for temporally-correlated data, where a hash
    * split silently leaks (a near-duplicate event lands on both sides of
    * the model's deployment boundary; cf. purged walk-forward CV):
    * rows at or before the boundary are `train`, rows inside
    * (boundary, boundary + embargo] are `embargo` (kept and LABELED,
    * not dropped — an audit needs to see what the gap excluded), rows
    * after are `test`. By construction max(train ts) + embargo <
    * min(test ts): no label-horizon overlap.
    *
    * The boundary is data-derived and exact: one 1-row (min, max)
    * micros aggregate broadcasts back (the winsorize scalar shape),
    * and `boundary = min + (span · trainNum) div trainDen` is pure
    * BIGINT arithmetic — reproducible across engines, runs, and
    * partitionings, unlike a percentile over timestamps (the q58
    * sort-collect trap) or a driver-supplied wall-clock constant.
    * NULL timestamps raise — a silent bucket would corrupt the split.
    *
    * Scale shape: one scan for the 1-row agg, then a scan-stage CASE
    * projection; no shuffle, no sort, no collect of data rows.
    */
  def chronoSplitEmbargo(df: DataFrame, tsCol: String,
      trainNum: Int, trainDen: Int, embargoUs: Long,
      outCol: String = "split"): DataFrame = {
    require(trainDen > 0 && trainNum > 0 && trainNum < trainDen,
      s"chronoSplitEmbargo: need 0 < trainNum < trainDen, got $trainNum/$trainDen")
    require(embargoUs >= 0,
      s"chronoSplitEmbargo: embargoUs must be >= 0, got $embargoUs")
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val bounds = df.agg(min(us).as("_lo"), max(us).as("_hi"))
    val boundary = col("_lo") +
      expr(s"((_hi - _lo) * ${trainNum}L) div ${trainDen}L")
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        when(us.isNull, raise_error(
          lit(s"chronoSplitEmbargo: NULL $tsCol — assign or drop before splitting")))
          .when(us <= boundary, lit("train"))
          .when(us <= boundary + lit(embargoUs), lit("embargo"))
          .otherwise(lit("test")))
      .drop("_lo", "_hi")
  }
}
