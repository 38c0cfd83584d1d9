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
}
