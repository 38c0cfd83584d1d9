package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [extension] Categorical distribution-drift monitoring between two
  * snapshots of a feature — the chi-square-style alternative to PSI
  * (PSI's ln term is not bit-portable across engines, SURVEY.md §5.3):
  * per category, (p−q)² / ((p+q)/2), BIGINT-quantized
  * (floor(x·1e12+0.5)) so any downstream sum of terms is exact integer
  * arithmetic. The (p+q)/2 denominator keeps the term defined for
  * categories present in only one snapshot (PSI diverges there).
  *
  * Works over anything that can produce per-category counts: two batch
  * snapshots, or a [[graft.streaming.StreamingFeatures.maintainAggState]]
  * state table against a frozen reference — drift checks on a 100 TB
  * table cost the two count aggregates, ever.
  */
object Drift {

  /** Drift arithmetic over an aligned (cat, n_a, n_b) counts frame:
    * emits (cat, n_a, n_b, drift_q). The 1-row totals broadcast-cross
    * back; everything else folds into the input's projection.
    */
  def driftTerms(counts: DataFrame, catCol: String): DataFrame = {
    val totals = counts.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
    val p = col("n_a").cast("double") / col("_ta")
    val q = col("n_b").cast("double") / col("_tb")
    counts.crossJoin(broadcast(totals))
      .select(col(catCol), col("n_a"), col("n_b"),
        floor(((p - q) * (p - q)) / ((p + q) / lit(2.0)) * lit(1e12) + lit(0.5))
          .as("drift_q"))
  }

  /** Align two per-category count frames (catCol, nCol) by full-outer
    * merge (absent category → 0) and compute the drift terms.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, catCol: String,
      nCol: String): DataFrame = {
    val aligned = a.select(col(catCol), col(nCol).cast("long").as("n_a"))
      .join(b.select(col(catCol), col(nCol).cast("long").as("n_b")),
        Seq(catCol), "full_outer")
      .select(col(catCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    driftTerms(aligned, catCol)
  }
}
