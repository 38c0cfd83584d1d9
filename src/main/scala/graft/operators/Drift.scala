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
    // An EMPTY snapshot (total 0) is the one place drift must ERROR,
    // not report: Spark's non-ANSI divide would turn n/0 into NULL
    // drift for every category — silence exactly when the signal is
    // maximal (a feed going dark). raise_error keeps the guard inside
    // the lazy plan — no extra driver-side count job.
    val totals = counts.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
      .select(Seq("_ta", "_tb").map { c =>
        val err = raise_error(
          concat(lit(s"Drift.driftTerms: snapshot total $c is "),
            coalesce(col(c).cast("string"), lit("NULL")),
            lit(" — empty/absent snapshot, drift undefined"))).cast("long")
        when(col(c).isNull || col(c) === 0, err).otherwise(col(c)).as(c)
      }: _*)
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
