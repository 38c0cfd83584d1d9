package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GlobalIndex

/** [extension] Classifier reliability audit — the held-out evaluation a
  * quality-classifier curation loop (q151's CCNet shape) needs before
  * its scores gate a corpus: a rank-binned reliability table (does the
  * positive rate actually rise with the score?) plus the EXACT
  * ROC-AUC. No reference citation — the reference has no model-eval
  * ops.
  *
  * Everything is engine-portable (§5.3) because every ingredient is an
  * exact integer: scores arrive as quantized BIGINT margins, the rank
  * is a dense global index under the (margin, id) total order, bin
  * assignment is integer division, and the AUC is the Mann-Whitney
  * rank-sum statistic with average-rank tie handling — computed in
  * halves-free form as Σ_groups pos_m·(2·offset_m + n_m + 1) over
  * per-MARGIN groups, where offset_m (rows ranked strictly below the
  * group) is just min(idx) within the group. The only non-integer ops
  * are the final divisions (one per output column), each a single
  * correctly-rounded IEEE op over exactly-representable operands.
  *
  * Scale shape: ONE range shuffle ([[GlobalIndex]] — the two-pass
  * TeraSort, no single-partition window cliff), then two hash
  * aggregates over it (bins and margin groups; the margin-group frame
  * is bounded by distinct margins, and its only consumer is a 1-row
  * sum). Wide sums go through DECIMAL(38,0) so n_pos·n up to ~1e38
  * cannot wrap — at 10¹² held-out rows BIGINT would overflow. EAGER
  * semantics: the ranked frame localCheckpoints at CALL time and the
  * range-sorted intermediate releases before return, so repeated
  * audits in one session don't accumulate persisted sorts.
  */
object Calibration {

  /** Per-rank-bin reliability rows + the exact AUC (same value on
    * every row; NULL when a class is absent): `(bin, n, n_pos,
    * pos_rate, margin_lo, margin_hi, auc)`, ordered by bin. `bins`
    * are equal-COUNT rank bins (floor(idx·bins / n)), so a skewed
    * margin distribution cannot empty the table's tails the way
    * equal-WIDTH margin bins would.
    */
  def reliabilityAudit(scored: DataFrame, idCol: String, marginCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"reliabilityAudit: bins must be >= 1, got $bins")
    // exact-integer contract: a double margin would silently truncate
    // through the long cast, corrupting ranks and ties (r12 self-audit)
    val mType = scored.schema(scored.schema.fieldIndex(marginCol)).dataType
    require(Seq("byte", "short", "integer", "long")
      .contains(mType.typeName),
      s"reliabilityAudit: $marginCol must be an integral type (quantize " +
        s"scores first — the q133 margin_q discipline), got $mType")
    val base = scored.select(col(idCol).as("_id"),
      col(marginCol).cast("long").as("_m"),
      col(labelCol).cast("boolean").as("_pos"))
    // managed index: the eager localCheckpoint materializes the ranked
    // frame for the three consumers below, after which the range-sorted
    // intermediate can release — the unmanaged form would persist it
    // for the session's lifetime (GlobalIndex's own caching contract)
    val (idxRaw, releaseSort) = GlobalIndex.withGlobalIndexManaged(base,
      Seq(col("_m"), col("_id")), "_idx")
    val idx = idxRaw.localCheckpoint(true)
    releaseSort()
    val tot = idx.agg(count(lit(1)).as("_n"),
      sum(when(col("_pos"), 1L).otherwise(0L)).as("_np"))
    // Mann-Whitney in halves-free form over per-margin tie groups;
    // DECIMAL(38,0) keeps the rank-sum exact far past BIGINT range
    val dec = "decimal(38,0)"
    val r2 = idx.groupBy(col("_m"))
      .agg(min(col("_idx")).as("_off"), count(lit(1)).as("_nm"),
        sum(when(col("_pos"), 1L).otherwise(0L)).as("_pm"))
      .agg(sum(col("_pm").cast(dec) *
        (col("_off") * lit(2L) + col("_nm") + lit(1L)).cast(dec)).as("_r2"))
    val auc = broadcast(tot).crossJoin(broadcast(r2))
      .select(col("_n"), when(col("_np") > 0 && col("_np") < col("_n"),
        (col("_r2") - col("_np").cast(dec) * (col("_np") + lit(1L)).cast(dec))
          .cast("double") /
        (lit(2L).cast(dec) * col("_np").cast(dec) *
          (col("_n") - col("_np")).cast(dec)).cast("double"))
        .as("auc"))
    idx.crossJoin(broadcast(auc))
      // integer division: a double idx·bins/n could round up across a
      // bin edge; `div` cannot
      .withColumn("_bin", expr(s"(_idx * ${bins}L) div _n").cast("int"))
      .groupBy(col("_bin").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_pos"), 1L).otherwise(0L)).as("n_pos"),
        min(col("_m")).as("margin_lo"), max(col("_m")).as("margin_hi"),
        first(col("auc")).as("auc"))
      .withColumn("pos_rate",
        col("n_pos").cast("double") / col("n").cast("double"))
      .select(col("bin"), col("n"), col("n_pos"), col("pos_rate"),
        col("margin_lo"), col("margin_hi"), col("auc"))
      .orderBy("bin")
  }
}
