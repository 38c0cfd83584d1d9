package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Tempered negative-sampling table — the word2vec /
  * item2vec noise distribution (Mikolov et al. 2013: draw negatives
  * ∝ count^0.75, flattening the head so frequent terms don't dominate
  * the contrastive loss) as a DETERMINISTIC table operator: each draw
  * id maps to exactly one vocabulary term, reproducibly, so a
  * training run's negatives are a pure function of the corpus counts
  * and the draw ids — no RNG state, byte-identical on re-run and
  * engine swap.
  *
  * Portability: 0.75 = 1/2 + 1/4, so the tempered weight is
  * `sqrt(n) · sqrt(sqrt(n))` — a product of correctly-rounded IEEE
  * roots (the [[graft.etl.Sampling.temperatureFracs]] argument; a
  * general `pow` is only faithfully rounded) — quantized IMMEDIATELY
  * to BIGINT at 1e6 (the quantize-before-sum discipline), so the
  * cumulative interval layout, the total mass W, and every draw
  * target `u mod W` are exact integers the oracle replays. The mod
  * introduces ≤ W/2^52 selection bias — negligible and deterministic.
  *
  * Scale shape: the weight/cumsum pass runs over the VOCABULARY
  * (model-sized, the k×d/codebook boundary — the corpus itself never
  * enters this operator), with the running sum one ordered window
  * over that vocabulary; W comes to the driver as one row (the
  * sanctioned metadata collect) to size the bucket width, and the
  * draw→interval match is [[graft.operators.RangeJoin.intervalJoinLong]]
  * — an equi join on bucket ids, no nested loop, with a heavy head
  * term spanning many buckets as ordinary join fan-out.
  *
  * Skew bound (r12 audit): a term carrying ANY share of the mass —
  * even > 50 % — replicates across at most span/width + 1 buckets,
  * and the TOTAL bucket replication across the whole vocabulary is
  * ≤ 4096 + |vocab| rows by construction (the widths tile W once), so
  * the interval side stays model-sized under arbitrary head skew; the
  * heavy term's draws spread over its many buckets rather than
  * hot-spotting one join key.
  */
object NegativeSampling {

  /** 13-hex-digit md5 integer of `key` salted with `:ns`. */
  private def drawU(key: Column): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":ns"))), 1, 13),
      16, 10).cast("long")

  /** Map each row of `draws` to its sampled term. `vocab` carries
    * (termCol, countCol ≥ 1); emits (drawCol, termCol, w_q) — w_q the
    * term's quantized tempered weight, handy for importance
    * corrections downstream.
    */
  def sampleTable(vocab: DataFrame, termCol: String, countCol: String,
      draws: DataFrame, drawCol: String): DataFrame = {
    // enforce the countCol >= 1 contract at the row level: sqrt of a
    // negative count is NaN, which would silently poison the cumsum
    // (every downstream interval NULL) instead of failing loudly
    // (r12 audit)
    val cd = when(col(countCol) >= 1, col(countCol).cast("double"))
      .otherwise(raise_error(concat(
        lit(s"negativeSampleTable: $countCol must be >= 1, got "),
        col(countCol).cast("string"))))
    val wq = floor(sqrt(cd) * sqrt(sqrt(cd)) * lit(1e6) + lit(0.5)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(termCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // vocabulary-scale global cumsum: this window is single-partition
    // by construction, which is fine exactly because its input is the
    // MODEL (the vocabulary), not the corpus — the same boundary as
    // every codebook/centroid fit; the corpus-side q108 rule is about
    // corpus-sized windows
    val intervals = vocab
      .select(col(termCol), wq.as("_wq"))
      .withColumn("_cum", sum(col("_wq")).over(w))
      .withColumn("_start", col("_cum") - col("_wq"))
      .localCheckpoint(true) // consumed by the total agg AND the join
    // sum over an EMPTY vocabulary is NULL (rows with count < 1 no
    // longer reach here — they raise in wq) — map it to the mass-0 error
    val wRow = intervals.agg(sum(col("_wq"))).head
    val wTot = if (wRow.isNullAt(0)) 0L else wRow.getLong(0)
    require(wTot > 0, "negativeSampleTable: vocabulary mass is 0")
    val targets = draws
      .withColumn("_t", drawU(col(drawCol)) % lit(wTot))
    graft.operators.RangeJoin.intervalJoinLong(
        intervals, targets, "_start", "_cum", "_t",
        bucketWidth = math.max(1L, wTot / 4096L))
      .select(col(drawCol), col(termCol), col("_wq").as("w_q"))
  }
}
