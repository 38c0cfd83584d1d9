package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised + robust feature encodings [extension] — the numeric
  * siblings of the reference's hand recodes
  * (`/root/reference/includes/setup.py:209-221`), built so every
  * arithmetic step is portable to an ANSI oracle: integer counts and
  * exact sums enter one IEEE double expression evaluated in the same
  * order on both engines.
  */
object Encoders {

  /** Leave-one-out mean target encoding with additive smoothing:
    * for a row in category g with binary label ℓ,
    *   enc = (Σ_g ℓ − ℓ + m·prior) / (n_g − 1 + m)
    * where prior is the global label mean. Excluding the row's own
    * label kills the single-row leakage that makes naive mean
    * encoding overfit; `smoothing` (m) shrinks rare categories toward
    * the prior (a singleton category encodes exactly to it).
    *
    * Plan shape: one per-category aggregate joined back on the
    * category (AQE broadcasts while the category table is small, which
    * it is by definition of a categorical), plus the global prior as a
    * broadcast 1-row cross — two shuffles total, rows never leave
    * their partition for the encode itself.
    *
    * A NULL category is a category: the join-back is null-safe (`<=>`)
    * so NULL-category rows encode against the NULL group exactly like
    * any other — a plain equi join would silently DROP them (inner
    * join keys never match NULL). Spec-asserted in EncodersSpec.
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, labelCol: Column,
      outCol: String, smoothing: Double = 10.0): DataFrame = {
    require(smoothing > 0, s"targetEncodeLoo: smoothing must be > 0, got $smoothing")
    val l = when(labelCol, 1L).otherwise(0L)
    val grouped = df.groupBy(col(catCol)).agg(
      count(lit(1)).as("_n_g"), sum(l).as("_s_g"))
      .withColumnRenamed(catCol, "_cat")
    val prior = df.agg(
      (sum(l).cast("double") / count(lit(1))).as("_prior"))
    df.join(grouped, col(catCol) <=> col("_cat"))
      .drop("_cat")
      .crossJoin(broadcast(prior))
      .withColumn(outCol,
        ((col("_s_g") - l).cast("double") + lit(smoothing) * col("_prior")) /
          (col("_n_g") - 1 + lit(smoothing)).cast("double"))
      .drop("_n_g", "_s_g", "_prior")
  }

  /** Robust scaling: (x − median) / IQR — the outlier-insensitive
    * standardization (vs the mean/stddev z-score, q60). Exact
    * percentiles keep the three edges bit-identical to
    * `quantile_cont`, so scaled values are oracle-checkable. The
    * stats are one distributed aggregate broadcast back as a 1-row
    * frame. A zero IQR (degenerate spread) scales to NaN explicitly —
    * under ANSI mode the raw division would throw mid-job, which is
    * the wrong place to learn the column is constant.
    */
  def robustScale(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val stats = df.agg(
      expr(s"percentile($valueCol, array(0.25, 0.5, 0.75))").as("_q"))
    val iqr = element_at(col("_q"), 3) - element_at(col("_q"), 1)
    df.crossJoin(broadcast(stats))
      .withColumn(outCol,
        when(iqr === 0.0, lit(Double.NaN))
          .otherwise((col(valueCol) - element_at(col("_q"), 2)) / iqr))
      .drop("_q")
  }

  /** Per-group winsorization: clamp `valueCol` into its group's exact
    * [lo, hi] percentile band — the outlier treatment that keeps rows
    * (unlike a filter) and bounds influence (unlike raw scaling);
    * standard before mean-based feature aggregates. Exact interpolated
    * percentiles (the q42 bit-parity contract with DuckDB
    * `quantile_cont`); the clamp itself picks an existing double, so
    * the whole output is oracle-portable.
    *
    * Scale shape: one grouped percentile aggregate (|groups| rows)
    * broadcast-joined back, the clamp folded into the scan projection
    * — no window over the data, no corpus sort; percentile state is
    * per-group value collection, so groups must each fit an executor
    * (for million-row groups switch to approx_percentile and accept
    * rows-only checking).
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      outCol: String, lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi,
      s"winsorize: need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val stats = df.groupBy(col(groupCol)).agg(
      expr(s"percentile(CAST($valueCol AS DOUBLE), array($lo, $hi))").as("_b"))
      .withColumnRenamed(groupCol, "_wg")
    // least/greatest SKIP nulls (both here and in DuckDB), which would
    // silently impute the upper bound for a missing value — guard so
    // NULL stays NULL. A NULL group is a group: the join-back is
    // null-safe (`<=>`, the targetEncodeLoo discipline) so NULL-group
    // rows clamp against the NULL group's own band instead of being
    // dropped by never-matching equi-join keys — "keeps rows" must
    // hold for every row.
    df.join(broadcast(stats), col(groupCol) <=> col("_wg"))
      .drop("_wg")
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(greatest(element_at(col("_b"), 1),
            least(element_at(col("_b"), 2), col(valueCol).cast("double")))))
      .drop("_b")
  }

  /** [[winsorize]]'s million-row-group escape hatch made first-class:
    * identical join-back / NULL-group / NULL-value semantics, but the
    * band edges come from `approx_percentile` (KLL-style quantile
    * sketch: CONSTANT-size mergeable state per group, map-side
    * partials) instead of exact per-group value collection — the shape
    * that survives a group outgrowing executor memory at 100 TB.
    * `accuracy` trades sketch size for rank error ≤ n/accuracy. Sketch
    * results are engine-specific (rows-only checkable, §5.3); the
    * clamp still only ever emits existing values or sketch edges, and
    * EncodersSpec pins exact≡approx agreement where the sketch is
    * exact (small distinct counts).
    */
  def winsorizeApprox(df: DataFrame, groupCol: String, valueCol: String,
      outCol: String, lo: Double = 0.01, hi: Double = 0.99,
      accuracy: Int = 10000): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi,
      s"winsorizeApprox: need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    require(accuracy >= 1,
      s"winsorizeApprox: accuracy must be >= 1, got $accuracy")
    // the sketch's rank error is ~n/accuracy; if that exceeds the
    // clipped tail mass (lo·n below, (1−hi)·n above) the band edge is
    // noise — clamping against it silently winsorizes the wrong
    // fraction. Fail fast instead (accuracy 1/tail is the floor, not a
    // recommendation).
    val tail = math.min(if (lo > 0.0) lo else 1.0, if (hi < 1.0) 1.0 - hi else 1.0)
    require(tail >= 1.0 / accuracy,
      s"winsorizeApprox: accuracy=$accuracy gives rank error ~1/$accuracy " +
        s"of the group, larger than the clipped tail ($tail) — raise " +
        f"accuracy above ${math.ceil(1.0 / tail).toLong} or widen the band")
    val stats = df.groupBy(col(groupCol)).agg(
      expr(s"approx_percentile(CAST($valueCol AS DOUBLE), array($lo, $hi), $accuracy)")
        .as("_b"))
      .withColumnRenamed(groupCol, "_wg")
    df.join(broadcast(stats), col(groupCol) <=> col("_wg"))
      .drop("_wg")
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(greatest(element_at(col("_b"), 1),
            least(element_at(col("_b"), 2), col(valueCol).cast("double")))))
      .drop("_b")
  }
}
