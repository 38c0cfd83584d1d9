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

  /** NUMERIC-distribution drift between two snapshots — the
    * continuous-column counterpart of [[categoricalDrift]] (the
    * PSI-style monitor with the chi-square term, since PSI's ln is
    * not bit-portable, §5.3): the base snapshot fits n-quantile bin
    * edges ([[graft.etl.Discretize.quantileEdges]] — fitting on the
    * CURRENT snapshot would hide exactly the shift being measured),
    * both snapshots bin under those FROZEN edges, and the per-bin
    * counts flow through [[categoricalDrift]]'s aligned drift terms.
    * NULL values are excluded from both histograms (they are
    * [[categoricalDrift]]'s job as an explicit category if needed).
    * Cost: one percentile aggregate over the base + two count
    * aggregates — the bin shuffles carry nBins rows, never the
    * corpus. The 1-row edge frame is eagerly checkpointed: both
    * binning scans consume it, and an uncut lineage would re-run the
    * percentile aggregate once per snapshot.
    */
  def numericDrift(base: DataFrame, current: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    val edges = graft.etl.Discretize.quantileEdges(base, valueCol, nBins)
      .localCheckpoint(true)
    def binCounts(df: DataFrame, n: String): DataFrame =
      graft.etl.Discretize.withBins(df, valueCol, edges, "bin")
        .filter(col("bin").isNotNull)
        .groupBy(col("bin")).agg(count(lit(1)).as(n))
    categoricalDrift(binCounts(base, "n"), binCounts(current, "n"),
      "bin", "n")
  }

  /** [[numericDrift]] with sketch-fitted edges
    * ([[graft.etl.Discretize.quantileEdgesApprox]]) — the
    * extreme-cardinality escape hatch (the winsorizeApprox
    * discipline): exact `percentile` collects per-group values, the
    * KLL-style sketch keeps constant-size partial state. Sketch edges
    * are engine-specific (§5.3 — this variant cannot hash-gate), but
    * drift only needs edges CONSISTENT across the two snapshots,
    * which the fitted-once frozen frame gives by construction; the
    * identities that matter (identical snapshots → all-zero drift,
    * mass shifts surface in the tail bins) hold under ANY monotone
    * edge set and are spec-pinned.
    */
  def numericDriftApprox(base: DataFrame, current: DataFrame,
      valueCol: String, nBins: Int = 10, accuracy: Int = 10000): DataFrame = {
    val edges = graft.etl.Discretize
      .quantileEdgesApprox(base, valueCol, nBins, accuracy)
      .localCheckpoint(true)
    def binCounts(df: DataFrame, n: String): DataFrame =
      graft.etl.Discretize.withBins(df, valueCol, edges, "bin")
        .filter(col("bin").isNotNull)
        .groupBy(col("bin")).agg(count(lit(1)).as(n))
    categoricalDrift(binCounts(base, "n"), binCounts(current, "n"),
      "bin", "n")
  }

  /** Embedding-space drift between two snapshots — the VECTOR
    * counterpart of [[categoricalDrift]] for monitoring an embedding
    * model swap or a corpus-distribution shift: per label, the squared
    * distance between the snapshots' integer-quantized centroids
    * (the q123 centroid arithmetic on both sides). Per (label, dim) the
    * squared mean difference is floor-quantized to BIGINT BEFORE the
    * per-label sum (the §5.3 quantize-before-sum discipline — double
    * sums are not order-stable, integer sums are). Cost: two posexplode
    * + (label, dim) hash aggs with map-side partials and one
    * label-keyed join — at 100 TB the shuffles carry labels × dims
    * rows, never the corpus. Only labels present in BOTH snapshots are
    * emitted (a centroid of an absent label is undefined — catching
    * appearing/vanishing labels is [[categoricalDrift]]'s job).
    */
  def embeddingDrift(base: DataFrame, current: DataFrame,
      labelCol: String, embCol: String): DataFrame = {
    def cents(df: DataFrame, n: String, m: String): DataFrame = df
      .select(col(labelCol), posexplode(col(embCol)).as(Seq("_pos", "_x")))
      .select(col(labelCol), col("_pos"),
        floor(col("_x").cast("double") * lit(1e6) + lit(0.5)).as("_q"))
      .groupBy(col(labelCol), col("_pos"))
      .agg(count(lit(1)).as(n), sum(col("_q")).as(m))
    val dm = col("_sa").cast("double") / col("_na") -
      col("_sb").cast("double") / col("_nb")
    // |Δmean_q| past ~3e9 (a raw mean gap above ~3e3 units) would push
    // Δ² past Long range and the cast would saturate/wrap silently —
    // error loudly instead; real embedding drift is orders of magnitude
    // below this bound
    val dmSafe = when(abs(dm) > lit(3.0e9),
      raise_error(concat(
        lit("Drift.embeddingDrift: |quantized mean delta| "),
        abs(dm).cast("string"),
        lit(" exceeds the exact-BIGINT term bound (~3e9) — rescale inputs")))
        .cast("double"))
      .otherwise(dm)
    cents(base, "_na", "_sa")
      .join(cents(current, "_nb", "_sb"), Seq(labelCol, "_pos"))
      .select(col(labelCol), col("_na"), col("_nb"),
        floor(dmSafe * dmSafe + lit(0.5)).cast("long").as("_tq"))
      .groupBy(col(labelCol))
      .agg(min(col("_na")).as("_namin"), max(col("_na")).as("_namax"),
        min(col("_nb")).as("_nbmin"), max(col("_nb")).as("_nbmax"),
        sum(col("_tq")).as("drift_q"))
      // ragged embedding lengths make per-dim counts differ within a
      // label — a silently-masked data defect if n were just max()
      .select(col(labelCol),
        when(col("_namin") =!= col("_namax") || col("_nbmin") =!= col("_nbmax"),
          raise_error(concat(
            lit("Drift.embeddingDrift: ragged embedding lengths for label "),
            col(labelCol).cast("string"))).cast("long"))
          .otherwise(col("_namax")).as("n_base"),
        col("_nbmax").as("n_current"),
        col("drift_q"))
  }

  /** Temporal spike detection — the TIME-axis anomaly monitor beside
    * the two snapshot-axis drift monitors: per (category, day), the
    * event count against its trailing `window`-day baseline, as the
    * exact integer-rational spike score
    * `floor(n · w_days · 1e6 / trailing_sum)` (1e6 ≙ exactly at
    * baseline; the count and the trailing sum are exact BIGINTs, so
    * the one division is correctly rounded and engine-portable —
    * same shape as the lift scores). Days with no trailing history
    * (the first `window` days of a category) or a zero baseline emit
    * NULL spike — absence of a baseline is not a spike.
    *
    * Cost: one (cat, day) count aggregate, then a per-category window
    * over DAYS (≤ a few thousand rows per category regardless of
    * corpus size — the shuffle carries cat × days rows, never
    * events). Gaps in the day sequence count as missing days, not
    * zeros — feed a densified calendar upstream if zero-fill
    * semantics are wanted.
    */
  def temporalSpikes(events: DataFrame, tsCol: String, catCol: String,
      window: Int = 7): DataFrame = {
    require(window >= 1, s"temporalSpikes: window must be >= 1, got $window")
    // date_trunc('day') follows spark.sql.session.timeZone; a non-UTC
    // session would silently bucket events into different day_us keys
    // than the UTC-naive oracle and any UTC-pinned caller expects —
    // fail fast, same guard as StreamingFeatures.maintainDailyValueSums
    // (ADVICE r11)
    val tz = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rules = java.time.ZoneId.of(tz).getRules
    require(rules.isFixedOffset &&
        rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0,
      s"temporalSpikes: requires a UTC session time zone so day buckets " +
        s"are zone-independent; got spark.sql.session.timeZone='$tz'")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(catCol))
      .orderBy(col("day_us"))
      .rowsBetween(-window, -1)
    events
      .select(col(catCol),
        unix_micros(date_trunc("day", col(tsCol).cast("timestamp")))
          .as("day_us"))
      .groupBy(col(catCol), col("day_us"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_tn", count(col("n")).over(w))
      .withColumn("_ts", sum(col("n")).over(w))
      .select(col(catCol), col("day_us"), col("n"),
        coalesce(col("_ts"), lit(0L)).as("trail_sum"),
        when(col("_tn") === window && col("_ts") > 0,
          floor(col("n").cast("double") * lit(window.toDouble) * lit(1e6)
            / col("_ts").cast("double")).cast("long"))
          .otherwise(lit(null).cast("long")).as("spike_q"))
  }
}
