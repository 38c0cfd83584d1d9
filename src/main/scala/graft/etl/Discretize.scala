package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile discretization (feature binning): assign each row the bin
  * of its value among n quantile buckets — the feature-store
  * transform behind "decile of spend"-style model features (the
  * reference's notebooks recode categoricals by hand,
  * `/root/reference/includes/setup.py:214-217`; binning is the
  * numeric sibling [extension]).
  *
  * Execution shape: the n−1 exact percentile edges are ONE
  * distributed aggregate folded back as a broadcast 1-row frame
  * (never collected to the driver — same lazy pattern as
  * `ZOrder`'s stats row), and the bin id is a pure projection over
  * the tiny edge array. Fit + transform is a single lazy plan. Exact
  * `percentile` keeps the edges bit-identical to ANSI
  * `quantile_cont` (the q42 contract); at extreme cardinality swap
  * in `approx_percentile` and accept sketch-specific edges
  * (SURVEY §5.3 trade).
  */
object Discretize {

  /** Attach `outCol` = the number of fitted quantile edges <= value:
    * bin 0 holds values below the first edge, bin nBins−1 those at or
    * above the last; a value equal to an edge lands in the upper bin.
    * NULL values get NULL bins via an explicit guard — the HOF
    * `filter` DROPS elements whose predicate is NULL rather than
    * propagating, so without the guard a NULL value would silently
    * land in bin 0 (spec-asserted in DiscretizeSpec).
    */
  def withQuantileBins(df: DataFrame, valueCol: String, nBins: Int,
      outCol: String = "bin"): DataFrame =
    withBins(df, valueCol, quantileEdges(df, valueCol, nBins), outCol)

  /** The n−1 exact percentile edges of `valueCol` as a lazy 1-row
    * `_edges` array frame — split from [[withQuantileBins]] so edges
    * can be FIT on one snapshot and APPLIED to another (train-time
    * edges at serving, base-snapshot edges in
    * [[graft.operators.Drift.numericDrift]] — re-fitting on the
    * current snapshot would hide exactly the shift being measured).
    */
  def quantileEdges(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, s"quantileEdges: need nBins >= 2, got $nBins")
    val probs = (1 until nBins).map(i => i.toDouble / nBins)
    df.agg(
      expr(s"percentile($valueCol, array(${probs.mkString(", ")}))").as("_edges"))
  }

  /** [[quantileEdges]] with the mergeable `approx_percentile` sketch
    * instead of exact `percentile` — the extreme-cardinality path
    * (per-group value collection is the exact aggregate's documented
    * small-SF trade): constant-size partial state per partition, rank
    * error ~n/accuracy. Sketch edges are engine-specific (SURVEY
    * §5.3), so anything built on them is rows-only territory; the
    * drift monitors only need edges CONSISTENT across the two
    * snapshots, which a fitted-once frame gives by construction.
    */
  def quantileEdgesApprox(df: DataFrame, valueCol: String, nBins: Int,
      accuracy: Int = 10000): DataFrame = {
    require(nBins >= 2, s"quantileEdgesApprox: need nBins >= 2, got $nBins")
    // rank error ~1/accuracy must sit well under the 1/nBins bin mass
    // or bin boundaries are noise (the winsorizeApprox fail-fast
    // discipline; 10× is the floor, not a recommendation)
    require(accuracy >= 10 * nBins,
      s"quantileEdgesApprox: accuracy=$accuracy gives rank error " +
        s"~1/$accuracy, too coarse for $nBins bins (need >= ${10 * nBins})")
    val probs = (1 until nBins).map(i => i.toDouble / nBins)
    df.agg(expr(
      s"approx_percentile(CAST($valueCol AS DOUBLE), array(${probs.mkString(", ")}), $accuracy)")
      .as("_edges"))
  }

  /** Multi-signal quality ensemble by quantile normalization — the
    * robust way to combine heterogeneous curation signals (length,
    * punctuation ratio, stopword ratio, LM score …) whose raw scales
    * are incomparable: each signal maps to its quantile bin
    * (rank-normalization without a global sort — the q108
    * single-partition-window cliff never appears), and the ensemble
    * score is the exact integer SUM of bins, so the fused ordering is
    * engine-portable where any weighted-double blend would be
    * ulp-fragile. The corpus-scale sibling of the bounded-list
    * `rrfFuse`: same Borda-style rank fusion, but as two corpus scans
    * (ONE aggregate fits every signal's exact percentile edges
    * simultaneously; scoring is a pure projection under the broadcast
    * 1-row edge frame) instead of a per-candidate loop.
    *
    * A NULL in ANY signal yields a NULL ensemble score (a row that
    * cannot be ranked on some dimension must not outrank one that
    * can); filter or coalesce downstream per policy. Cut the kept set
    * with a percentile threshold or [[Sampling.topFractionBy]] over
    * `outCol` + a deterministic tie-break.
    */
  def ensembleQuantileScore(df: DataFrame, valueCols: Seq[String],
      nBins: Int, outCol: String = "ensemble_q"): DataFrame = {
    require(valueCols.nonEmpty, "ensembleQuantileScore: need >= 1 signal")
    require(nBins >= 2, s"ensembleQuantileScore: need nBins >= 2, got $nBins")
    require(!df.columns.contains(outCol),
      s"ensembleQuantileScore: column '$outCol' already exists")
    val probs = (1 until nBins).map(i => i.toDouble / nBins)
    val aggs = valueCols.zipWithIndex.map { case (c, i) =>
      expr(s"percentile($c, array(${probs.mkString(", ")}))").as(s"_edges_$i")
    }
    val edges = df.agg(aggs.head, aggs.tail: _*)
    val score = valueCols.zipWithIndex.map { case (c, i) =>
      when(col(c).isNull, lit(null).cast("long"))
        .otherwise(size(filter(col(s"_edges_$i"), e => e <= col(c))).cast("long"))
    }.reduce(_ + _)
    df.crossJoin(broadcast(edges))
      .withColumn(outCol, score)
      .drop(valueCols.indices.map(i => s"_edges_$i"): _*)
  }

  /** Attach `outCol` = bin of `valueCol` under a fitted `_edges`
    * frame (from [[quantileEdges]], possibly of a DIFFERENT
    * snapshot). */
  def withBins(df: DataFrame, valueCol: String, edges: DataFrame,
      outCol: String = "bin"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"withBins: column '$outCol' already exists")
    df.crossJoin(broadcast(edges))
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("int"))
          .otherwise(size(filter(col("_edges"), e => e <= col(valueCol))).cast("int")))
      .drop("_edges")
  }
}
