package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [extension] Offline evaluation metrics for the retrieval/ANN tiers
  * (SURVEY.md §7.6): recall@k of an approximate result list against
  * exact ground truth, and mean reciprocal rank. These are the numbers
  * a deployment tunes nprobe/bits/m against before swapping an index
  * tier under a 100 TB corpus.
  *
  * Both inputs are (queryCol, idCol[, rank]) result frames — the shape
  * every top-k operator here emits. Metrics join per (query, neighbor)
  * and aggregate per query: one equi-join shuffle + one aggregate,
  * bounded by |queries|·k rows regardless of corpus size.
  */
object RetrievalMetrics {

  /** Per-query recall = |approx ∩ exact| / |exact| (one row per query
    * with a non-empty exact set; recall is undefined otherwise). "k"
    * is whatever the caller limited the two result frames to — this
    * function does not re-truncate. The macro mean is one
    * `agg(avg("recall"))` away; each query then weighs equally, the
    * standard IR convention.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame,
      queryCol: String, idCol: String): DataFrame = {
    val a = approx.select(col(queryCol), col(idCol)).distinct()
    val e = exact.select(col(queryCol), col(idCol)).distinct()
    val hits = e.join(a, Seq(queryCol, idCol), "left_semi")
      .groupBy(col(queryCol)).agg(count(lit(1)).as("n_hit"))
    e.groupBy(col(queryCol)).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq(queryCol), "left_outer")
      .select(col(queryCol), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact"))
          .as("recall"))
  }

  /** Reciprocal rank per query: 1/rank of the FIRST relevant neighbor
    * in the ranked result (`rankCol` 1-based, as the top-k operators
    * emit). The query universe is the RELEVANT frame's — every query
    * with defined relevance gets a row, and one whose retrieval came
    * back empty (e.g. a queryId absent from the corpus) scores 0
    * rather than silently vanishing and inflating the downstream
    * `avg(rr)` mean.
    */
  def reciprocalRank(ranked: DataFrame, relevant: DataFrame,
      queryCol: String, idCol: String, rankCol: String): DataFrame = {
    val rel = relevant.select(col(queryCol), col(idCol)).distinct()
    val firstHit = ranked
      .join(rel, Seq(queryCol, idCol), "left_semi")
      .groupBy(col(queryCol)).agg(min(col(rankCol)).as("first_rank"))
    rel.select(col(queryCol)).distinct()
      .join(firstHit, Seq(queryCol), "left_outer")
      .select(col(queryCol),
        coalesce(lit(1.0) / col("first_rank"), lit(0.0)).as("rr"))
  }
}
