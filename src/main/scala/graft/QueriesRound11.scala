package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Components, Dedup, Perceptron, Similarity}

/** Gate queries — round 11: consolidation compositions (VERDICT r10
  * #5/#6/#7). The quality-classifier curation loop (train → score →
  * filter, the CCNet shape), retention served from incrementally
  * maintained dup labels, and the exact-row promotion of the
  * `summary()` gate.
  *
  * Mixed into [[PipelinesExt]]; the sibling [[OraclesRound11]] below
  * keeps each query's DuckDB oracle SQL in the same file.
  */
private[graft] trait PipelinesRound11 { this: PipelinesBase =>

  /** The CCNet-style quality-classifier loop, end to end: a perceptron
    * trains on the LABELED SLICE (doc_id % 5 = 0; label = lang = 'en'),
    * the learned 257-weight model comes back as a literal array, and
    * the corpus flows exact-dedup → zero-shuffle scoring projection →
    * margin-threshold filter — q143's training composed into the q124
    * curation discipline. The retention rule is the scale-free one a
    * curation run actually uses: keep documents scoring strictly ABOVE
    * the corpus-median margin (the q104 top-fraction discipline; a
    * fixed margin>0 cut depends on the slice's class balance and can
    * degenerate to keep-none/keep-all). The oracle replays all stages —
    * the unrolled training recurrence ON THE SLICE, the dedup
    * survivors, the margin arithmetic, and the exact median — so drift
    * in any stage breaks the hash.
    *
    * Scale shape: training touches only the labeled slice (one feature
    * extraction + per-iteration model round-trips); the corpus-sized
    * work is the dedup window, one scan projection for margins (no join
    * attaches the model), and one 1-row exact percentile broadcast back
    * (the q136 winsorize shape).
    */
  def classifierCuration(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val labeled = docs.filter(col("doc_id") % 5 === 0)
    val w = Perceptron.batchPerceptronHashed(labeled, "doc_id", "text",
      positive = col("lang") === "en", iterations = 3)
      .orderBy("pos").collect().map(_.getLong(1)).toSeq
    val deduped = Dedup.exactDedup(docs, "text", "doc_id")
    val scored = Perceptron.withHashedPerceptronScore(deduped, "text", w)
      .select(col("doc_id"), col("source"), col("margin_q"))
    val med = scored.agg(expr("percentile(margin_q, 0.5)").as("_med"))
    scored.crossJoin(broadcast(med))
      .filter(col("margin_q") > col("_med"))
      .select(col("doc_id"), col("source"), col("margin_q"))
      .orderBy("doc_id")
  }

  /** Retention over incrementally-MAINTAINED labels — q140's delta-CC
    * composed into q138's retention, the serving path of a
    * continuously maintained dedup graph: prior labels from the even
    * half of the exact cosine edge set, the odd half merged in via
    * [[Components.incrementalComponents]], then min-id retention off
    * those labels (singletons absent from the labeling survive by
    * construction). The oracle is the FULL-recompute retention (q138
    * verbatim), so the hash proves retention over incremental labels ≡
    * retention over full recompute.
    */
  def incrementalRetention(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    // one lineage cut: prior and delta both filter this pair set
    val pairs = Similarity.cosineAllPairsTiled(emb, threshold = 0.4)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint(true)
    val prior = Components.connectedComponents(
      pairs.filter((col("src") + col("dst")) % 2 === 0))
    val labels = Components.incrementalComponents(prior,
      pairs.filter((col("src") + col("dst")) % 2 === 1))
    val dropped = labels.filter(col("node") =!= col("component"))
      .select(col("node").as("_drop_id"))
    emb.join(dropped, col("vec_id") === col("_drop_id"), "left_anti")
      .select(col("vec_id"), col("label"))
      .orderBy("vec_id")
  }

  /** The exact rows of `df.summary()` promoted to a hash gate (q45
    * keeps the full stat set as the declared rows-only entry):
    * count/min/max are order-independent exact aggregates, so their
    * formatted cells hash-match cross-engine. The mean row
    * deliberately stays out — a cross-row double sum is
    * partition-order-dependent (SURVEY.md §5.3); its in-session bit
    * parity is what SummaryParitySpec proves.
    */
  def summaryExactRows(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .summary("count", "min", "max")
      .orderBy("summary")
}

/** DuckDB oracle SQL for the [[PipelinesRound11]] queries. */
private[graft] trait OraclesRound11 { this: OracleSnippets with OraclesRound10 =>
  protected def sqlRound11: Map[String, String] = Map(

    // the q143 training recurrence restricted to the labeled slice,
    // then the q124 dedup-survivor CTE, then the q144 margin replay
    // over the survivors — threshold filter at the end
    "q151_classifier_curation" ->
      s"""WITH ${perceptronCtesSql(3, " WHERE doc_id % 5 = 0")},
         |dd AS MATERIALIZED (
         |  SELECT doc_id, source, text FROM (
         |    SELECT doc_id, source, text,
         |      row_number() OVER (PARTITION BY $fpSql ORDER BY doc_id) AS rn
         |    FROM documents) WHERE rn = 1),
         |fa AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST((strpos('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16
         |      + (strpos('0123456789abcdef', substr(md5(term), 2, 1)) - 1) AS BIGINT) AS pos,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []
         |        ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END) AS term
         |      FROM dd)
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT f.doc_id, CAST(sum(f.cnt * w.w) AS BIGINT) AS dot
         |  FROM fa f JOIN w3 w ON w.pos = f.pos
         |  GROUP BY 1),
         |mar AS MATERIALIZED (
         |  SELECT d.doc_id, d.source,
         |    CAST(coalesce(sc.dot, 0) + (SELECT w FROM w3 WHERE pos = 256) AS BIGINT) AS margin_q
         |  FROM dd d LEFT JOIN sc USING (doc_id)),
         |med AS (SELECT quantile_cont(CAST(margin_q AS DOUBLE), 0.5e0) AS m FROM mar)
         |SELECT doc_id, source, margin_q FROM mar, med
         |WHERE CAST(margin_q AS DOUBLE) > m
         |ORDER BY doc_id""".stripMargin,

    // the q138 oracle VERBATIM — full recursive closure + min-id
    // retention; the Spark side answers from incrementally-maintained
    // labels, so a hash match IS the incremental ≡ full-recompute proof
    "q152_incremental_retention" ->
      s"""WITH RECURSIVE $ccClosureCtesSql,
         |comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
         |SELECT e.vec_id, e.label
         |FROM embeddings e JOIN comp c ON e.vec_id = c.node
         |WHERE c.component = c.node
         |ORDER BY e.vec_id""".stripMargin,

    // summary()'s exact rows as formatted cells: counts are BIGINTs,
    // min/max are raw column doubles — both engines print
    // shortest-round-trip decimal strings for them
    "q153_summary_exact" ->
      """SELECT 'count' AS summary,
        |  CAST(count(l_quantity) AS VARCHAR) AS l_quantity,
        |  CAST(count(l_extendedprice) AS VARCHAR) AS l_extendedprice,
        |  CAST(count(l_discount) AS VARCHAR) AS l_discount
        |FROM lineitem
        |UNION ALL
        |SELECT 'min', CAST(min(l_quantity) AS VARCHAR),
        |  CAST(min(l_extendedprice) AS VARCHAR),
        |  CAST(min(l_discount) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'max', CAST(max(l_quantity) AS VARCHAR),
        |  CAST(max(l_extendedprice) AS VARCHAR),
        |  CAST(max(l_discount) AS VARCHAR)
        |FROM lineitem
        |ORDER BY summary""".stripMargin,
  )
}
