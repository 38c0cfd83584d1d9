package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Gate queries — round 10: the near-dup retention composition verified
  * over an EXACT pair set, and the serving/maintenance tier added this
  * round (BPE segmentation, delta-CC, decay→feature-store composition).
  *
  * Mixed into [[PipelinesExt]]; the sibling [[OraclesRound10]] below
  * keeps each query's DuckDB oracle SQL in the same file.
  */
private[graft] trait PipelinesRound10 { this: PipelinesBase =>

  /** The q101 composition (pairs → connected components → min-id
    * retention) run over the EXACT tiled-cosine edge set (the q97/q130
    * dup graph) instead of MinHash candidates. q101 stays rows-only
    * because its candidate set depends on Spark's hash functions; here
    * the pair set is engine-portable, so the WHOLE retention pipeline —
    * star-contraction components included — hash-gates against DuckDB's
    * recursive transitive closure. Plan shape is unchanged from
    * production: tiled equi-join pair generation, O(log n) component
    * rounds, one left-anti join against the non-min members.
    */
  def nearDupRetainExact(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val pairs = Similarity.cosineAllPairsTiled(emb, threshold = 0.4)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    Dedup.retainFromPairs(emb, pairs, "vec_id")
      .select(col("vec_id"), col("label"))
      .orderBy("vec_id")
  }
}

/** DuckDB oracle SQL for the [[PipelinesRound10]] queries. */
private[graft] trait OraclesRound10 { this: OracleSnippets =>
  protected def sqlRound10: Map[String, String] = Map(

    // retained = nodes that are their component's minimum label under
    // the recursive closure of the exact cosine edge set — singletons
    // (no edges) are their own component and always survive
    "q138_neardup_retain_exact" ->
      s"""WITH RECURSIVE $ccClosureCtesSql,
         |comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
         |SELECT e.vec_id, e.label
         |FROM embeddings e JOIN comp c ON e.vec_id = c.node
         |WHERE c.component = c.node
         |ORDER BY e.vec_id""".stripMargin,
  )
}
