package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [extension] Connected components over an undirected edge set — the
  * clustering step that turns near-duplicate PAIRS (MinHash/SimHash/
  * cosine candidates from [[Dedup]]/[[Similarity]]) into duplicate
  * GROUPS: each node labeled with the minimum node id of its component,
  * the canonical "keep the earliest, drop the rest" dedup contract.
  * No reference analog (the reference has no graph operators).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
  * MapReduce and Beyond", SoCC 2014). Each round is two window/shuffle
  * passes on the node id; the edge set converges to stars centered at
  * component minima in O(log n) rounds — unlike naive min-label
  * propagation, whose round count is the graph DIAMETER (a 100 M-node
  * chain takes 100 M propagation rounds but ~27 star rounds).
  *
  * Scale shape: per round, large-star is one window min over the
  * symmetrized edges (no adjacency-list materialization — a high-degree
  * hub never becomes a giant in-memory array, it is a sorted window
  * group) and small-star the same over the canonical edges; each round
  * ends in a `localCheckpoint` that cuts lineage so plan depth stays
  * O(1) instead of O(rounds). On a real cluster swap the local
  * checkpoint for a reliable `checkpoint()` dir — same contract.
  * Convergence is detected by set equality (count + left-anti) on the
  * checkpointed frames, one cheap job per round.
  */
object Components {

  /** (node, component) for every node incident to an edge; `component`
    * is the component's minimum node id. Ids can be any orderable type
    * (long, string); NULL endpoints and self-loops are dropped.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxRounds: Int = 50): DataFrame = {
    // canonical form: (u, v) with u > v, distinct, no self-loops
    var cur = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      .localCheckpoint(true)

    var converged = false
    var round = 0
    // carry the count forward: last round's next.count() IS this
    // round's cur.count() — one job per round instead of two
    var curCount = cur.count()
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val nextCount = next.count()
      // fixpoint of two DISTINCT canonical sets: equal counts and an
      // empty one-sided difference imply set equality
      converged = nextCount == curCount &&
        next.join(cur, Seq("u", "v"), "left_anti").isEmpty
      cur = next
      curCount = nextCount
      round += 1
    }
    require(converged,
      s"connectedComponents: no fixpoint after $maxRounds rounds " +
        "(theoretical bound is O(log n) — raise maxRounds only if n warrants it)")

    // fixpoint = stars: every non-min node u carries exactly one edge
    // (u, min); minima appear only on the v side and label themselves
    cur.select(col("u").as("node"), col("v").as("component"))
      .unionByName(cur.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Large-star: every node connects its LARGER neighbors to the
    * minimum of its closed neighborhood. One symmetrize + one window
    * min on the node id; output stays canonical (v > u >= m).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val m = least(col("u"), min(col("v")).over(Window.partitionBy(col("u"))))
    sym.withColumn("m", m)
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every node connects its smaller neighbors (and itself)
    * to the minimum of those. Canonical edges already orient u > v, so
    * the group is exactly the smaller neighborhood; the (u, m) edge
    * rides the row where v hits the minimum — distinct input keeps it
    * emitted once per group.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = min(col("v")).over(Window.partitionBy(col("u")))
    e.withColumn("m", m)
      .select(when(col("v") === col("m"), col("u")).otherwise(col("v")).as("u"),
        col("m").as("v"))
      .distinct()
  }
}
