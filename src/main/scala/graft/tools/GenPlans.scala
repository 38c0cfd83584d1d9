package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Regenerates PLANS.md: `sbt "runMain graft.tools.GenPlans"`. */
object GenPlans {
  val picks: Seq[(String, String)] = Seq(
    ("q11_pricing_summary", "TPC-H-Q1-shaped aggregation: filter pushed to the parquet scan (PushedFilters), 6-col pruned ReadSchema, map-side partial aggregation, one hash exchange on the 2-key group."),
    ("q07_training_set", "Training-set assembly (J3): feature tables pruned to key+features BEFORE the joins, both lookup joins BroadcastHashJoin LeftOuter (feature side broadcast); at 100 TB AQE swaps these to sort-merge on the shared c_custkey key."),
    ("q15_sql_revenue_per_nation", "SQL entry: 5-table join — Catalyst broadcast-joins the dims (nation/region/customer) and reorders so lineitem↔orders is the only big join."),
    ("q29_embedding_knn", "Brute-force kNN: query side broadcast, corpus never shuffled; scoring is the codegen'd graft_dot expression. The BroadcastNestedLoopJoin here is deliberate and safe: the build side is the (small-by-contract) query batch, so the 'loop' is exactly one corpus scan scoring all k queries — the optimal exact plan; corpus-× -corpus nested loops are what's banned (see q30). The row_number<=k filter is rewritten by Catalyst's InferWindowGroupLimit into Partial+Final WindowGroupLimit — a per-partition top-k heap BEFORE the shuffle — which is why no custom top-k operator is needed (SURVEY §4: don't hand-schedule what the optimizer already does)."),
    ("q33_pit_training_set", "Point-in-time lookup: union of probes+features, ONE exchange on user_id, window last-ignoreNulls — no range join, no per-version explosion."),
    ("q30_cosine_near_dup", "Exact near-dup pairs (round 6: the gate now runs the deterministic tiled path): block-tiled equi-joins bound per-task memory, each unordered pair meets exactly once — no BroadcastNestedLoopJoin. The probabilistic banded-LSH variant is q66 (rows-only), spec-asserted equal to this exact path."),
    ("q66_cosine_lsh", "Banded hyperplane-LSH near-dup (round 3): candidate generation is an equi-join on (band, signature) buckets — NO BroadcastNestedLoopJoin anywhere — followed by exact-cosine re-rank of candidates only. At gate scale AQE broadcasts the narrow id/bucket side; at 100 TB both sides shuffle on the bucket key."),
    ("q14_publish_online", "Online publish (round 3): repartitionByRange on the key + sortWithinPartitions — n-way parallel, per-file key-sorted, disjoint key ranges (the KV bulk-load shape); the old single-partition write is gone."),
    ("q54_range_join", "Bucketed range join (round 5): the interval side explodes to covering time buckets, the point side computes its single bucket, and the join is an EQUI join on the bucket id with a residual range filter — no BroadcastNestedLoopJoin. At 100 TB both sides shuffle on the bucket key; hot buckets split under AQE skew handling."),
    ("q56_range_frame_window", "RANGE-frame rolling window: one exchange on the partition key, one sort, a running frame scan per partition — the interval frame runs on epoch-µs longs so frame bounds are integer comparisons."),
    ("q57_pit_forward", "Forward as-of join (round 5): same union+single-exchange+window shape as q33, time order reversed — label attachment without a range join or per-version explosion."),
    ("q62_expectations", "Data-quality audit (round 5): five row-local checks + a unique-key count-distinct share ONE scan of lineitem (a single HashAggregate chain with an Expand for the distinct); the referential check is the one extra anti-join. Check count does not multiply scan count."),
    ("q69_min_cost_supplier", "TPC-H Q2 shape (round 7): the correlated scalar-min is rewritten to agg-once + join-back — lineitem is scanned twice but the min is computed ONCE (never per outer row); at this SF the 2-column agg output is broadcast back, at 100 TB AQE falls back to a sort-merge join where the agg and the join share the l_partkey partitioning. Equality on the double price is exact (min/=, no arithmetic); part/supplier dims broadcast."),
    ("q70_waiting_suppliers", "TPC-H Q21 shape (round 7): EXISTS compiles to a LEFT SEMI and NOT EXISTS to a LEFT ANTI hash join on l_orderkey — equi joins end to end, no nested loop despite the l2.l_suppkey <> l1.l_suppkey disequality (it rides along as the join residual). At this SF the projected 2-column lineitem sides broadcast; at 100 TB all three sides shuffle on the shared l_orderkey key and AQE splits skewed orders."),
    ("q76_big_volume_orders", "TPC-H Q18 shape (round 7): the IN + HAVING subquery is a LEFT SEMI join against the grouped lineitem — at this SF the grouped build side broadcasts; at 100 TB the group-by aggregate, the semi join, and the final per-order aggregate all key on l_orderkey, so one hash partitioning serves all three. The customer dim broadcasts; top-100 runs as TakeOrderedAndProject."),
    ("q80_semantic_dedup", "Semantic dedup, exact (round 7): the earliest-survivor retained set is ONE anti join against the tiled all-pairs near-dup output — the Θ(n²) similarity work keeps the tiled equi-join shape (bounded per-task memory, no BroadcastNestedLoopJoin) and the retention step adds only a distinct + LEFT ANTI hash join on the id. The clustered SemDeDup variant (q81) replaces the all-pairs stage with per-cell joins."),
    ("q82_vocab_prune", "Corpus stop-word pruning (round 7): the document-frequency pass is one explode+hash-agg; the top-k stop list runs as TakeOrderedAndProject (per-partition top-k partials — the vocabulary is never globally sorted in one partition) and collapses to a 1-row array that broadcast-crosses onto the corpus; the rebuild itself is a pure HOF projection inside the scan — the corpus is read once and never shuffled for the rewrite."),
    ("q84_disjunctive_revenue", "TPC-H Q19 shape (round 7): Catalyst splits the brand/size/quantity disjunction — the (p_brand,p_size) arms push into the part scan and the l_quantity bounds into the lineitem scan (PushedFilters on BOTH sides), the full OR evaluates as the join residual. Part side broadcasts at this SF; at 100 TB both sides shuffle on the part key with the per-side filters still cutting the scan."),
    ("q86_incremental_agg", "Incremental aggregate maintenance (round 7): the delta is aggregated alone (partial+final hash agg over ONLY the post-cutoff scan) and full-outer-merged with the base state per key — the plan contains two pruned scans and two key exchanges, no re-aggregation of history; at 100 TB the base side is the stored state table (|keys| rows), so refresh cost tracks the delta, not the corpus."),
    ("q35_ivf_ann", "IVF ANN (round 7 quantizer rewrite): the coarse centroids are fit LOCALLY on a bounded hash-ordered sample (the PQ/faiss discipline — a distributed KMeans's per-job overhead dwarfed the arithmetic) and folded back as literals, so cell assignment is a codegen'd chain of nlist dot products + least/coalesce argmin INSIDE the corpus scan projection — no ML vector conversion, no UDF, no fit jobs in this plan. The probe side crosses the tiny centroid frame and the candidate join shuffles on the cell id only."),
    ("q87_partitioned_scan", "Partition-pruned layout scan (round 7): the read-back side's FileScan shows PartitionFilters on event_type — only the matching directory of the rewritten table is listed and read; the aggregation on top is an ordinary partial+final hash agg on user_id. The write side (PARTITIONED BY event_type) ran before this plan; at 100 TB the same shape prunes by date/tenant dirs."),
    ("q92_fuzzy_names", "Edit-distance join (round 8 rewrite): every stage is an EQUI join — long strings meet on shared q-grams with ED-Join MULTISET count filtering (shared >= max(len)−q+1−maxDist·q, computed as sum(least(cnt_a,cnt_b)) per pair, so a hot gram cannot flood the levenshtein stage), short strings meet on 1-grams with the same bound at q=1 against the |Δlen|<=maxDist band, and tiny strings (len<=maxDist — all pairwise matches by definition) meet in one sentinel hash bucket. No BroadcastNestedLoopJoin and no CartesianProduct anywhere (spec-asserted, DedupSpec); the exact banded levenshtein(threshold) runs on count-filtered candidates only."),
    ("q97_dup_clusters", "Connected-components dup clustering (round 8): this is the FINAL labeling plan — the alternating large-star/small-star rounds ran before it and each ended in a localCheckpoint, so the fixpoint edge set enters as an RDD scan (no O(rounds) lineage). The plan itself is the star unwrap (union of both edge roles + distinct) left-joined onto the corpus ids with coalesce for singletons — hash equi joins only; each ITERATION'S plan is two window mins over the node id (no adjacency-list aggregation, so a high-degree hub is a sorted window group, never a task-memory array)."),
    ("q98_stratified_sample", "Deterministic stratified sampling (round 8): the md5-threshold CASE folds into the scan-stage Filter — no Exchange, no sample operator, no RNG state; the FileScan reads only the projected columns. At 100 TB this is the only sampling shape whose verdicts survive re-partitioning, engine swap, and incremental growth (nested-sample property)."),
    ("q99_chunk_documents", "Token-window chunking (round 8): a NARROW flatMap — tokens split once, the chunk-id sequence is generated inside the row, Generate(explode) expands to (doc, chunk) rows and every chunk column (slice + array_join) computes in the scan stage's projection. Zero exchanges before the gate's ORDER BY; output partitioning inherits the scan's, so a 100 TB corpus chunks in one pass."),
    ("q100_packing_plan", "Sequence-packing plan (round 8): one Exchange on the stream key + one sort, then the running token sum and every pack column derive in a single Window + Project — never a global single-partition sort; per-stream offsets are the contract that keeps the window distributed at 100 TB (stream key must bound per-stream volume, e.g. source × date shard)."))

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of flagship queries (generated)\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.tools.GenPlans\"`.\n")
    for ((q, note) <- picks) {
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      sb.append(s"\n## $q\n\n$note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
