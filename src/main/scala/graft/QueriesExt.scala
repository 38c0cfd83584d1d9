package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.etl.Features
import graft.ext.{Chunking, Components, Dedup, Pq, Similarity, TextAnalysis}
import graft.fs.{FeatureTableSpec, PointInTime, WriteMode}

/** Batch 2 (reference surface completion: U1 per-row counts, summary
  * stats, events window/json ops, online publish) and batch 3
  * ([extension] dedup / text analysis / similarity) queries.
  *
  * Events timestamps are emitted as epoch MICROS (BIGINT) everywhere:
  * Spark reads the ns-precision parquet truncated to micros while
  * DuckDB reads full ns, so comparing raw timestamps would be a dtype
  * coin-flip; integer micros are unambiguous.
  */
/** Shared plumbing for the gate-query traits: table loading and
  * the per-(session, dir) temp feature-store cache the PIT gates
  * reuse across queries.
  */
private[graft] trait PipelinesBase {

  protected def t(s: SparkSession, d: String, name: String) = Tables.load(s, d, name)

  /** [[t]] + the opt-in scan spread ([[Tables.loadSpread]]): for gates
    * whose scan-stage per-row compute is the bottleneck (measured
    * wall ≈ cpu on a multi-core session — the serial family). Light
    * gates stay on [[t]]: the spread's per-task fixed costs (task
    * deserialization of the plan subtree, agg-map setup, JIT-cold
    * codegen) outweigh sub-second per-row work.
    */
  protected def tSpread(s: SparkSession, d: String, name: String) =
    Tables.loadSpread(s, d, name)

  private val pitStores =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), graft.fs.FeatureStore]()
  protected def fsTempStoreFor(s: SparkSession, d: String): graft.fs.FeatureStore =
    pitStores.computeIfAbsent((s, d), _ => graft.fs.FeatureStore.temp(s))

  /** The q143 corpus-perceptron weights, memoized per (session, dir)
    * — q143 measures TRAINING and q144 measures SERVING; without the
    * memo the serving gate re-ran the whole training loop (the r10
    * verdict's double-train nit). Same discipline as the feature-store
    * memo: a real deployment trains once and serves many, and Bench
    * drops the memo between passes so re-measured work stays honest.
    */
  private val perceptronWeightsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Seq[Long]]()
  protected def corpusPerceptronWeights(s: SparkSession, d: String): Seq[Long] =
    perceptronWeightsMemo.computeIfAbsent((s, d), _ =>
      graft.ext.Perceptron.batchPerceptronHashed(tSpread(s, d, "documents"),
        "doc_id", "text", positive = col("lang") === "en", iterations = 3)
        .orderBy("pos").collect().map(_.getLong(1)).toSeq)

  /** The exact brute-force top-5 ground truth every ANN invariant gate
    * compares against, memoized per (session, dir) and materialized
    * (50 rows, localCheckpoint): five tiers share one exact pass per
    * bench sweep instead of re-scoring the corpus five times. Bench
    * drops the memo between passes (invalidatePitStores) so the
    * re-measured work stays honest — the train-once/serve-many
    * discipline of the feature-store and perceptron memos.
    */
  private val annExactMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  protected def annExactTop5(s: SparkSession, d: String): DataFrame =
    annExactMemo.computeIfAbsent((s, d), _ => {
      val emb = t(s, d, "embeddings")
      graft.ext.Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .localCheckpoint(true)
    })

  private[graft] def invalidatePitStores(): Unit = {
    pitStores.clear()
    perceptronWeightsMemo.clear()
    annExactMemo.clear()
  }

  /** Wrap an approximate-ANN result as a PORTABLE invariant gate (r11
    * verdict ask #2): the selected neighbor SET is engine-specific
    * (cell routing / codebooks / plane families, SURVEY §5.3), but
    * these per-query facts are not, and the driver can hash them:
    *
    *   - n_neighbors / n_distinct: exactly k distinct neighbors;
    *   - ranks_dense: ranks are exactly 1..k in order;
    *   - cosines_ok: scores are the TRUE cosines — non-increasing in
    *     rank and bounded by the exact top-1 (an approximate tier can
    *     select a worse neighbor, never a better-than-optimal score);
    *   - recall_ok (when `recallFloor` is set): corpus-level
    *     recall@k against the exact result clears the tier's pinned
    *     floor (the AnnRecallGateSpec floors, now driver-visible).
    *
    * A broken band join, mis-probed cell, corrupted codebook, or
    * score drift flips a boolean and fails the hash gate. The exact
    * side is one bruteForceTopK over the (small, broadcast) query
    * batch — the corpus is scanned once more, never shuffled.
    */
  protected def annInvariantGate(annRaw: DataFrame, exact: DataFrame, k: Int,
      recallFloor: Option[Double]): DataFrame = {
    // the ANN result (k·|queries| rows) feeds BOTH the per-query facts
    // and the recall join — without the checkpoint the whole probe
    // pipeline (index scans, codebook scoring) executes twice per
    // action (the shared-consumer lesson)
    // EAGER deliberately (r19 re-measured): the recall arm rides a
    // broadcast build that races the per-query arm — a lazy mark lets
    // both compute the unmaterialized probe pipeline concurrently
    // (double compute, measured +0.9 CPU-s on q78); eager
    // materializes once before either consumer starts
    val ann = annRaw.localCheckpoint(true)
    val perQ = ann.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_neighbors"),
      countDistinct(col("neighbor_id")).as("n_distinct"),
      array_sort(collect_list(struct(col("rank"), col("cosine")))).as("_rc"))
      .withColumn("ranks_dense",
        transform(col("_rc"), x => x.getField("rank")) === sequence(lit(1), lit(k)))
      .withColumn("_nonincr",
        forall(zip_with(slice(col("_rc"), 1, k - 1), slice(col("_rc"), 2, k - 1),
          (a, b) => a.getField("cosine") >= b.getField("cosine")), x => x))
      .withColumn("_maxc", element_at(col("_rc"), 1).getField("cosine"))
    val top1 = exact.filter(col("rank") === 1)
      .select(col("query_id"), col("cosine").as("_top1"))
    val base = perQ.join(broadcast(top1), Seq("query_id"))
      .withColumn("cosines_ok", col("_nonincr") && col("_maxc") <= col("_top1"))
    val out = recallFloor match {
      case None => base
      case Some(floor) =>
        val truth = exact.select(col("query_id"), col("neighbor_id"))
        val r = ann.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("_hits"))
          .crossJoin(broadcast(exact.agg(count(lit(1)).as("_truth"))))
          .select((col("_hits").cast("double") / col("_truth")).as("_recall"))
        base.crossJoin(broadcast(r))
          .withColumn("recall_ok", col("_recall") >= floor)
    }
    out.select(Seq(col("query_id"), col("n_neighbors"), col("n_distinct"),
      col("ranks_dense"), col("cosines_ok")) ++
      (if (recallFloor.isDefined) Seq(col("recall_ok")) else Nil): _*)
      .orderBy("query_id")
  }
}

/** All gate queries, split per theme (VERDICT r9 #4): each
  * `Queries<Theme>.scala` file holds a Pipelines trait and the
  * matching Oracles trait so a query and its DuckDB oracle SQL
  * review as one unit. This object is the stable entry point —
  * `SparkEntry`, tests, and streaming parity specs address
  * everything as `PipelinesExt.<query>`.
  */
object PipelinesExt extends PipelinesBase
  with PipelinesSurface with PipelinesTextSim with PipelinesSqlSuite
  with PipelinesCuration with PipelinesTpchDeep with PipelinesBehavior
  with PipelinesVectorSketch with PipelinesTextHygiene
  with PipelinesRetrieval with PipelinesScaleOps
  with PipelinesRound10 with PipelinesRound11 with PipelinesRound11b
  with PipelinesRound11c with PipelinesRound12 with PipelinesRound13
  with PipelinesRound14 with PipelinesRound15 with PipelinesRound16
  with PipelinesRound16b with PipelinesRound17 with PipelinesRound18

/** Shared DuckDB SQL snippets: ONE source of truth for semantics
  * multiple gates reuse (thresholds, token/gram definitions, the
  * dup-graph closure) — a width changed in one copy but not
  * another would let a gate verify against stale semantics.
  */
private[graft] trait OracleSnippets {

  /** DuckDB-side normalized-text fingerprint (note the 'g' flag —
    * DuckDB regexp_replace is first-match-only without it; Spark's
    * replaces all).
    */
  protected val fpSql = """md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"""

  // exact verbatim 8-gram overlap vs probe docs 3/7/11/19/23 — ground
  // truth for BOTH q79 (gram equi-join) and q109 (bloom-prefiltered)
  // --- shared oracle snippets: ONE source of truth for semantics that
  // multiple gates reuse (a threshold or window width changed in one
  // copy but not another would let a gate verify against stale
  // semantics). Raw whitespace tokens, the 8-token md5 gram list, and
  // the q97/q120 recursive connected-components closure.
  protected val rawTokensCaseSql =
    """CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN []
      |         ELSE regexp_split_to_array(trim(text), '\s+') END""".stripMargin

  /** The oracle side of `PipelinesBase.annInvariantGate`: the portable
    * facts recomputed from raw data — k rows per query with every
    * invariant TRUE. SURVEY §5.3: the booleans are invariant-only
    * (they assert facts about the engine-specific selection, not the
    * selection itself).
    */
  protected def annInvariantOracleSql(withRecall: Boolean): String =
    s"""SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_neighbors,
       |  CAST(5 AS BIGINT) AS n_distinct, TRUE AS ranks_dense,
       |  TRUE AS cosines_ok${if (withRecall) ",\n  TRUE AS recall_ok" else ""}
       |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin

  // ---- portable signature hashing (r12): the md5-13-hex base hash
  // ---- and the MinHash/SimHash signature pipelines replayed in exact
  // ---- BIGINT arithmetic, mirroring VectorExpressions' portableHash
  // ---- flavor ingredient for ingredient.

  /** 13-hex-char md5 prefix parsed positionally to a BIGINT (< 2⁵²) —
    * the DuckDB replay of `VectorExpressions.md5Hash52`. `m` must be a
    * 32-char md5 hex column/expression.
    */
  protected def md5Hex52Sql(m: String): String =
    (0 until 13).map { i =>
      s"(CAST(strpos('0123456789abcdef', substr($m, ${i + 1}, 1)) AS BIGINT) - 1) * ${1L << (4 * (12 - i))}"
    }.mkString("\n      + ")

  /** documents UNION a deterministically perturbed copy (doc_id +
    * 1,000,000; first word dropped) — the exact DuckDB twin of
    * `PipelinesTextSim.docsWithPlantedDups`, the shared input of every
    * near-dup gate.
    */
  protected val plantedDupsCteSql =
    """dp AS (SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    regexp_replace(text, '^\S+\s*', '') AS text
      |  FROM documents)""".stripMargin

  /** The portable-MinHash pipeline over a (doc_id, text) CTE `src`:
    * word `n`-gram windows of lowercased whitespace tokens → md5-52
    * base hash mod p → per-permutation minima under the shared affine
    * family (`VectorExpressions.MinHashFamily`, constants spliced as
    * literals) → banded candidates (`bands` equi-join arms on the
    * consecutive signature slices) → agreement-fraction estimate.
    * Emits CTEs mtk/mg/mh/ms/mcand/mest; consumers read
    * mest(id_a, id_b, est_jaccard) and/or mtk(doc_id, toks).
    * Docs with fewer than n tokens drop out of ms — the NULL-signature
    * filter's twin.
    */
  protected def minhashEstCtesSql(src: String, n: Int, numHashes: Int,
      bands: Int): String = {
    import graft.functions.VectorExpressions.MinHashFamily
    val P = MinHashFamily.P
    val rows = numHashes / bands
    val gram = (0 until n).map {
      case 0 => "toks[i]"
      case j => s"toks[i+$j]"
    }.mkString(" || ' ' || ")
    val mins = (0 until numHashes).map { j =>
      s"min((${MinHashFamily.a(j)} * h + ${MinHashFamily.b(j)}) % $P) AS h$j"
    }.mkString(",\n    ")
    val bandArms = (0 until bands).map { b =>
      val conds = (b * rows until (b + 1) * rows)
        .map(j => s"a.h$j = b.h$j").mkString(" AND ")
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |    FROM ms a JOIN ms b ON $conds AND a.doc_id < b.doc_id""".stripMargin
    }.mkString("\n    UNION ALL ")
    val agree = (0 until numHashes)
      .map(j => s"CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END")
      .mkString("\n      + ")
    s"""mtk AS (SELECT doc_id,
       |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
       |  FROM $src),
       |mg AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks) - ${n - 1}),
       |      i -> $gram)) AS gram
       |  FROM mtk WHERE len(toks) >= $n),
       |mh AS (SELECT doc_id, (${md5Hex52Sql("m")}) % $P AS h
       |  FROM (SELECT doc_id, md5(gram) AS m FROM mg)),
       |ms AS (SELECT doc_id,
       |    $mins
       |  FROM mh GROUP BY doc_id),
       |mcand AS (SELECT DISTINCT id_a, id_b FROM (
       |    $bandArms)),
       |mest AS (SELECT c.id_a, c.id_b,
       |    CAST(($agree) AS DOUBLE) / $numHashes AS est_jaccard
       |  FROM mcand c JOIN ms a ON a.doc_id = c.id_a
       |    JOIN ms b ON b.doc_id = c.id_b)""".stripMargin
  }

  /** The portable-SimHash pipeline over a (doc_id, text) CTE `src`:
    * per token, 52 vote bits from the md5-52 hash; signature = the
    * majority-vote integer; candidates = pairs sharing any of the 4
    * 13-bit pigeonhole blocks. Emits stk/sth/svb/ssg; consumers rank
    * candidates off ssg(doc_id, sh). Token-less docs drop out at sth —
    * the portable flavor's NULL-signature twin.
    */
  protected def simhashCtesSql(src: String): String = {
    val bits = graft.functions.VectorExpressions.SimHash64.portableBits
    val votes = (0 until bits)
      .map(b => s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val sig = (0 until bits)
      .map(b => s"CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
      .mkString("\n      + ")
    s"""stk AS (SELECT doc_id,
       |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
       |  FROM $src),
       |sth AS (SELECT doc_id, (${md5Hex52Sql("m")}) AS h
       |  FROM (SELECT doc_id, md5(w) AS m
       |        FROM (SELECT doc_id, unnest(toks) AS w FROM stk))),
       |svb AS (SELECT doc_id,
       |    $votes
       |  FROM sth GROUP BY doc_id),
       |ssg AS (SELECT doc_id,
       |    ($sig) AS sh
       |  FROM svb)""".stripMargin
  }

  // NOTE: continuation lines here must never START with "||" — this
  // snippet is interpolated into outer strings whose stripMargin would
  // eat the first pipe and corrupt the concat operator.
  protected def gram8Sql(w: String): String =
    s"""CASE WHEN len($w) < 8 THEN []
       |      ELSE list_distinct(list_transform(generate_series(1, len($w) - 7),
       |        i -> md5($w[i] || ' ' || $w[i+1] || ' ' || $w[i+2] || ' ' || $w[i+3] || ' ' ||
       |          $w[i+4] || ' ' || $w[i+5] || ' ' || $w[i+6] || ' ' || $w[i+7])))
       |    END""".stripMargin

  // the q97/q120/q130 near-dup edge set (cosine ≥ 0.4, symmetrized) —
  // one source of truth for every gate built on the dup graph
  protected val dupEdgesCtesSql =
    """pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < b.vec_id
      |    AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
      |), edges AS (
      |  SELECT id_a AS u, id_b AS v FROM pairs
      |  UNION
      |  SELECT id_b AS u, id_a AS v FROM pairs
      |)""".stripMargin

  protected val ccClosureCtesSql =
    dupEdgesCtesSql + """, reach(node, lbl) AS (
      |  SELECT vec_id, vec_id FROM embeddings
      |  UNION
      |  SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.lbl
      |)""".stripMargin

  /** The q130 quantized-PageRank recurrence (deg/nn/r0..r`iters` over
    * an `edges` CTE) — ONE source of truth for every gate ranking the
    * dup graph; exact-BIGINT integer division throughout, matching
    * `Components.pageRankQuantized`.
    */
  protected def pageRankCtesSql(iters: Int): String = {
    def iter(k: Int): String =
      s"""r$k AS (SELECT e.v AS node,
         |    (CAST(15 AS BIGINT) * 1000000000) // (CAST(100 AS BIGINT) * n)
         |      + sum((CAST(85 AS BIGINT) * r.rq) // (CAST(100 AS BIGINT) * d.deg)) AS rq
         |  FROM r${k - 1} r JOIN edges e ON e.u = r.node
         |    JOIN deg d ON d.u = r.node CROSS JOIN nn
         |  GROUP BY e.v, n)""".stripMargin
    s"""deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
       |r0 AS (SELECT u AS node, CAST(1000000000 AS BIGINT) // n AS rq
       |  FROM deg CROSS JOIN nn),
       |${(1 to iters).map(iter).mkString(",\n")}""".stripMargin
  }

  /** The q131 distributed-Lloyd recurrence unrolled over the
    * embeddings table (seeds = the k smallest vec_ids, exact-BIGINT
    * distances, floor-mean update, emptied clusters keep their
    * centroid — `Clustering.kmeansAssignQuantized` exactly): the
    * final assignment is `a{iterations+1} ... WHERE rk = 1` as
    * (vec_id, cid, dist). ONE source of truth for q131's clustering
    * gate and the prototypicality-pruning gate built on it.
    */
  protected def kmeansCtesSql(k: Int, iterations: Int): String = {
    def round(j: Int): String =
      s"""d$j AS (
         |  SELECT qd.vec_id, c.cid,
         |    CAST(sum((qd.val - c.val) * (qd.val - c.val)) AS BIGINT) AS dist
         |  FROM qd JOIN c${j - 1}d c ON qd.pos = c.pos
         |  GROUP BY qd.vec_id, c.cid),
         |a$j AS (
         |  SELECT vec_id, cid, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |  FROM d$j),
         |m$j AS (
         |  SELECT a.cid, qd.pos,
         |    CAST(floor(CAST(CAST(sum(qd.val) AS BIGINT) AS DOUBLE)
         |      / count(*)) AS BIGINT) AS val
         |  FROM a$j a JOIN qd ON a.vec_id = qd.vec_id AND a.rk = 1
         |  GROUP BY a.cid, qd.pos),
         |c${j}d AS (
         |  SELECT c.cid, c.pos, coalesce(m.val, c.val) AS val
         |  FROM c${j - 1}d c LEFT JOIN m$j m ON m.cid = c.cid AND m.pos = c.pos)"""
        .stripMargin
    val fin = iterations + 1
    s"""q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS v
       |  FROM embeddings),
       |qd AS (
       |  -- constant bound: the embeddings table is 64-dim (TESTDATA.md)
       |  SELECT vec_id, gi.i AS pos, v[gi.i] AS val
       |  FROM q, generate_series(1, 64) AS gi(i)),
       |seeds AS (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT $k),
       |c0 AS (
       |  SELECT v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
       |  FROM seeds),
       |c0d AS (
       |  SELECT cid, gi.i AS pos, v[gi.i] AS val
       |  FROM c0, generate_series(1, 64) AS gi(i)),
       |${(1 to iterations).map(round).mkString(",\n")},
       |d$fin AS (
       |  SELECT qd.vec_id, c.cid,
       |    CAST(sum((qd.val - c.val) * (qd.val - c.val)) AS BIGINT) AS dist
       |  FROM qd JOIN c${iterations}d c ON qd.pos = c.pos
       |  GROUP BY qd.vec_id, c.cid),
       |a$fin AS (
       |  SELECT vec_id, cid, dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
       |  FROM d$fin)""".stripMargin
  }

  /** The q146 hard-negative ranking chain (quantized embeddings →
    * anchor batch 0/1/2 → different-label quantized cosines →
    * per-anchor rank) — ONE source of truth for q146's mining gate
    * and the q162 contrastive-pair dataset built on it.
    */
  protected val hardNegCtesSql: String =
    """qe AS (SELECT vec_id, label, list_transform(range(1, 65),
      |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0e0 + 0.5e0)
      |      AS BIGINT)) AS v
      |  FROM embeddings),
      |qs AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
      |  FROM qe WHERE vec_id IN (0, 1, 2)),
      |sc AS (SELECT query_id, vec_id, label,
      |    CAST(list_sum(list_transform(range(1, 65), i -> v[i] * qv[i])) AS BIGINT) AS dot,
      |    CAST(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])) AS BIGINT) AS nc,
      |    CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS BIGINT) AS nq
      |  FROM qe CROSS JOIN qs
      |  WHERE qe.label IS DISTINCT FROM qs.qlabel),
      |ct AS (SELECT query_id, vec_id, label,
      |    CASE WHEN nc = 0 OR nq = 0 THEN CAST(0 AS BIGINT)
      |         ELSE CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(nc AS DOUBLE))
      |           / sqrt(CAST(nq AS DOUBLE)) * 1000000000.0e0 + 0.5e0) AS BIGINT)
      |    END AS cos_tq
      |  FROM sc),
      |rk AS (SELECT query_id, vec_id, label, cos_tq,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos_tq DESC, vec_id) AS BIGINT) AS rnk
      |  FROM ct)""".stripMargin

  /** The q142 BPE training loop unrolled (v0 word frequencies + one
    * MATERIALIZED (m_k, v_k) stage per merge) — ONE source of truth
    * for every gate built on the LEARNED merge table (q142 emits it,
    * q161 segments with it via scalar subqueries). Argmax tie-break
    * (cnt DESC, l, r) and the >= 2 min-count mirror
    * `TextAnalysis.bpeTrain` exactly; inlining instead of
    * MATERIALIZED would re-expand the previous vocab once per
    * reference — exponential.
    */
  protected def bpeTrainCtesSql(n: Int): String = {
    val S = "\u001f"
    val v0 =
      s"""v0 AS MATERIALIZED (
         |  SELECT array_to_string(list_transform(range(1, length(word)+1),
         |      i -> '$S' || substr(word, i, 1) || '$S'), '') AS repr,
         |    CAST(count(*) AS BIGINT) AS wcnt
         |  FROM (SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []
         |        ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END) AS word
         |      FROM documents)
         |  GROUP BY word)""".stripMargin
    def stage(k: Int): String =
      s"""m$k AS MATERIALIZED (
         |  SELECT l, r FROM (
         |    SELECT pr[1] AS l, pr[2] AS r, CAST(sum(wcnt) AS BIGINT) AS cnt
         |    FROM (SELECT wcnt, unnest(list_transform(range(1, len(t)), i -> [t[i], t[i+1]])) AS pr
         |          FROM (SELECT wcnt, string_split(trim(repr, '$S'), '$S$S') AS t FROM v${k - 1})
         |          WHERE len(t) >= 2)
         |    GROUP BY 1, 2)
         |  WHERE cnt >= 2 ORDER BY cnt DESC, l, r LIMIT 1),
         |v$k AS MATERIALIZED (SELECT replace(repr,
         |    '$S' || (SELECT l FROM m$k) || '$S$S' || (SELECT r FROM m$k) || '$S',
         |    '$S' || (SELECT l || r FROM m$k) || '$S') AS repr, wcnt FROM v${k - 1})""".stripMargin
    s"$v0,\n${(1 to n).map(stage).mkString(",\n")}"
  }

  protected val contaminationNgramOverlapSql =
    s"""WITH t AS (SELECT doc_id,
       |    $rawTokensCaseSql AS w
       |  FROM documents),
       |g AS (SELECT doc_id,
       |    ${gram8Sql("w")} AS grams
       |  FROM t),
       |dg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |pg AS (SELECT DISTINCT gram FROM dg WHERE doc_id IN (3, 7, 11, 19, 23))
       |SELECT dg.doc_id, CAST(count(DISTINCT dg.gram) AS BIGINT) AS n_gram_hits
       |FROM dg JOIN pg USING (gram)
       |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin

  // BM25 oracle arithmetic mirroring Retrieval.bm25TopK operation for
  // operation. Every float literal is e0-suffixed: bare decimals parse
  // as DECIMAL in DuckDB, which would silently switch the promotion
  // rules (DECIMAL division) away from Spark's double arithmetic.
  // (1.2e0 + 1.0e0) is deliberately NOT folded to 2.2e0 — the Scala
  // side computes k1+1.0 at runtime and the parsed constant 2.2 is not
  // guaranteed to be the same double as the computed sum.
  protected def bm25TermSql(i: Int): String =
    s"""CAST(floor(((n - df$i) + 0.5e0) / (df$i + 0.5e0)
       |      * ((CAST(tf$i AS DOUBLE) * (1.2e0 + 1.0e0))
       |        / (CAST(tf$i AS DOUBLE) + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0
       |            * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n)))))
       |      * 1000000.0e0 + 0.5e0) AS BIGINT)""".stripMargin

  protected def bm25CteSql(terms: Seq[String]): String =
    s"""d AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
       |  FROM documents),
       |pd AS (
       |  SELECT doc_id, len(toks) AS dl,
       |    ${terms.zipWithIndex.map { case (t, i) =>
                s"len(list_filter(toks, x -> x = '$t')) AS tf$i" }.mkString(",\n    ")}
       |  FROM d),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
       |    ${terms.indices.map(i =>
                s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
              .mkString(",\n    ")}
       |  FROM pd),
       |sc AS (
       |  SELECT doc_id, CAST(dl AS INTEGER) AS dl,
       |    (${terms.indices.map(bm25TermSql).mkString("\n     + ")}) AS bm25_q
       |  FROM pd, st)""".stripMargin

  protected val tokenCountSql =
    """CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |     ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INTEGER)""".stripMargin

  protected def stopHitsSql(words: Seq[String]): String = {
    // same pattern builder as the Spark side (TextAnalysis) — ASCII \b
    // boundaries, none for CJK lists
    val pat = TextAnalysis.stopwordPattern(words)
    s"""len(regexp_extract_all(lower(text), '$pat'))"""
  }

  protected val langs = TextAnalysis.langOrder
  protected def langCaseSql: String = {
    val conds = langs.zipWithIndex.map { case (l, i) =>
      val cond = langs.zipWithIndex.collect {
        case (l2, j) if j < i => s"score_$l > score_$l2"
        case (l2, j) if j > i => s"score_$l >= score_$l2"
      }.mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }
    s"CASE ${conds.mkString(" ")} END"
  }

  // NOTE the VARCHAR hop on the sum-of-squares cast: DuckDB's direct
  // DECIMAL(38,4)→DOUBLE is lossy for values past 2^53 (drops the
  // fraction), while VARCHAR→DOUBLE is correctly rounded and matches
  // Spark's Decimal.toDouble bit-for-bit.
  protected def statsForSql(c: String): String =
    s"""SELECT '$c' AS column_name,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
       |  CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_val,
       |  min($c) AS min_val, max($c) AS max_val,
       |  sqrt((CAST(CAST(sum(CAST(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
       |    - CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count(*))
       |    / (count(*) - 1)) AS stddev_val
       |FROM lineitem""".stripMargin
}

/** DuckDB oracle SQL for every hash-gated query, merged from the
  * per-theme traits (adjacent to their queries).
  */
object OraclesExt extends OracleSnippets
    with OraclesSurface with OraclesTextSim with OraclesSqlSuite
    with OraclesCuration with OraclesTpchDeep with OraclesBehavior
    with OraclesVectorSketch with OraclesTextHygiene
    with OraclesRetrieval with OraclesScaleOps
    with OraclesRound10 with OraclesRound11 with OraclesRound11b
    with OraclesRound11c with OraclesRound12 with OraclesRound13
    with OraclesRound14 with OraclesRound15 with OraclesRound16
    with OraclesRound16b with OraclesRound17 with OraclesRound18 {
  // def, not val: the q44 entry interpolates the CSV fixture path that
  // csvIngest records when it runs — Verify dumps oracle SQL only after
  // running the queries, so building the map lazily picks it up.
  def sql: Map[String, String] =
    sqlSurface ++ sqlTextSim ++ sqlSqlSuite ++ sqlCuration ++
      sqlTpchDeep ++ sqlBehavior ++ sqlVectorSketch ++ sqlTextHygiene ++
      sqlRetrieval ++ sqlScaleOps ++ sqlRound10 ++ sqlRound11 ++ sqlRound11b ++
      sqlRound11c ++ sqlRound12 ++ sqlRound13 ++ sqlRound14 ++ sqlRound15 ++
      sqlRound16 ++ sqlRound16b ++ sqlRound17 ++ sqlRound18
}
