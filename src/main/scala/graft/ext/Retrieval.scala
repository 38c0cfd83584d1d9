package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Keyword and hybrid retrieval for LLM-data curation
  * (SURVEY.md §7.6; no reference citation — the reference has no
  * retrieval ops). BM25 (Robertson & Walker, the Okapi formulation)
  * and reciprocal-rank fusion (Cormack et al., SIGIR 2009).
  *
  * Oracle-portability discipline: `ln` is not bit-reproducible across
  * engines, so the IDF factor is kept as the exact rational
  * (N - df + 0.5)/(df + 0.5) instead of its log. This is a DEFINED
  * rank-affecting variant (exact-rational-IDF BM25), not a
  * rank-preserving transform: dropping the log is monotone per term,
  * so single-term rankings match Okapi BM25 exactly, but a multi-term
  * doc score sums per-term contributions AFTER the per-term rescaling,
  * and a non-linear rescale before a sum can reorder docs relative to
  * the log-IDF sum. The variant is deterministic and self-consistent;
  * per-term contributions are quantized to BIGINT (floor(x·1e6 + 0.5))
  * BEFORE summing so the doc score is exact integer arithmetic —
  * order-independent, hence hash-stable across engines and shuffle
  * schedules (§5.3).
  */
object Retrieval {

  /** BM25 scores of every document against a FIXED keyword set.
    *
    * Plan shape: the per-term term frequencies are computed as array
    * expressions inside the scan projection (no explode — the term set
    * is a compile-time constant), so the whole query is ONE pass over
    * the corpus plus a 1-row stats aggregate broadcast back onto it.
    * No shuffle wider than the 1-row exchange at any scale; top-k is
    * TakeOrderedAndProject.
    *
    * Emits (idCol, dl, bm25_q) for the `k` highest-scoring docs,
    * ties broken by id.
    */
  // NULL text scores like empty text (0), not NULL — the coalesce
  // matches dupSpanCounts/unigramLmScores' NULL-as-empty behavior.
  // All per-term tfs come from ONE fused pass over the token array
  // (graft_term_counts) instead of |terms| interpreted filter() HOFs.
  private def bm25PerDoc(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String]): DataFrame =
    docs
      .select(col(idCol),
        coalesce(TextAnalysis.tokens(lower(col(textCol))),
          array().cast("array<string>")).as("_toks"))
      .select(col(idCol), size(col("_toks")).as("dl"),
        graft.functions.VectorExpressions.termCounts(col("_toks"), terms)
          .as("_tfs"))
      .select(col(idCol) +: col("dl") +:
        terms.indices.map(i =>
          element_at(col("_tfs"), i + 1).as(s"_tf$i")): _*)

  // The Okapi arithmetic, parameterized over WHERE the corpus stats
  // come from (same-query aggregate columns, or external literals from
  // maintained state) — one formula, two tiers, identical results when
  // the stats agree (spec-asserted).
  private def bm25Scored(perDoc: DataFrame, idCol: String, nTerms: Int,
      n: Column, sumdl: Column, dfOf: Int => Column,
      k1: Double, b: Double): DataFrame = {
    val avgdl = sumdl.cast("double") / n
    def contrib(i: Int): Column = {
      val tf = col(s"_tf$i").cast("double")
      val df = dfOf(i)
      val idf = (n - df + lit(0.5)) / (df + lit(0.5))
      val score = idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl))))
      floor(score * lit(1e6) + lit(0.5)).cast("long")
    }
    perDoc.select(col(idCol), col("dl"),
      (0 until nTerms).map(contrib).reduce(_ + _).as("bm25_q"))
  }

  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val perDoc = bm25PerDoc(docs, textCol, idCol, terms)
    val stats = perDoc.agg(count(lit(1)).as("_n"),
      sum(col("dl")).as("_sumdl") +:
        terms.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i")): _*)
    bm25Scored(perDoc.crossJoin(broadcast(stats)), idCol, terms.size,
      col("_n"), col("_sumdl"), i => col(s"_df$i"), k1, b)
      .orderBy(col("bm25_q").desc, col(idCol))
      .limit(k)
  }

  /** BM25 scoring against EXTERNAL corpus statistics — the serving
    * tier of a LIVE index: (N, Σdl) and per-term dfs come from
    * maintained state (StreamingFeatures.maintainCorpusStats /
    * maintainDocFrequency, or any snapshot) instead of a same-query
    * corpus aggregate, so scoring a batch costs ONE scan of that
    * batch, never a corpus pass. Same arithmetic and quantization as
    * [[bm25TopK]]: with state equal to the corpus aggregates the
    * scores are identical (spec-asserted). A term missing from `dfs`
    * scores with df = 0 (maximal idf) — stale-state behavior is
    * defined, not an error.
    */
  def bm25TopKWithStats(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int,
      nDocs: Long, sumDl: Long, dfs: Map[String, Long],
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scored(bm25PerDoc(docs, textCol, idCol, terms), idCol, terms.size,
      lit(nDocs), lit(sumDl), i => lit(dfs.getOrElse(terms(i), 0L)), k1, b)
      .orderBy(col("bm25_q").desc, col(idCol))
      .limit(k)

  /** Exact maximum-inner-product top-k of the corpus against ONE query
    * vector, on 1e-6-quantized BIGINT components so every dot product
    * is exact integer arithmetic (the q106 Gram discipline — double
    * dot products are not order-stable). One corpus scan; the query
    * row broadcasts. Emits (idCol, dot_q) for the k best, ties by id.
    * A `queryId` absent from the corpus yields an EMPTY result (the
    * broadcast side is empty), not an error — callers probing by id
    * should validate the id exists if emptiness would be ambiguous.
    */
  def quantizedDotTopK(corpus: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    def quant(c: Column): Column =
      transform(c, x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
    val q = corpus.filter(col(idCol) === queryId)
      .select(quant(col(vecCol)).as("_qv"))
    corpus.crossJoin(broadcast(q))
      .select(col(idCol),
        aggregate(zip_with(quant(col(vecCol)), col("_qv"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("dot_q"))
      .orderBy(col("dot_q").desc, col(idCol))
      .limit(k)
  }

  /** Sign-bit packing of a float vector: 32 dimensions per BIGINT
    * half-word (NOT 64 — a 64-bit fold would touch the sign bit, and
    * BIGINT overflow is an ERROR in strict engines like DuckDB, §5.3).
    * Bit i of a half carries dimension (from-1 + i) with weight
    * 2^(31-i): a left-to-right acc·2+bit fold, identical to an
    * explicit shift sum in any engine.
    */
  private def packSignBits(vec: Column, from: Int): Column =
    aggregate(
      transform(slice(vec, from, 32),
        x => when(x.cast("double") > 0, 1L).otherwise(0L)),
      lit(0L), (acc, bit) => acc * lit(2L) + bit)

  /** Hamming-distance top-k over 1-bit sign-quantized embeddings — the
    * 32×-compression retrieval tier below int8 ([[Pq.scalarQuantize]])
    * and PQ: a `dim`-dim embedding becomes ceil(dim/32) BIGINT
    * half-words and candidate distance is one XOR+popcount per half.
    * One corpus scan (the packing and the distance both live in the
    * scan projection), the single query row broadcasts, top-k is
    * TakeOrderedAndProject. Exact integer arithmetic end to end —
    * hash-stable in any engine. A `queryId` absent from the corpus
    * yields an EMPTY result (see [[quantizedDotTopK]]).
    *
    * At 100 TB the packed words are what you'd MATERIALIZE (32× smaller
    * than the floats); re-ranking survivors against the full vectors is
    * the standard second stage and composes with [[rrfFuse]].
    */
  def binaryHammingTopK(corpus: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, dim: Int = 64): DataFrame = {
    require(dim >= 1, s"binaryHammingTopK: dim must be >= 1, got $dim")
    val nHalves = (dim + 31) / 32
    val halves = (0 until nHalves)
    val packed = corpus.select(col(idCol) +:
      halves.map(h => packSignBits(col(vecCol), h * 32 + 1).as(s"_h$h")): _*)
    val q = packed.filter(col(idCol) === queryId)
      .select(halves.map(h => col(s"_h$h").as(s"_q$h")): _*)
    packed.crossJoin(broadcast(q))
      .select(col(idCol),
        halves.map(h => bit_count(col(s"_h$h").bitwiseXOR(col(s"_q$h"))))
          .reduce(_ + _).cast("int").as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(k)
  }

  /** Matryoshka-truncation retrieval (Kusupati et al., NeurIPS 2022):
    * rank the corpus against each query by cosine over only the FIRST
    * `dims` dimensions of the embedding. With matryoshka-trained
    * embeddings the leading prefix carries most of the signal, so
    * truncating is the cheap retrieval tier between full-dim exact
    * and the 1-bit/int8 tiers: dims/64 of the dot-product FLOPs and
    * bytes, no codebook to fit. Recall vs full-dim is spec-asserted
    * (RetrievalMetricsSpec discipline), not assumed.
    *
    * Portability: components quantize to 1e-6 BIGINTs, so dots and
    * norms are exact integers; the cosine then takes ONE correctly-
    * rounded IEEE step per operation (dot / sqrt(na) / sqrt(nb) —
    * sqrt and divide are correctly rounded everywhere, unlike ln/pow,
    * §5.3) in the same order as the oracle, making the double — and
    * the 1e9-quantized score — bit-identical across engines.
    *
    * Plan shape: queries filter to a broadcast-able frame; the corpus
    * joins it once (broadcast nested loop over ≤|queries| rows — the
    * 1-row-build BNLJ shape, not all-pairs); per-query top-k is a
    * rank-≤-k filter that Catalyst rewrites to Partial+Final
    * WindowGroupLimit heaps, so no query group is ever fully sorted.
    * Emits (query_id, idCol, cos_tq, rnk), ties broken by id.
    */
  def truncatedCosineTopK(corpus: DataFrame, vecCol: String, idCol: String,
      queryIds: Seq[Long], k: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dims >= 1, s"truncatedCosineTopK: dims must be >= 1, got $dims")
    require(queryIds.nonEmpty, "truncatedCosineTopK: queryIds is empty")
    def quant(c: Column): Column =
      transform(slice(c, 1, dims),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), quant(col(vecCol)).as("_qv"))
    val scored = corpus
      .select(col(idCol), quant(col(vecCol)).as("_cv"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col(idCol),
        dot(col("_cv"), col("_qv")).as("_dot"),
        dot(col("_cv"), col("_cv")).as("_nc"),
        dot(col("_qv"), col("_qv")).as("_nq"))
      .select(col("query_id"), col(idCol),
        when(col("_nc") === 0 || col("_nq") === 0, lit(0L))
          .otherwise(floor(
            col("_dot").cast("double") / sqrt(col("_nc").cast("double"))
              / sqrt(col("_nq").cast("double")) * lit(1e9) + lit(0.5))
            .cast("long")).as("cos_tq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_tq").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Hard-negative mining for contrastive training data: per anchor,
    * the k corpus vectors MOST similar under cosine whose label
    * DIFFERS — the near-the-margin negatives that make embedding
    * training informative (random negatives are trivially far). Same
    * execution shape as [[truncatedCosineTopK]] at full
    * dimensionality: the anchor batch is small by contract and
    * broadcasts (the q29 safe-BNLJ discipline — one corpus scan scores
    * all anchors), integer-quantized dots keep the ranking
    * oracle-exact, the label-mismatch filter drops positives BEFORE
    * the per-anchor top-k heaps (InferWindowGroupLimit), and the
    * corpus never shuffles before those heaps. At 100 TB this is one
    * scan per mining batch; for corpus-scale anchor sets route
    * through the IVF tiers instead.
    */
  def hardNegativeTopK(corpus: DataFrame, vecCol: String, idCol: String,
      labelCol: String, queryIds: Seq[Long], k: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dims >= 1, s"hardNegativeTopK: dims must be >= 1, got $dims")
    require(queryIds.nonEmpty, "hardNegativeTopK: queryIds is empty")
    def quant(c: Column): Column =
      transform(slice(c, 1, dims),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), quant(col(vecCol)).as("_qv"),
        col(labelCol).as("_qlabel"))
    val scored = corpus
      .select(col(idCol), quant(col(vecCol)).as("_cv"), col(labelCol))
      .crossJoin(broadcast(q))
      .filter(!(col(labelCol) <=> col("_qlabel"))) // negatives only (null-safe)
      .select(col("query_id"), col(idCol), col(labelCol),
        dot(col("_cv"), col("_qv")).as("_dot"),
        dot(col("_cv"), col("_cv")).as("_nc"),
        dot(col("_qv"), col("_qv")).as("_nq"))
      .select(col("query_id"), col(idCol), col(labelCol),
        when(col("_nc") === 0 || col("_nq") === 0, lit(0L))
          .otherwise(floor(
            col("_dot").cast("double") / sqrt(col("_nc").cast("double"))
              / sqrt(col("_nq").cast("double")) * lit(1e9) + lit(0.5))
            .cast("long")).as("cos_tq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_tq").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Label-noise mining by kNN disagreement (the Confident-Learning /
    * deep-kNN filtering shape): for each audited vector, its k nearest
    * corpus neighbors under cosine (self excluded), and the count of
    * neighbors whose label DIFFERS — a point whose neighborhood
    * majority-disagrees with its own label is a mislabel candidate,
    * the rows a training-data audit routes to re-annotation. Same
    * execution contract as [[hardNegativeTopK]]: the audit batch is
    * small by contract and broadcasts (one corpus scan scores every
    * audited point; corpus-scale audits route through the IVF tiers),
    * integer-quantized dots keep the ranking oracle-exact, and the
    * per-query top-k is a rank-≤-k filter riding the
    * InferWindowGroupLimit heaps. NULL-safe label compare: a NULL
    * label disagrees with every non-NULL neighbor label.
    *
    * Emits one row per audited id: (idCol, labelCol, n_diff, noisy)
    * with noisy = strict majority of the k neighbors disagreeing.
    * The majority test is against the PARAMETER k: on a corpus with
    * fewer than k other vectors the vote is conservative (fewer
    * voters can reach the same bar), never inflated. Audited ids
    * absent from the corpus are absent from the output.
    */
  def knnLabelNoise(corpus: DataFrame, vecCol: String, idCol: String,
      labelCol: String, queryIds: Seq[Long], k: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dims >= 1, s"knnLabelNoise: dims must be >= 1, got $dims")
    require(k >= 1, s"knnLabelNoise: k must be >= 1, got $k")
    require(queryIds.nonEmpty, "knnLabelNoise: queryIds is empty")
    def quant(c: Column): Column =
      transform(slice(c, 1, dims),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), quant(col(vecCol)).as("_qv"),
        col(labelCol).as("_qlabel"))
    val scored = corpus
      .select(col(idCol), quant(col(vecCol)).as("_cv"), col(labelCol))
      .crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id")) // self never votes
      .select(col("query_id"), col("_qlabel"), col(idCol), col(labelCol),
        dot(col("_cv"), col("_qv")).as("_dot"),
        dot(col("_cv"), col("_cv")).as("_nc"),
        dot(col("_qv"), col("_qv")).as("_nq"))
      .select(col("query_id"), col("_qlabel"), col(idCol), col(labelCol),
        when(col("_nc") === 0 || col("_nq") === 0, lit(0L))
          .otherwise(floor(
            col("_dot").cast("double") / sqrt(col("_nc").cast("double"))
              / sqrt(col("_nq").cast("double")) * lit(1e9) + lit(0.5))
            .cast("long")).as("cos_tq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_tq").desc, col(idCol))
    scored.withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") <= k)
      .groupBy(col("query_id"), col("_qlabel"))
      .agg(sum(when(!(col(labelCol) <=> col("_qlabel")), 1L).otherwise(0L))
        .as("n_diff"))
      .select(col("query_id").as(idCol), col("_qlabel").as(labelCol),
        col("n_diff"), (col("n_diff") * 2 > k).as("noisy"))
  }

  /** Reciprocal-rank fusion of pre-ranked candidate lists sharing an
    * id column. Each input must already be a SMALL top-k frame (the
    * rank window here runs on candidate lists, never on the corpus —
    * ranking the corpus through a single-partition window is the
    * 100 TB cliff; produce candidates with TakeOrderedAndProject
    * first, as bm25TopK/quantizedDotTopK do).
    *
    * Contribution of a list at rank r (1-based) is
    * floor(1e9 / (kConst + r)) — integer-exact in both engines, and
    * safe as a double division: the true quotient is a rational with
    * denominator ≤ kConst+|list|, never within an ulp of an integer
    * it doesn't equal.
    *
    * Each `rankings` entry is (label, candidate frame, ordering
    * column); ids in only some lists contribute only those lists'
    * reciprocal ranks (their other rank columns stay NULL).
    * Emits (id, <label>_rank ..., rrf_q) ordered by fused score.
    *
    * EAGER semantics (the GlobalIndex caching-contract discipline):
    * this call EXECUTES the fusion at call time and returns a
    * `localCheckpoint`ed ≤ topK-row frame — the lineage cut is what
    * lets the candidate-list caches be released before returning
    * instead of leaking for the life of the plan. Consequences:
    * callers pay the full fusion cost even if they never consume the
    * result, and the returned frame lives in executor block storage
    * — it cannot be recomputed after executor loss (irrelevant on a
    * driver-colocated deployment, real on a preemptible cluster; for
    * a fault-tolerant handle, persist the ≤ topK rows to a table).
    */
  def rrfFuse(rankings: Seq[(String, DataFrame, Column)], idCol: String,
      kConst: Int = 60, topK: Int = 50,
      maxCandidates: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxCandidates > 0,
      s"rrfFuse: maxCandidates must be > 0, got $maxCandidates")
    val cachedLists = rankings.map { case (label, df, ord) =>
      // the small-list contract is ENFORCED, not advisory (the
      // ivfIndexedTopK discipline): a corpus-sized "candidate list"
      // would drive the single-partition rank window below. The list
      // is CACHED before counting — a top-k plan (TakeOrderedAndProject
      // over the corpus) cannot short-circuit a limit probe, so an
      // uncached count would run the full candidate-generation scan a
      // second time for the fusion. Caching k rows is bytes; the count
      // both enforces the bound and materializes the list the window
      // then reads back.
      val cached = df.persist()
      val n = cached.count()
      require(n <= maxCandidates,
        s"rrfFuse: ranking '$label' has $n rows, exceeds " +
          s"maxCandidates=$maxCandidates — pre-limit candidate lists with " +
          "TakeOrderedAndProject (bm25TopK/quantizedDotTopK) before fusing")
      (label, cached, ord)
    }
    val ranked = cachedLists.map { case (label, cached, ord) =>
      cached.select(col(idCol),
        row_number().over(Window.orderBy(ord, col(idCol)))
          .cast("long").as(s"${label}_rank"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = rankings.map { case (label, _, _) =>
      coalesce(
        floor(lit(1e9) / (lit(kConst).cast("double") + col(s"${label}_rank"))).cast("long"),
        lit(0L))
    }.reduce(_ + _)
    // The fused frame is ≤ topK rows: eagerly pin it (lineage cut +
    // materialize) so the candidate-list caches can be released NOW
    // instead of leaking for the life of the returned plan — repeated
    // fusions in a long-lived session would otherwise accumulate
    // cached lists until the block store evicts under pressure.
    val fused = joined.select(col(idCol) +:
        rankings.map { case (label, _, _) => col(s"${label}_rank") } :+
        rrf.as("rrf_q"): _*)
      .orderBy(col("rrf_q").desc, col(idCol))
      .limit(topK)
      .localCheckpoint()
    cachedLists.foreach { case (_, cached, _) => cached.unpersist() }
    fused
  }
}
