package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Language-model familiarity and DSIR importance scoring
  * over document corpora — the perplexity-proxy / domain-resampling
  * tier of [[TextAnalysis]] (split out per the one-file-per-theme
  * discipline; all entry points remain `TextAnalysis.<name>`).
  */
private[ext] trait TextAnalysisLm {

  /** Tokenizer hook — implemented by the [[TextAnalysis]] core. */
  def tokens(text: Column): Column

  /** Linear-domain unigram-LM familiarity score — the cheap stand-in
    * for perplexity-based quality filtering (the CCNet/KenLM
    * discipline, Wenzek et al. 2020) when no external LM is available:
    * fit the unigram distribution ON the corpus, then score each doc
    * by the sum of its tokens' probabilities. Kept in the linear
    * domain because ln is not bit-portable across engines (§5.3);
    * per-term probabilities are quantized to BIGINT (floor(p·1e9+0.5))
    * BEFORE the per-doc sum so the score is exact integer arithmetic —
    * order-independent under any shuffle schedule.
    *
    * Plan shape: one explode pass, vocab aggregate (bounded by the
    * distinct-token count, with map-side partial aggs), the 1-row
    * total broadcast-crossed onto the vocab, a term equi-join
    * (broadcast when the vocab fits, sort-merge otherwise — AQE's
    * call), and the per-doc aggregate. Empty docs score 0 via the
    * left join.
    */
  def unigramLmScores(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(tokens(lower(col(textCol)))).as("_term"))
    val vocab = terms.groupBy(col("_term")).agg(count(lit(1)).as("_cnt"))
    val total = vocab.agg(sum(col("_cnt")).as("_total"))
    val qp = vocab.crossJoin(broadcast(total))
      .select(col("_term"),
        floor(col("_cnt").cast("double") / col("_total") * lit(1e9) + lit(0.5))
          .as("_qp"))
    val scored = terms.join(qp, Seq("_term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_qp")).as("lm_q"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("lm_q"), lit(0L)).as("lm_q"))
  }

  /** DSIR-style hashed-unigram importance score (Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): hash tokens into `16^bucketHexLen` buckets by md5
    * prefix, fit the bucket distribution on the TARGET slice
    * (`targetPred` rows) and on the raw corpus, then score every
    * document by its summed per-token target/raw probability ratio
    * (add-one smoothed). High scores = documents whose token profile
    * looks like the target domain — the resampling weight for
    * domain-matched pretraining selection.
    *
    * Kept in the LINEAR domain (sum of quantized ratios, not of log
    * ratios): ln is not bit-portable across engines (§5.3), the same
    * trade as [[unigramLmScores]]. The true log-domain weight is
    * [[importanceLogWeights]], spec-asserted against a driver-side
    * brute force (not oracle-gated).
    *
    * Scale shape: one explode pass; the bucket table is CONSTANT-sized
    * (16^bucketHexLen rows — 256 at the default), so both the stats
    * aggregate (map-side partials onto ≤256 keys) and the score join
    * (broadcast) are corpus-size-independent. The md5 bucket key stays
    * a hex STRING — no integer parse, portable by construction.
    */
  def hashedImportanceScores(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, bucketHexLen: Int = 2): DataFrame =
    hashedImportanceScoresWithStats(docs, idCol, textCol,
      dsirBucketCounts(docs, textCol, targetPred, bucketHexLen), bucketHexLen)

  /** Per-bucket hashed-unigram counts — the corpus-model STATE behind
    * [[hashedImportanceScores]]: raw and target token counts per md5
    * hex bucket. Both are plain mergeable longs over ≤ 16^bucketHexLen
    * keys (256 at the default — constant-sized at any corpus scale), so
    * a streaming maintainer can keep them as a running stateful
    * aggregate (`StreamingFeatures.maintainDsirBuckets`) and batch
    * scoring against the maintained state
    * ([[hashedImportanceScoresWithStats]]) reproduces the batch
    * operator exactly.
    */
  def dsirBucketCounts(docs: DataFrame, textCol: String, targetPred: Column,
      bucketHexLen: Int = 2): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 4,
      s"dsirBucketCounts: bucketHexLen must be in [1,4], got $bucketHexLen")
    docs.select(targetPred.as("_is_t"),
        explode(tokens(lower(col(textCol)))).as("_term"))
      .select(col("_is_t"),
        substring(md5(col("_term")), 1, bucketHexLen).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("_is_t"), 1L).otherwise(0L)).as("n_target"))
  }

  /** [[hashedImportanceScores]] against a PRE-COMPUTED bucket model
    * (`stats`: bucket / n_raw / n_target, as produced by
    * [[dsirBucketCounts]] or maintained live by
    * `StreamingFeatures.maintainDsirBuckets`) — the serving tier:
    * scoring a batch costs one scan of THAT batch plus the broadcast of
    * the constant-sized model; the corpus is never re-aggregated.
    */
  def hashedImportanceScoresWithStats(docs: DataFrame, idCol: String,
      textCol: String, stats: DataFrame, bucketHexLen: Int = 2): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 4,
      s"hashedImportanceScoresWithStats: bucketHexLen must be in [1,4], got $bucketHexLen")
    val nBuckets = math.pow(16, bucketHexLen).toLong
    val buckets = stats.select(col("bucket").as("_bucket"),
      col("n_raw").as("_cr"), col("n_target").as("_ct"))
    val totals = buckets.agg(sum(col("_cr")).as("_tr"), sum(col("_ct")).as("_tt"))
    // ratio = ((ct+1)/(tt+B)) / ((cr+1)/(tr+B)) as ONE division of two
    // exact BIGINT products (each < 2^53, so the double casts are
    // exact) — quantized BEFORE the per-doc sum, the §5.3 discipline.
    val qb = buckets.crossJoin(broadcast(totals))
      .select(col("_bucket"),
        floor(((col("_ct") + lit(1L)) * (col("_tr") + lit(nBuckets))).cast("double")
          / ((col("_cr") + lit(1L)) * (col("_tt") + lit(nBuckets))).cast("double")
          * lit(1e6) + lit(0.5)).cast("long").as("_qb"))
    val terms = docs.select(col(idCol),
        explode(tokens(lower(col(textCol)))).as("_term"))
      .select(col(idCol),
        substring(md5(col("_term")), 1, bucketHexLen).as("_bucket"))
    // A bucket ABSENT from the maintained model (possible when serving
    // a new batch against older state) is not a dropped position: it
    // takes the add-one-smoothed ratio with ct = cr = 0, i.e.
    // (tr+B)/(tt+B) — one default value derived from the totals,
    // coalesced in. Self-scoring is unaffected (every bucket matches).
    val qbDefault = totals.select(
      floor((col("_tr") + lit(nBuckets)).cast("double")
        / (col("_tt") + lit(nBuckets)).cast("double") * lit(1e6) + lit(0.5))
        .cast("long").as("_qb0"))
    val scored = terms.join(broadcast(qb), Seq("_bucket"), "left_outer")
      .crossJoin(broadcast(qbDefault))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("_qb"), col("_qb0"))).as("dsir_q"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dsir_q"), lit(0L)).as("dsir_q"))
  }

  /** True log-domain DSIR weights (sum of per-token
    * ln(p_target/p_raw)) — the faithful Xie et al. estimator, for use
    * inside the engine where cross-engine bit-reproducibility is not
    * required. Same plan shape as [[hashedImportanceScores]];
    * spec-asserted against a driver-side brute force with an ulp
    * tolerance.
    */
  def importanceLogWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, bucketHexLen: Int = 2): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 4,
      s"importanceLogWeights: bucketHexLen must be in [1,4], got $bucketHexLen")
    val nBuckets = math.pow(16, bucketHexLen).toLong
    val terms = docs.select(col(idCol), targetPred.as("_is_t"),
        explode(tokens(lower(col(textCol)))).as("_term"))
      .select(col(idCol), col("_is_t"),
        substring(md5(col("_term")), 1, bucketHexLen).as("_bucket"))
    val buckets = terms.groupBy(col("_bucket"))
      .agg(count(lit(1)).as("_cr"),
        sum(when(col("_is_t"), 1L).otherwise(0L)).as("_ct"))
    val totals = buckets.agg(sum(col("_cr")).as("_tr"), sum(col("_ct")).as("_tt"))
    val lw = buckets.crossJoin(broadcast(totals))
      .select(col("_bucket"),
        log(((col("_ct") + lit(1L)) * (col("_tr") + lit(nBuckets))).cast("double")
          / ((col("_cr") + lit(1L)) * (col("_tt") + lit(nBuckets))).cast("double"))
          .as("_lw"))
    val scored = terms.join(broadcast(lw), Seq("_bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_lw")).as("dsir_logw"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dsir_logw"), lit(0.0)).as("dsir_logw"))
  }

  /** Interpolated bigram-LM familiarity score — the next
    * perplexity-proxy tier above [[unigramLmScores]] (the CCNet/KenLM
    * discipline with a 2-gram context): fit bigram and unigram
    * distributions ON the corpus, then score each token position by
    * `λ·p(w|prev) + (1−λ)·p(w)`; the first token of a document has no
    * history, so its bigram term is zero and it scores `(1−λ)·p(w)`.
    * Per-position values are quantized to BIGINT (floor(p·1e9+0.5))
    * BEFORE the per-doc sum — exact integer arithmetic thereafter, the
    * §5.3 linear-domain discipline (ln is not portable).
    *
    * Scale shape: one explode pass each for unigram and bigram counts
    * (both vocabulary-bounded aggregates with map-side partials); the
    * scoring joins are plain equi-joins on the token/pair keys — AQE
    * picks broadcast when the vocab fits, sort-merge otherwise. Empty
    * docs score 0 via the left join.
    */
  def bigramLmScores(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7): DataFrame =
    bigramLmScoresWithStats(docs, idCol, textCol,
      termOccurrenceCounts(docs, textCol), bigramPairCounts(docs, textCol),
      lambda)

  /** Per-term OCCURRENCE counts (`term` / `cnt`) — unlike `termStats`'
    * document frequency, this counts positions. One half of the
    * bigram-LM model state: a mergeable long per vocab term, maintained
    * live by `StreamingFeatures.maintainTermCounts`.
    */
  def termOccurrenceCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** Adjacent-token pair counts (`prev` / `cur` / `cnt`) — the other
    * half of the bigram-LM model state (mergeable longs keyed by the
    * pair; `StreamingFeatures.maintainBigramCounts`). The per-prev
    * continuation total is DERIVED (sum over cur), so it needs no
    * separate state table.
    */
  def bigramPairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(tokens(lower(col(textCol))).as("_w"))
    val n = size(col("_w"))
    toks.filter(n >= 2)
      .select(explode(zip_with(
        slice(col("_w"), lit(1), n - 1), slice(col("_w"), lit(2), n - 1),
        (p, c) => struct(p.as("p"), c.as("c")))).as("_bg"))
      .select(col("_bg.p").as("prev"), col("_bg.c").as("cur"))
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cnt"))
  }

  /** FastText-style hashed linear text scorer — the quality-classifier
    * SERVING shape (Joulin et al. 2016 / the CCNet quality filter):
    * features are unigrams + word bigrams, each hashed DIRECTLY to its
    * weight — no vocabulary table to build, broadcast, or join — and
    * the document logit is the feature-weight sum, all computed inside
    * the scan projection: zero shuffles at any corpus size, the
    * cheapest possible classifier pass over 100 TB.
    *
    * Weights are a deterministic md5 projection onto integers in
    * [−1000, 1000] — a stand-in for learned weights (a trained model
    * drops in by replacing the weight expression with a
    * bucket-indexed literal array); the point under test is the
    * hashed-feature serving shape. Integer weights keep the logit an
    * exact BIGINT, portable through the DuckDB oracle (q133).
    */
  def hashedLinearScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = coalesce(tokens(lower(col(textCol))),
      array().cast("array<string>"))
    val n = size(toks)
    val bigrams = when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (p, c) => concat_ws(" ", p, c)))
    val feats = concat(toks, bigrams)
    def weight(g: Column): Column =
      conv(substring(md5(g), 1, 13), 16, 10).cast("long") % lit(2001L) -
        lit(1000L)
    docs.select(col(idCol), size(feats).cast("long").as("n_feats"),
      aggregate(feats, lit(0L), (acc, g) => acc + weight(g)).as("logit_q"))
  }

  /** [[bigramLmScores]] against PRE-COMPUTED model counts
    * (`termCounts`: term/cnt from [[termOccurrenceCounts]];
    * `pairCounts`: prev/cur/cnt from [[bigramPairCounts]] — or both
    * maintained live as streaming state). Scoring a batch costs one
    * scan of THAT batch plus the vocabulary-bounded model joins; the
    * corpus is never re-aggregated. Exact parity with the batch
    * operator: all model quantities are integer counts, and the per-prev
    * total is recovered exactly as sum(cnt) over the pair counts.
    * Positions unseen by the model (serving a NEWER batch than the
    * maintained state) are scored via backoff — zero bigram mass,
    * zero unigram probability — never dropped, so n_tokens always
    * counts the batch's true positions.
    */
  def bigramLmScoresWithStats(docs: DataFrame, idCol: String, textCol: String,
      termCounts: DataFrame, pairCounts: DataFrame,
      lambda: Double = 0.7): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0,
      s"bigramLmScoresWithStats: lambda must be in [0,1], got $lambda")
    val toks = docs.select(col(idCol), tokens(lower(col(textCol))).as("_w"))
    val n = size(col("_w"))
    val uni = termCounts.select(col("term").as("_term"), col("cnt").as("_cu"))
    val tot = uni.agg(sum(col("_cu")).as("_tot"))
    val pairs = toks.filter(n >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("_w"), lit(1), n - 1), slice(col("_w"), lit(2), n - 1),
        (p, c) => struct(p.as("p"), c.as("c")))).as("_bg"))
      .select(col(idCol), col("_bg.p").as("_prev"), col("_bg.c").as("_cur"))
    val big = pairCounts.select(col("prev").as("_prev"), col("cur").as("_cur"),
      col("cnt").as("_cb"))
    val pre = big.groupBy(col("_prev")).agg(sum(col("_cb")).as("_cp"))
    val uniAsCur = uni.withColumnRenamed("_term", "_cur")
    // Model joins are LEFT joins: when serving a new batch against
    // older maintained state, an unseen pair/term is not a dropped
    // position — it takes the backoff contribution (unseen bigram →
    // zero continuation mass, so λ·0 + (1−λ)·p(w); unseen unigram →
    // p(w) = 0). n_tokens therefore counts every position of the batch
    // regardless of model coverage. Self-scoring parity is unaffected
    // (every key matches, the coalesces are no-ops).
    val qBig = pairs
      .join(big, Seq("_prev", "_cur"), "left_outer")
      .join(pre, Seq("_prev"), "left_outer")
      .join(uniAsCur, Seq("_cur"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        floor((lit(lambda) *
            when(col("_cp").isNull || col("_cp") === 0L, lit(0.0))
              .otherwise(coalesce(col("_cb"), lit(0L)).cast("double") / col("_cp").cast("double"))
          + lit(1.0 - lambda) * (coalesce(col("_cu"), lit(0L)).cast("double") / col("_tot").cast("double")))
          * lit(1e9) + lit(0.5)).cast("long").as("_q"))
    val qFirst = toks.filter(n >= 1)
      .select(col(idCol), element_at(col("_w"), 1).as("_cur"))
      .join(uniAsCur, Seq("_cur"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        floor(lit(1.0 - lambda) * (coalesce(col("_cu"), lit(0L)).cast("double") / col("_tot").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long").as("_q"))
    val scored = qBig.unionByName(qFirst)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_q")).as("lm2_q"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("lm2_q"), lit(0L)).as("lm2_q"))
  }
}
