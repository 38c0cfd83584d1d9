package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-addressed sampling. [extension] — no reference
  * analog; the reference splits with `randomSplit`
  * (`Feature_Store_Telco_Churn_Flight_School.py` training cell), which
  * is partition-order dependent and unreproducible across runs.
  *
  * The sampling decision here is a pure function of the ROW KEY: keep a
  * row iff `md5(key)` falls below the fraction's threshold in hex
  * space. That buys three properties `df.sample()` cannot give:
  *   - reproducible: same key → same verdict on every run, engine,
  *     and cluster layout (md5 is bit-identical everywhere — the
  *     portable-hash discipline of `TextAnalysis.fingerprint`);
  *   - stable under growth: a row's verdict never changes when other
  *     rows arrive, so yesterday's 1 % sample is a subset of today's
  *     (nested samples come free: a 0.5 % threshold selects a subset
  *     of the 1 % sample);
  *   - scale-free: a pure filter expression — no shuffle, no RNG
  *     state, folds into the parquet scan's codegen stage and prunes
  *     with it.
  * Cost: md5 per row (~100 ns); accepted for portability, same
  * trade-off as the dedup fingerprint.
  */
object Sampling {

  /** Lexicographic md5-space threshold for a keep-fraction: the first
    * 8 hex digits of frac · 2³². Comparing the full 32-char digest
    * against the 8-char boundary keeps exactly the digests whose
    * 32-bit prefix is below it (an 8-char-prefix tie compares GREATER,
    * matching the half-open [0, frac) bucket).
    */
  private[graft] def hexThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0,
      s"sampling fraction must be in [0,1], got $frac")
    // 'g' sorts above every hex digit — the keep-everything sentinel
    if (frac == 1.0) "g" else f"${(frac * 4294967296.0).toLong}%08x"
  }

  /** Keep ~`frac` of rows, decided by `md5(key)`. */
  def hashSample(df: DataFrame, keyCol: Column, frac: Double): DataFrame =
    df.filter(md5(keyCol.cast("string")) < lit(hexThreshold(frac)))

  /** CASE chains stop and broadcast-join lookups start at this stratum
    * cardinality (r13). Below it a per-stratum constant compiles to a
    * scan-stage CASE — no join node, folds into the parquet scan's
    * codegen. Above it that chain is a liability: the comparator run
    * is O(|strata|) PER ROW and the expression tree itself grows with
    * the data (temperatureMix/epochMix derive their strata from
    * observed counts, so "a caller map" can be a million sources).
    */
  private val CaseBranchLimit = 64

  /** Attach per-stratum constant columns to `df`, keyed by
    * `strataKey`: `cols` names each output column with its default
    * literal and type; `table` maps stratum → values in `cols` order.
    * ≤ [[CaseBranchLimit]] strata compile to CASE chains (the historic
    * scan-stage shape — every existing gate keeps its plan); above
    * that, ONE broadcast left-outer join against the (stratum, v₁…vₙ)
    * table with per-column coalesce to the defaults. Both shapes are
    * the same function of (strataKey, table): NULL or unlisted strata
    * get the defaults.
    */
  private def stratumLookup(df: DataFrame, strataKey: Column,
      table: Seq[(String, Seq[Any])],
      cols: Seq[(String, Any, org.apache.spark.sql.types.DataType)]): DataFrame = {
    // the join path introduces _sl_-prefixed helper columns — a caller
    // frame already carrying them would silently alias (the RangeJoin
    // requireFresh discipline)
    val clash = df.columns.filter(c =>
      c == "_sl_key" || cols.exists { case (n, _, _) => c == s"_sl_$n" || c == n })
    require(clash.isEmpty,
      s"stratumLookup: input already has internal column(s) " +
        s"${clash.mkString(", ")} — rename them before sampling")
    // the "both shapes are the same function" contract needs UNIQUE
    // stratum keys: a duplicated key would be last-entry-wins in the
    // CASE fold but silently DUPLICATE input rows through the join
    // (r13 ADVICE). Every current caller derives `table` from a Map,
    // so this is an API guard, not a reachable state.
    val dupKeys = table.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dupKeys.isEmpty,
      s"stratumLookup: duplicate stratum key(s) ${dupKeys.mkString(", ")} — " +
        "the CASE and join shapes would diverge (last-wins vs row duplication)")
    if (table.size <= CaseBranchLimit) {
      cols.zipWithIndex.foldLeft(df) { case (acc, ((name, default, dt), i)) =>
        acc.withColumn(name,
          table.foldLeft(lit(default).cast(dt)) { case (a, (s, vs)) =>
            when(strataKey === s, lit(vs(i)).cast(dt)).otherwise(a)
          })
      }
    } else {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val schema = StructType(StructField("_sl_key", StringType) +:
        cols.map { case (n, _, dt) => StructField(s"_sl_$n", dt) })
      val rows: java.util.List[Row] = java.util.Arrays.asList(
        table.map { case (s, vs) => Row.fromSeq(s +: vs) }: _*)
      val lookup = df.sparkSession.createDataFrame(rows, schema)
      val joined = df.join(broadcast(lookup),
        strataKey === col("_sl_key"), "left_outer")
      cols.foldLeft(joined) { case (acc, (name, default, dt)) =>
        acc.withColumn(name, coalesce(col(s"_sl_$name"), lit(default).cast(dt)))
          .drop(s"_sl_$name")
      }.drop("_sl_key")
    }
  }

  /** Per-stratum fractions: rows in stratum s keep fraction
    * `fracs(s)`, anything unlisted keeps `defaultFrac`. The threshold
    * lookup rides [[stratumLookup]]: a scan-stage CASE for hand-sized
    * maps, a broadcast join past [[CaseBranchLimit]] strata (the
    * derived-frac callers sampleToMix/temperatureMix feed DATA-driven
    * stratum cardinalities here).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: Column,
      fracs: Map[String, Double], defaultFrac: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.types.StringType
    stratumLookup(df, col(strataCol),
      fracs.toSeq.sortBy(_._1).map { case (s, f) => s -> Seq(hexThreshold(f)) },
      Seq(("_ss_thr", hexThreshold(defaultFrac), StringType)))
      .filter(md5(keyCol.cast("string")) < col("_ss_thr"))
      .select(df.columns.map(col): _*)
  }

  /** Rebalance strata to target mix PROPORTIONS by deterministic
    * down-sampling: per-stratum keep fractions
    * `frac_s = min(1, target_s · scale / n_s)` with
    * `scale = min_s(n_s / target_s)` — the maximal sample whose
    * expected stratum mix equals `targets` with no stratum up-sampled
    * (the binding stratum keeps everything). Strata absent from
    * `targets` are dropped. One count aggregation collects #strata
    * rows (metadata scale — the quantizer-fit discipline), then the
    * same scan-stage md5 filter as [[stratifiedSample]]; every
    * arithmetic step is plain IEEE double written identically in the
    * q103 oracle, so the sampled SET is engine-portable.
    */
  def sampleToMix(df: DataFrame, strataCol: String, keyCol: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "sampleToMix: targets must be non-empty with positive weights")
    val counts = df.filter(col(strataCol).isin(targets.keys.toSeq: _*))
      .groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targets.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty,
      s"sampleToMix: no rows in any target stratum of '$strataCol'")
    val scale = present.map { case (s, t) => counts(s).toDouble / t }.min
    val fracs = present.map { case (s, t) =>
      s -> math.min(t * scale / counts(s).toDouble, 1.0)
    }
    stratifiedSample(df, strataCol, keyCol, fracs, defaultFrac = 0.0)
  }

  /** Temperature-based source rebalancing — the multilingual-corpus
    * mixing rule (sample source s ∝ n_s^α, α < 1 flattening the head
    * so low-resource sources aren't drowned; the mBERT/XLM-R exponent
    * discipline): per-stratum keep fractions from [[sampleToMix]]'s
    * max-sample arithmetic with targets t_s = n_s^α DERIVED from the
    * observed counts instead of hand-specified. α is restricted to
    * {1.0, 0.5, 0.25} — the exponents expressible as repeated IEEE
    * square roots, each CORRECTLY ROUNDED by spec and therefore
    * bit-identical in any engine; a general `pow` is only
    * faithfully rounded and may differ in the last ulp between
    * libms, which would flip keep/drop verdicts at the md5 threshold
    * boundary (§5.3 — the same reason PSI's ln is excluded from the
    * drift monitors). Cost: one stratum-count aggregation (#strata
    * rows to the driver — metadata scale), then the same scan-stage
    * md5 filter as [[stratifiedSample]]; nothing corpus-sized
    * shuffles.
    */
  def temperatureMix(df: DataFrame, strataCol: String, keyCol: Column,
      alpha: Double = 0.5): DataFrame = {
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("_s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, s"temperatureMix: no rows with non-NULL '$strataCol'")
    stratifiedSample(df, strataCol, keyCol, temperatureFracs(counts, alpha),
      defaultFrac = 0.0)
  }

  /** The tempered keep-fraction arithmetic of [[temperatureMix]],
    * decoupled from the count source: per-stratum counts may come from
    * the in-plan aggregate above, a stored stats table, or a
    * streaming-maintained state table
    * ([[graft.streaming.StreamingFeatures.maintainAggState]]) — at
    * 100 TB re-mixing against CURRENT counts then costs zero extra
    * aggregation, the same serve-from-maintained-state posture as the
    * drift monitors. The sampleToMix arithmetic verbatim (q103 oracle
    * shape): maximal sample whose expected mix matches the tempered
    * targets with no stratum up-sampled — the binding
    * (smallest-weight-ratio) stratum keeps everything. `min` over
    * strata is order-independent, so the fracs — and therefore the
    * kept SET — do not depend on map iteration order.
    */
  def temperatureFracs(counts: Map[String, Long],
      alpha: Double): Map[String, Double] = {
    require(alpha == 1.0 || alpha == 0.5 || alpha == 0.25,
      s"temperatureMix: alpha must be 1.0, 0.5 or 0.25 (sqrt-composable, " +
        s"engine-portable — general pow is not correctly rounded), got $alpha")
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      "temperatureFracs: counts must be non-empty and positive")
    def weight(n: Long): Double = alpha match {
      case 1.0 => n.toDouble
      case 0.5 => math.sqrt(n.toDouble)
      case _ => math.sqrt(math.sqrt(n.toDouble))
    }
    val scale = counts.map { case (_, n) => n.toDouble / weight(n) }.min
    counts.map { case (s, n) =>
      s -> math.min(weight(n) * scale / n.toDouble, 1.0)
    }
  }

  /** Keep the top `frac` of every stratum under `order` (curation:
    * "top 40 % by quality per source"). percent_rank ≤ frac over one
    * window exchange on the stratum key; with a total tie-break in
    * `order` the kept set is deterministic and engine-portable
    * (percent_rank is an exact integer-ratio double).
    */
  def topFractionBy(df: DataFrame, strataCol: String, frac: Double,
      order: Column*): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0,
      s"topFractionBy: frac must be in [0,1], got $frac")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(order: _*)
    df.withColumn("_pr", percent_rank().over(w))
      .filter(col("_pr") <= frac).drop("_pr")
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): weighted
    * sampling without replacement where row priority is
    * `weight / u` for a per-key uniform `u` — the top-k priorities
    * form the sample, and it carries unbiased subset-sum estimators.
    * The natural curation use is token-budget sampling: weight =
    * document length ⇒ long documents are proportionally favored,
    * reproducibly.
    *
    * `u` is DERIVED, not drawn: the first 13 hex digits of `md5(key)`
    * parse to an integer in [0, 2^52), plus 1 to avoid division by
    * zero — the same portable-hash discipline as [[hashSample]], so
    * the sample is a pure function of the row keys. The priority is
    * one exact-integer-to-double cast per side and one correctly-
    * rounded IEEE division — bit-identical in any engine (§5.3), so
    * the selected SET (not just its size) is engine-portable; ties
    * break on the key.
    *
    * Per-stratum top-k is a rank-≤-k filter, which Catalyst rewrites
    * to Partial+Final WindowGroupLimit heaps — at 100 TB only ≤k rows
    * per map partition per stratum reach the exchange; no stratum is
    * ever fully sorted.
    */
  def priorityColumn(keyCol: Column, weightCol: Column): Column = {
    val u = conv(substring(md5(keyCol.cast("string")), 1, 13), 16, 10)
      .cast("long") + lit(1L)
    weightCol.cast("double") / u.cast("double")
  }

  /** Global weighted top-k by priority — TakeOrderedAndProject. */
  def prioritySample(df: DataFrame, keyCol: Column, weightCol: Column,
      k: Int): DataFrame =
    df.withColumn("_prio", priorityColumn(keyCol, weightCol))
      .orderBy(col("_prio").desc, keyCol)
      .limit(k)
      .drop("_prio")

  /** Per-stratum weighted top-k by priority (WindowGroupLimit shape).
    * Adds `rankCol` (1-based within the stratum). */
  def prioritySampleByStratum(df: DataFrame, strataCol: String,
      keyCol: Column, weightCol: Column, k: Int,
      rankCol: String = "prio_rank"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(priorityColumn(keyCol, weightCol).desc, keyCol)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Examples-proportional mixing with an artificial size cap
    * (Raffel et al., JMLR 2020 §3.5.2 — the T5 mixing rule, the third
    * member of the canonical family beside [[temperatureMix]] and
    * [[uniMaxBudgets]]): sampling rates ∝ min(n_s, K), so sources
    * below the cap keep their natural proportion while every source
    * above it contributes as if it had exactly K rows — the blunt,
    * robust guard against one giant crawl drowning the mixture.
    * Same maximal-sample arithmetic as [[sampleToMix]] (no stratum
    * up-sampled; the binding stratum keeps everything), same
    * metadata-scale count aggregation + scan-stage md5 filter, every
    * double step written identically in the oracle.
    */
  def cappedMix(df: DataFrame, strataCol: String, keyCol: Column,
      cap: Long): DataFrame = {
    require(cap >= 1, s"cappedMix: cap must be >= 1, got $cap")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("_s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, s"cappedMix: no rows with non-NULL '$strataCol'")
    val scale = counts.map { case (_, n) =>
      n.toDouble / math.min(n, cap).toDouble
    }.min
    val fracs = counts.map { case (s, n) =>
      s -> math.min(math.min(n, cap).toDouble * scale / n.toDouble, 1.0)
    }
    stratifiedSample(df, strataCol, keyCol, fracs, defaultFrac = 0.0)
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023 "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total token `budget` across sources as
    * UNIFORMLY as possible subject to a per-source repetition cap of
    * `maxEpochs` passes — the data-constrained regime
    * ([[temperatureMix]] only ever down-samples; when the budget
    * exceeds the corpus, sources must be REPEATED, and temperature
    * mixing has no principled way to cap repetition per source).
    *
    * Deterministic integer water-filling, processed in ascending
    * (cap, name) order: each step offers the smallest-capped source an
    * equal integer share `remaining / #active`; a source whose cap
    * `n_s · maxEpochs` fits inside the share takes exactly its cap
    * (it binds) and the leftover re-levels across the rest; the first
    * source whose cap exceeds the share ends the pass — every still-
    * active source takes the floor share, and the integer remainder
    * goes +1 each to the lexicographically smallest active names. All
    * arithmetic is exact BIGINT (floor division), so an oracle replays
    * the allocation closed-form with prefix sums — no double ever
    * enters. Σ allocations = min(budget, Σ caps); no source exceeds
    * its cap; when no cap binds the split is the near-equal integer
    * partition of the budget.
    */
  def uniMaxBudgets(tokenCounts: Map[String, Long], budget: Long,
      maxEpochs: Int): Map[String, Long] = {
    require(budget >= 0, s"uniMaxBudgets: budget must be >= 0, got $budget")
    require(maxEpochs >= 1,
      s"uniMaxBudgets: maxEpochs must be >= 1, got $maxEpochs")
    require(tokenCounts.nonEmpty && tokenCounts.values.forall(_ > 0),
      "uniMaxBudgets: tokenCounts must be non-empty and positive")
    require(tokenCounts.values.forall(_ <= Long.MaxValue / maxEpochs),
      "uniMaxBudgets: n · maxEpochs overflows Long")
    val ord = tokenCounts.toSeq
      .map { case (s, nTok) => (s, nTok * maxEpochs) }
      .sortBy { case (s, cap) => (cap, s) }
    val out = Map.newBuilder[String, Long]
    var remaining = budget
    var idx = 0
    var leveled = false
    while (idx < ord.length && !leveled) {
      val active = ord.length - idx
      val share = remaining / active
      val (s, cap) = ord(idx)
      if (cap <= share) {
        out += s -> cap
        remaining -= cap
        idx += 1
      } else leveled = true
    }
    if (idx < ord.length) {
      val active = ord.length - idx
      val share = remaining / active
      val extra = remaining - share * active
      ord.drop(idx).map(_._1).sorted.zipWithIndex.foreach { case (s, i) =>
        out += s -> (share + (if (i < extra) 1L else 0L))
      }
    }
    out.result()
  }

  /** Materialize an epoch-aware training mix under a token budget: each
    * stratum's [[uniMaxBudgets]] allocation b_s becomes
    * `b_s / n_s` FULL passes over the stratum (every row repeated with
    * epoch = 1..full) plus a fractional final epoch — the remainder
    * `b_s mod n_s` tokens selected by the scan-stage md5 threshold at
    * fraction `(b_s mod n_s) / n_s` (one exact-BIGINT-to-double
    * division, §5.3-portable — the jacc_q discipline), keyed on
    * `md5(key · ":ep")` so the partial-epoch subset is independent of
    * any [[hashSample]] the caller already applied to the same keys.
    * A capped stratum (full = maxEpochs) has remainder 0 by
    * construction, so no row ever exceeds `maxEpochs` repetitions.
    *
    * Cost: one stratum-count aggregation (#strata rows to the driver —
    * metadata scale, the [[temperatureMix]] posture), then the output
    * is a pure generator projection (`explode(sequence)`) plus one
    * scan-stage filter — nothing corpus-sized shuffles, and the repeat
    * factor rides the generator, not a join. Rows with a NULL stratum
    * are excluded (no budget to charge them against). Emits the input
    * columns plus `epochCol` (1-based).
    */
  def epochMix(df: DataFrame, strataCol: String, keyCol: Column,
      weightCol: Column, budget: Long, maxEpochs: Int,
      epochCol: String = "epoch"): DataFrame = {
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("_s"))
      .agg(sum(weightCol.cast("long")).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, s"epochMix: no rows with non-NULL '$strataCol'")
    epochMixFromCounts(df, strataCol, keyCol, counts, budget, maxEpochs,
      epochCol)
  }

  /** [[epochMix]] with the per-stratum token volumes supplied by the
    * caller — the [[temperatureFracs]] decoupling: counts may come
    * from the in-plan aggregate above, a stored stats table, or a
    * streaming-maintained state table
    * ([[graft.streaming.StreamingFeatures.maintainAggState]]), so at
    * 100 TB re-planning epochs against CURRENT volumes costs zero
    * extra aggregation. Strata absent from `counts` are excluded
    * (same posture as a NULL stratum: no volume, no budget to charge).
    */
  def epochMixFromCounts(df: DataFrame, strataCol: String, keyCol: Column,
      counts: Map[String, Long], budget: Long, maxEpochs: Int,
      epochCol: String = "epoch"): DataFrame = {
    require(counts.nonEmpty, "epochMixFromCounts: counts must be non-empty")
    require(counts.values.forall(_ > 0),
      s"epochMixFromCounts: every stratum needs positive token volume, got $counts")
    val budgets = uniMaxBudgets(counts, budget, maxEpochs)
    val strata = counts.keys.toSeq.sorted
    // per-stratum (full-epoch count, partial-epoch threshold) via
    // stratumLookup: CASE chains at hand scale, a broadcast join at
    // data-driven stratum cardinality (r13 — was two linear CASEs)
    import org.apache.spark.sql.types.{LongType, StringType}
    val looked = stratumLookup(df, col(strataCol).cast("string"),
      strata.map { s =>
        val rem = budgets(s) % counts(s)
        s -> Seq(budgets(s) / counts(s),
          hexThreshold(rem.toDouble / counts(s).toDouble))
      },
      Seq(("_full", 0L, LongType), ("_ep_thr", hexThreshold(0.0), StringType)))
    val fullEpochs = looked
      .withColumn(epochCol,
        explode(when(col("_full") >= 1L, sequence(lit(1L), col("_full")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("_full", "_ep_thr")
    val partial = looked
      .filter(col(strataCol).isNotNull &&
        md5(concat(keyCol.cast("string"), lit(":ep"))) < col("_ep_thr"))
      .withColumn(epochCol, col("_full") + 1L)
      .drop("_full", "_ep_thr")
    fullEpochs.unionByName(partial)
  }

  /** Deterministic n-way split: label each row with the name of the
    * weight bucket its `md5(key)` lands in — the reproducible
    * `randomSplit` (FS training cell) replacement. Weights are
    * normalized; buckets are contiguous hex intervals, so the splits
    * are disjoint and exhaustive.
    */
  def hashSplit(df: DataFrame, keyCol: Column,
      splits: Seq[(String, Double)], labelCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "hashSplit: weights must be positive")
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
    val h = md5(keyCol.cast("string"))
    val label = splits.zip(cuts.tail).init.foldRight(
      lit(splits.last._1)) { case (((name, _), cut), acc) =>
      when(h < lit(hexThreshold(math.min(cut, 1.0))), lit(name)).otherwise(acc)
    }
    df.withColumn(labelCol, label)
  }

  /** Largest-remainder (Hamilton) apportionment: split `total` across
    * strata proportionally to `counts`, in EXACT integers — each
    * stratum gets floor(total·nₛ/N), and the leftover seats go to the
    * largest remainders (ties by stratum name, so the allocation is a
    * pure function of the counts). The fraction-threshold samplers
    * above hit their target only in expectation; batch construction
    * ("give me EXACTLY 4096 examples, sources proportional") needs the
    * exact-total allocation. Requires total ≤ N (no stratum can owe
    * more rows than it has: floor(total·nₛ/N) ≤ nₛ iff total ≤ N).
    * BigInt products, so 10¹²-row strata cannot wrap the multiply.
    */
  def largestRemainderQuotas(counts: Map[String, Long],
      total: Long): Map[String, Long] = {
    require(total >= 0, s"largestRemainderQuotas: total must be >= 0, got $total")
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      "largestRemainderQuotas: need non-empty positive stratum counts")
    val n = counts.values.map(BigInt(_)).sum
    require(total <= n,
      s"largestRemainderQuotas: total $total exceeds corpus size $n")
    val base = counts.map { case (s, c) =>
      s -> (BigInt(total) * c / n).toLong }
    val topUp = (total - base.values.sum).toInt
    val bumped = counts.toSeq
      .map { case (s, c) => (s, BigInt(total) * c % n) }
      .sortBy { case (s, r) => (-r, s) }(Ordering.Tuple2(Ordering.BigInt, Ordering.String))
      .take(topUp).map(_._1).toSet
    base.map { case (s, q) => s -> (if (bumped(s)) q + 1 else q) }
  }

  /** Materialize the [[largestRemainderQuotas]] allocation: exactly
    * `total` rows, per-stratum quotas filled in the md5(key) order
    * with the key as tie-break (deterministic, unbiased within the
    * stratum, oracle-replayable — the q98 discipline). One
    * metadata-scale count collect fixes the quotas; selection is a
    * per-stratum rank window whose literal max-quota conjunct lets
    * Catalyst rewrite to Partial+Final WindowGroupLimit (per-partition
    * top-quota heaps before the stratum exchange), with the exact
    * per-stratum quota refined by a BROADCAST join against the quota
    * table (r13 — was a CASE chain linear in the stratum count: a
    * million-stratum allocation would have built a million-branch
    * expression; the quota table broadcasts at any realistic stratum
    * cardinality and the filter stays one comparison per row).
    */
  def largestRemainderSample(df: DataFrame, strataCol: String,
      keyCol: Column, total: Long): DataFrame = {
    require(df.schema(strataCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"largestRemainderSample: $strataCol must be a string stratum " +
        s"(cast first — e.g. a cluster id via .cast(\"string\")), got " +
        df.schema(strataCol).dataType.typeName)
    // a caller frame already carrying a helper column would be silently
    // REPLACED by withColumn and then restored with rank values by the
    // final column-order select (the stratumLookup requireFresh
    // discipline — r13 fresh-eyes audit)
    val clash = df.columns.filter(c => c == "_lrq_rn" || c == "_lrq_quota")
    require(clash.isEmpty,
      s"largestRemainderSample: input already has internal column(s) " +
        s"${clash.mkString(", ")} — rename them before sampling")
    val counts = df.groupBy(col(strataCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) {
      // zero strata: total = 0 is trivially satisfied by the empty
      // frame; any positive total is unfillable — fail with a named
      // error instead of the bare max-of-empty it used to throw
      require(total == 0,
        s"largestRemainderSample: empty input cannot fill total=$total")
      return df
    }
    require(!counts.contains(null),
      s"largestRemainderSample: NULL $strataCol stratum — a NULL never " +
        "matches the quota-table join, so its seats would silently " +
        "vanish; recode or drop NULL strata first")
    val quotas = largestRemainderQuotas(counts, total)
    val quotaDf = df.sparkSession
      .createDataFrame(quotas.toSeq).toDF(strataCol, "_lrq_quota")
    val maxQ = quotas.values.max
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(keyCol.cast("string")), keyCol)
    // the literal-max filter must sit DIRECTLY on the window so the
    // WindowGroupLimit rewrite still fires (a variable limit alone
    // would not rewrite — the r12 lesson); the broadcast quota join
    // then refines to the exact per-stratum quota
    df.withColumn("_lrq_rn", row_number().over(w).cast("long"))
      .filter(col("_lrq_rn") <= lit(maxQ))
      .join(broadcast(quotaDf), Seq(strataCol))
      .filter(col("_lrq_rn") <= col("_lrq_quota"))
      .select(df.columns.map(col): _*) // the join moved the key first; restore caller order
  }
}
