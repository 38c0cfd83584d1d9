package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Span-corruption masking plan — the T5 denoising
  * objective (Raffel et al., JMLR 2020 §3.1.4) as a DETERMINISTIC
  * data-construction operator: mask ~`noiseFrac` of each document's
  * tokens in spans of `spanLen`, replace each maximal masked run with
  * a `<extra_id_k>` sentinel in the input, and emit the
  * sentinel-delimited masked tokens as the target. The standard
  * implementation draws spans from an RNG, which makes the training
  * set unreproducible across runs and engines; here a position starts
  * a span iff `md5(id:pos:sc)` falls under the
  * `noiseFrac / spanLen` threshold — the [[graft.etl.Sampling]]
  * portable-hash discipline — so the same document always corrupts
  * the same way, a re-run or a backfill produces byte-identical
  * training rows, and a DuckDB oracle replays every mask decision.
  *
  * Span semantics: each selected start covers `spanLen` positions
  * (truncated at the document end); overlapping or adjacent spans
  * MERGE into one maximal run with one sentinel (T5's "consecutive
  * spans" rule), so the realized masked fraction sits slightly below
  * `noiseFrac` under overlap. Expected start rate
  * `noiseFrac / spanLen` makes the expected masked fraction
  * ≈ `noiseFrac` (before the merge discount).
  *
  * Execution shape: ONE pure scan projection — every array
  * (start flags, coverage, run starts, rebuilt token lists) derives
  * per row with higher-order functions; no shuffle, no join, no RNG
  * state, at any corpus size. Each intermediate array lands in its
  * own projection stage so lambdas index ATTRIBUTES, not re-inlined
  * expressions. Per-row expression cost is O(tokens · spans) (the
  * run-index lookup); chunk book-length rows upstream
  * ([[Chunking.chunkTokens]]) — the ngramFingerprints maxTokens
  * discipline.
  */
object Denoise {

  /** Emits (idCol, input_text, target_text, n_masked, n_spans).
    * Empty docs pass through with empty input and target, never NULL.
    */
  def spanCorruptionPlan(docs: DataFrame, idCol: String, textCol: String,
      noiseFrac: Double = 0.15, spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1,
      s"spanCorruptionPlan: spanLen must be >= 1, got $spanLen")
    require(noiseFrac >= 0.0 && noiseFrac <= spanLen,
      s"spanCorruptionPlan: need 0 <= noiseFrac and noiseFrac/spanLen <= 1, " +
        s"got noiseFrac=$noiseFrac spanLen=$spanLen")
    val thr = graft.etl.Sampling.hexThreshold(noiseFrac / spanLen)
    val L = spanLen

    val toks = coalesce(TextAnalysis.tokens(col(textCol)),
      array().cast("array<string>"))
    val posOf = (t: Column) => when(size(t) > 0, sequence(lit(1), size(t)))
      .otherwise(array().cast("array<int>"))

    val base = docs.select(col(idCol), toks.as("_t"))
      .withColumn("_pos", posOf(col("_t")))
      // deterministic span starts: a pure function of (doc id, position)
      .withColumn("_start", transform(col("_pos"), i =>
        md5(concat(col(idCol).cast("string"), lit(":"), i.cast("string"),
          lit(":sc"))) < lit(thr)))
      // coverage: position j is masked iff some start lies within the
      // last L positions (slice start is clamped at 1 — a span never
      // counts backward past the document head)
      .withColumn("_masked", transform(col("_pos"), j => {
        val from = greatest(j - (L - 1), lit(1))
        exists(slice(col("_start"), from, j - from + 1), b => b)
      }))
      // maximal-run starts: masked here, unmasked (or nothing) before
      .withColumn("_runs", filter(col("_pos"), j =>
        element_at(col("_masked"), j) &&
          (j === 1 || !element_at(col("_masked"), j - 1))))

    val sentinel = (j: Column) =>
      concat(lit("<extra_id_"),
        array_position(col("_runs"), j).cast("string"), lit(">"))
    val inputToks = flatten(transform(col("_pos"), j =>
      when(element_at(col("_masked"), j),
        when(array_contains(col("_runs"), j), array(sentinel(j)))
          .otherwise(array().cast("array<string>")))
        .otherwise(array(element_at(col("_t"), j)))))
    val targetToks = flatten(transform(col("_pos"), j =>
      when(element_at(col("_masked"), j),
        when(array_contains(col("_runs"), j),
          array(sentinel(j), element_at(col("_t"), j)))
          .otherwise(array(element_at(col("_t"), j))))
        .otherwise(array().cast("array<string>"))))

    base.select(col(idCol),
      concat_ws(" ", inputToks).as("input_text"),
      concat_ws(" ", targetToks).as("target_text"),
      size(filter(col("_masked"), b => b)).cast("long").as("n_masked"),
      size(col("_runs")).cast("long").as("n_spans"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022) as a
    * deterministic data construction: a `fimRate` fraction of
    * documents (decided by `md5(id:fim)` under the portable-hash
    * threshold) is split at two token cuts into (prefix, middle,
    * suffix) and re-serialized in PSM order —
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M` — so the model
    * learns infilling; the rest pass through as their
    * canonical-whitespace token join. Both cut positions derive from
    * the 13-hex-digit md5 integer (the [[graft.etl.Sampling]]
    * priority-u discipline) mod (n+1), giving each of the (n+1)
    * boundary slots equal mass; the unordered pair sorts, so
    * prefix/middle/suffix partition the document exactly and any
    * segment may be empty (sentinels stay adjacent).
    *
    * One pure scan projection — no shuffle, no RNG state; a re-run or
    * a backfill reproduces byte-identical training rows, and every
    * cut decision replays in the oracle.
    *
    * Emits (idCol, fim_text, is_fim, n_prefix, n_middle, n_suffix);
    * pass-through rows report the whole document as prefix.
    */
  def fimPlan(docs: DataFrame, idCol: String, textCol: String,
      fimRate: Double = 0.5): DataFrame = {
    require(fimRate >= 0.0 && fimRate <= 1.0,
      s"fimPlan: fimRate must be in [0,1], got $fimRate")
    val thr = graft.etl.Sampling.hexThreshold(fimRate)
    val toks = coalesce(TextAnalysis.tokens(col(textCol)),
      array().cast("array<string>"))

    def u(salt: String): Column =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 13),
        16, 10).cast("long")

    val base = docs.select(col(idCol), toks.as("_t"))
      .withColumn("_n", size(col("_t")).cast("long"))
      .withColumn("_fim",
        md5(concat(col(idCol).cast("string"), lit(":fim"))) < lit(thr))
      .withColumn("_c1", u(":c1") % (col("_n") + 1L))
      .withColumn("_c2", u(":c2") % (col("_n") + 1L))
      .withColumn("_lo", least(col("_c1"), col("_c2")))
      .withColumn("_hi", greatest(col("_c1"), col("_c2")))
    val prefix = slice(col("_t"), lit(1), col("_lo").cast("int"))
    val middle = slice(col("_t"), col("_lo").cast("int") + 1,
      (col("_hi") - col("_lo")).cast("int"))
    val suffix = slice(col("_t"), col("_hi").cast("int") + 1,
      (col("_n") - col("_hi")).cast("int"))
    val fimToks = concat(
      array(lit("<fim_prefix>")), prefix,
      array(lit("<fim_suffix>")), suffix,
      array(lit("<fim_middle>")), middle)
    base.select(col(idCol),
      when(col("_fim"), concat_ws(" ", fimToks))
        .otherwise(concat_ws(" ", col("_t"))).as("fim_text"),
      col("_fim").as("is_fim"),
      when(col("_fim"), col("_lo")).otherwise(col("_n")).as("n_prefix"),
      when(col("_fim"), col("_hi") - col("_lo")).otherwise(lit(0L)).as("n_middle"),
      when(col("_fim"), col("_n") - col("_hi")).otherwise(lit(0L)).as("n_suffix"))
  }
}
