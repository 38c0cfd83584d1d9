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
  * Execution shape: ONE pure scan projection — every array (span
  * starts, covered-position union, run starts, rebuilt token lists)
  * derives per row with higher-order functions; no shuffle, no join,
  * no RNG state, at any corpus size. The md5 start decisions evaluate
  * exactly once per position (the coverage-array shape — see the
  * inline note on the CollapseProject inlining trap); the rebuild
  * pays O(masked) membership probes per position, the same contract
  * as the scrub rewrites. Chunk book-length rows upstream
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

    // The per-position md5 start flags must evaluate exactly ONCE per
    // position: an earlier formulation kept a boolean flag ARRAY and
    // sliced it per position, and CollapseProject inlined the md5
    // chain into the slice lambda — O(n²) md5 evaluations per row
    // (20.9 s vs 0.8 s at sf0.1). The q163 coverage-array shape
    // avoids the trap structurally: starts → covered-position union →
    // run starts, each a bounded array derived once, with only O(1)
    // array_contains probes per position in the rebuild.
    val base = docs.select(col(idCol), toks.as("_t"))
      .withColumn("_starts", filter(posOf(col("_t")), i =>
        md5(concat(col(idCol).cast("string"), lit(":"), i.cast("string"),
          lit(":sc"))) < lit(thr)))
      // covered positions: each start spans L slots, truncated at the
      // document end; sorted+distinct so runs derive by adjacency
      .withColumn("_cov", array_sort(array_distinct(flatten(
        transform(col("_starts"), s =>
          sequence(s, least(s + (L - 1), size(col("_t")))))))))
      // maximal-run starts: a covered position whose predecessor slot
      // is not covered — zip the sorted array against its shift-by-one
      .withColumn("_runs", filter(
        zip_with(col("_cov"),
          concat(array(lit(-1)), slice(col("_cov"), lit(1),
            greatest(size(col("_cov")) - 1, lit(0)))),
          (cur, prev) => when(cur =!= prev + 1, cur)),
        x => x.isNotNull))

    val sentinel = (j: Column) =>
      concat(lit("<extra_id_"),
        array_position(col("_runs"), j).cast("string"), lit(">"))
    val inputToks = flatten(transform(posOf(col("_t")), j =>
      when(!array_contains(col("_cov"), j), array(element_at(col("_t"), j)))
        .when(array_contains(col("_runs"), j), array(sentinel(j)))
        .otherwise(array().cast("array<string>"))))
    val targetToks = flatten(transform(posOf(col("_t")), j =>
      when(!array_contains(col("_cov"), j), array().cast("array<string>"))
        .when(array_contains(col("_runs"), j),
          array(sentinel(j), element_at(col("_t"), j)))
        .otherwise(array(element_at(col("_t"), j)))))

    base.select(col(idCol),
      concat_ws(" ", inputToks).as("input_text"),
      concat_ws(" ", targetToks).as("target_text"),
      size(col("_cov")).cast("long").as("n_masked"),
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
