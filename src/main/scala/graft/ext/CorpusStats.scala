package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [extension] Corpus-level lexical diversity — the distinct-n audit a
  * mixing plan runs per source before weighting it (a source whose
  * type-token ratio collapses is template spam or a crawler loop, and
  * no per-DOCUMENT repetition score sees it: each copy looks clean;
  * the collapse only exists in the cross-document aggregate). No
  * reference citation — the reference has no corpus-statistics ops.
  *
  * Distinct-1 (type-token ratio) and distinct-2 (bigram ratio) per
  * source, over the same lowercase whitespace tokens the dedup tier
  * uses. All counts are exact BIGINTs; the two ratios are single IEEE
  * divisions at the edge (§5.3-portable).
  *
  * Scale shape: ONE scan tokenizes into an eagerly-cached (source,
  * tokens) frame (the tokenFrame discipline — three aggregates read
  * it, and an uncached lineage would re-tokenize the corpus per
  * consumer), then one aggregate per n-gram order: the gram stream
  * shuffles on (source, gram) for the exact distinct, with map-side
  * partial aggregation collapsing within-partition repeats — the
  * distinct count never funnels through a driver or a single
  * partition. The two orders run as separate aggregates rather than
  * one count_distinct pair (a multi-distinct plan Expands the stream
  * ×2 — same shuffle volume, deeper plan), then join null-safely on
  * the source-sized frames. EAGER semantics: the cache materializes
  * at call time.
  */
object CorpusStats {

  /** Per-source diversity: `(source, n_docs, n_tokens, uniq_tokens,
    * ttr, n_bigrams, uniq_bigrams, bigram_ttr)`, ordered by source.
    * Empty/NULL text contributes a document but no grams; a source
    * with zero tokens reports NULL ratios (not NaN — a poisoned ratio
    * would propagate through a mixing plan's arithmetic).
    */
  def distinctNgramDiversity(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    // NULL text → empty token array (tokens() passes NULL through, and
    // size(NULL) is -1 under Spark's legacy default — both would skew
    // the counts)
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(TextAnalysis.tokens(lower(col(textCol))))
    // EAGER cache (the SetSimJoin.tokenFrame discipline): three
    // aggregates read this frame — uncached, each would re-scan and
    // re-tokenize the corpus
    val base = docs.select(col(sourceCol).as("source"), toks.as("_t"))
      .withColumn("_n", size(col("_t")))
      .cache()
    base.count()
    val perSource = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_n").cast("long")).as("n_tokens"),
        sum(greatest(col("_n").cast("long") - 1L, lit(0L))).as("n_bigrams"))
    def uniq(gram: DataFrame, out: String): DataFrame = gram
      .groupBy(col("source"), col("_g")).agg(count(lit(1)).as("_c"))
      .groupBy(col("source")).agg(count(lit(1)).as(out))
    val u1 = uniq(base.select(col("source"), explode(col("_t")).as("_g")), "uniq_tokens")
    val bigrams = base.filter(col("_n") > 1)
      .select(col("source"), explode(transform(
        sequence(lit(1), col("_n") - 1),
        i => concat_ws(" ", element_at(col("_t"), i),
          element_at(col("_t"), i + 1)))).as("_g"))
    val u2 = uniq(bigrams, "uniq_bigrams")
    // null-safe join keys: a NULL source is a legitimate group in the
    // aggregates, but `Seq("source")` equi-keys would never match it —
    // the group would silently report zero distincts (r12 self-audit)
    def nullSafe(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r.withColumnRenamed("source", "_rs"),
        col("source") <=> col("_rs"), "left_outer").drop("_rs")
    nullSafe(nullSafe(perSource, u1), u2)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("uniq_tokens"), lit(0L)).as("uniq_tokens"),
        when(col("n_tokens") > 0, coalesce(col("uniq_tokens"), lit(0L))
          .cast("double") / col("n_tokens").cast("double")).as("ttr"),
        col("n_bigrams"),
        coalesce(col("uniq_bigrams"), lit(0L)).as("uniq_bigrams"),
        when(col("n_bigrams") > 0, coalesce(col("uniq_bigrams"), lit(0L))
          .cast("double") / col("n_bigrams").cast("double")).as("bigram_ttr"))
      .orderBy("source")
  }
}
