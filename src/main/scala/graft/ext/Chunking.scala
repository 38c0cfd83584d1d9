package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [extension] Context-window preparation for LLM training pipelines:
  * split documents into fixed-size token chunks and plan fixed-budget
  * sequence packing. No reference analog (the reference has no text
  * operators).
  *
  * Both operators are deliberately cheap at 100 TB:
  *   - [[chunkTokens]] is a NARROW flatMap — the chunk list is built
  *     inside the row (sequence → slice → join) and posexploded, so a
  *     corpus chunks in one scan with zero shuffles and the output
  *     partitioning inherits the input's.
  *   - [[packingPlan]] is one window aggregation per stream: a running
  *     token sum ordered by the document key, from which every doc's
  *     token interval and pack span follow arithmetically. Partitioning
  *     by the stream column keeps the window distributed (a global
  *     ORDER BY would funnel the corpus through one task); at 100 TB
  *     the stream key must be chosen with bounded per-stream volume
  *     (source × date shard), which is the caller's contract.
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_id`, `start_tok` (0-based token
    * offset), `chunk_text` (space-rejoined tokens — tokenization is
    * the portable whitespace split of [[TextAnalysis.tokens]]) and
    * `n_tokens` (== chunkSize except the tail). Chunks start every
    * `chunkSize − overlap` tokens; a doc shorter than one chunk yields
    * a single short chunk; an empty doc yields no rows.
    */
  def chunkTokens(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", chunkSize: Int = 512,
      overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, s"chunkTokens: chunkSize must be > 0, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"chunkTokens: overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    // chunk count: 0 for empty docs, else 1 + ceil(max(n-chunkSize,0)/stride).
    // The ceil runs in double floor() — exact below 2^53 and written
    // identically in the DuckDB oracle (the q89 arithmetic discipline).
    val nChunks = when(n === 0, lit(0L)).otherwise(
      lit(1L) + floor((greatest(n - chunkSize, lit(0)) + (stride - 1))
        / lit(stride.toDouble)).cast("long"))
    docs
      .select(col(idCol), toks.as("_toks"),
        // sequence(0, k-1) counts DOWN for k == 0 — guard empties
        when(nChunks === 0, array().cast("array<long>"))
          .otherwise(sequence(lit(0L), nChunks - 1)).as("_ids"))
      .select(col(idCol), col("_toks"), explode(col("_ids")).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        array_join(slice(col("_toks"),
          (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"),
        size(slice(col("_toks"),
          (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)))
          .as("n_tokens"))
  }

  /** Greedy sequence-packing plan: documents concatenate in `idCol`
    * order within each `streamCol` stream; each doc gets its token
    * interval [start_tok, end_tok) in the stream and the packs
    * (fixed `budget`-token training sequences) it spans. A doc
    * crossing a pack boundary reports first_pack < last_pack — the
    * split-across-sequences case the trainer handles. Zero-token docs
    * pin to the pack of their offset.
    */
  def packingPlan(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", streamCol: String = "source",
      budget: Int = 512): DataFrame = {
    require(budget > 0, s"packingPlan: budget must be > 0, got $budget")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
    docs
      .select(col(idCol), col(streamCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("end_tok", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .select(col(idCol), col(streamCol), col("n_tokens"),
        col("start_tok"), col("end_tok"),
        floor(col("start_tok") / lit(budget.toDouble)).as("first_pack"),
        floor(greatest(col("end_tok") - 1, col("start_tok"))
          / lit(budget.toDouble)).as("last_pack"))
  }
}
