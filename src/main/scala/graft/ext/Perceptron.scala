package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Distributed batch-perceptron training over hashed text
  * features — the SUPERVISED companion to the distributed k-means
  * (`Clustering`) and the serving-side hashed classifier
  * (`TextAnalysis.hashedLinearScore`): it learns the integer weight
  * vector that tier assumes, completing the quality-classifier story
  * (train here, serve there) next to the spark.ml GBT path (U3).
  *
  * Algorithm: full-batch perceptron (Rosenblatt updates summed over the
  * whole misclassified set per iteration, not per-sample — the batch
  * variant is deterministic and order-free):
  *   w_{t+1} = w_t + Σ_{i : y_i·(w_t·x_i + b_t) ≤ 0} y_i·x_i
  * Every quantity is an INTEGER (bucket counts, ±1 labels, weight
  * sums), so the whole T-iteration recurrence is exact BIGINT
  * arithmetic and replays hash-for-hash as an unrolled DuckDB
  * recurrence — the q131 k-means discipline applied to supervised
  * training.
  *
  * Scale shape: the corpus-sized work is ONE feature extraction
  * (explode + (doc, bucket) hash agg, checkpointed); each iteration is
  * a broadcast join against the (≤ nBuckets+1)-row weight frame, one
  * doc-key agg for margins, and one bucket-key agg for updates — only
  * the weight vector round-trips the driver per iteration (the k-means
  * model-roundtrip discipline; data never).
  */
object Perceptron {

  /** Train on md5-hashed unigram counts (the DSIR/q128 bucket scheme:
    * first `2` hex chars → 256 buckets). `positive` is the boolean
    * label column expression (true → +1, false → −1). Returns the
    * learned model as (pos, weight): pos ∈ [0, 256), plus pos = 256
    * for the bias term — ready to broadcast into a serving projection.
    */
  def batchPerceptronHashed(docs: DataFrame, idCol: String, textCol: String,
      positive: Column, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"batchPerceptronHashed: iterations must be in [1,64], got $iterations")
    val spark = docs.sparkSession
    val nBuckets = 256
    // (doc, bucket) counts and ±1 labels: each is consumed every
    // iteration — materialize once, cut the corpus out of the loop
    val feats = docs
      .select(col(idCol).as("_id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("_term"))
      .select(col("_id"),
        conv(substring(md5(col("_term")), 1, 2), 16, 10).cast("long").as("pos"))
      .groupBy(col("_id"), col("pos")).agg(count(lit(1)).as("cnt"))
      // lazy (r19): iteration 1's first job materializes the blocks;
      // every later iteration reads them — same sharing, two fewer
      // standalone checkpoint jobs
      .localCheckpoint(false)
    val labels = docs
      .select(col(idCol).as("_id"),
        when(positive, 1L).otherwise(-1L).as("y"))
      .localCheckpoint(false)

    val w = Array.fill(nBuckets + 1)(0L) // index nBuckets = bias
    for (_ <- 1 to iterations) {
      val wDf = spark.createDataFrame(
        (0 until nBuckets).map(i => (i.toLong, w(i))))
        .toDF("pos", "wv")
      val dots = feats.join(broadcast(wDf), Seq("pos"))
        .groupBy(col("_id")).agg(sum(col("cnt") * col("wv")).as("dot"))
      // token-less docs have no feature rows: their margin is the bias
      // alone (left join + coalesce), and they still vote on the bias
      // lazy checkpoint + ONE fused update aggregate (r19): the bias
      // votes ride the same groupBy as the bucket updates under the
      // sentinel pos = nBuckets (integer sums are order-independent,
      // so the fused update equals the former two-job split exactly),
      // and the checkpoint materializes inside that single collect —
      // one driver job per iteration instead of three
      val mis = labels.join(dots, Seq("_id"), "left_outer")
        .select(col("_id"), col("y"),
          (coalesce(col("dot"), lit(0L)) + lit(w(nBuckets))).as("mar"))
        .filter(col("y") * col("mar") <= 0)
        .localCheckpoint(false) // consumed by both update arms below
      val upd = mis.join(feats, Seq("_id"))
        .select(col("pos"), (col("y") * col("cnt")).as("_u"))
        .unionAll(mis.select(lit(nBuckets.toLong).as("pos"), col("y").as("_u")))
        .groupBy(col("pos")).agg(sum(col("_u")).as("up"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      upd.foreach { case (p, u) => w(p) += u }
    }
    import spark.implicits._
    w.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("pos", "weight")
  }

  /** Serve a trained model ([[batchPerceptronHashed]]'s 257-long weight
    * vector: 256 bucket weights + bias) as a PURE SCAN PROJECTION —
    * the q133 serving discipline: the weights travel as a literal
    * array in the expression tree, each token position adds
    * `w[bucket(term)]` inside one `aggregate` HOF, zero shuffles and
    * zero joins at any corpus size. Emits (idCol, margin_q, predicted)
    * with predicted = margin > 0 — the exact training-side margin, so
    * train→serve round-trips bit-for-bit.
    */
  def hashedPerceptronScore(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Long]): DataFrame =
    withHashedPerceptronScore(docs, textCol, weights)
      .select(col(idCol), col("margin_q"), col("predicted"))

  /** [[hashedPerceptronScore]] as a column APPENDER — same literal-array
    * zero-shuffle projection, but the input columns ride along, so the
    * scorer composes inside a curation pipeline (filter on `margin_q`,
    * keep the document) without a join back onto the corpus.
    */
  def withHashedPerceptronScore(docs: DataFrame, textCol: String,
      weights: Seq[Long]): DataFrame = {
    require(weights.length == 257,
      s"hashedPerceptronScore: need 256 bucket weights + bias, got ${weights.length}")
    val wLit = typedLit(weights)
    // NULL text scores as zero features → margin = bias, matching the
    // oracle replays' coalesce(dot, 0) + bias (a NULL token array
    // would otherwise NULL the whole margin and desync the ranking)
    val toks = coalesce(TextAnalysis.tokens(lower(col(textCol))),
      array().cast("array<string>"))
    val margin = aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(wLit,
        (conv(substring(md5(t), 1, 2), 16, 10).cast("long") + 1L).cast("int"))) +
      lit(weights(256))
    docs.withColumn("margin_q", margin)
      .withColumn("predicted", margin > 0)
  }
}
