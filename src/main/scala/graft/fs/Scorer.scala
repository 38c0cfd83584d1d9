package graft.fs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch scoring — the reference's `fs.score_batch("models:/name/v",
  * batch_df, result_type)` (FS:363, FS:388; SO:275, SO:300): the model
  * artifact carries its `FeatureLookup`s, scoring replays the SAME
  * lookup joins as training (J4 = J3) against the *current* feature
  * tables, then appends a `prediction` column.
  *
  * MLflow itself is out of engine scope (SURVEY.md §2.7); what we keep
  * is the data semantics: a registry addressed by `models:/name/version`
  * holding scorers that are pure column expressions over the joined
  * feature row — executed inside whole-stage codegen, eliminating the
  * reference's per-batch JVM→Python pyfunc boundary (SURVEY.md §3.3).
  */
trait Scorer {
  def name: String
  def version: Int
  def lookups: Seq[FeatureLookup]
  /** Column expression over the feature-joined DataFrame. */
  def scoreColumn(joined: DataFrame): Column
  /** Whole-DataFrame hook for scorers that aren't a single expression
    * (spark.ml PipelineModels append columns via transform). Default:
    * append `prediction` = scoreColumn. Output contract either way:
    * the joined columns plus a `prediction` column.
    */
  def scoreDf(joined: DataFrame): DataFrame =
    joined.withColumn("prediction", scoreColumn(joined))
}

/** U3 — a trained spark.ml PipelineModel as a registry scorer (the
  * reference registers its sklearn pipeline through
  * `fs.log_model(..., flavor=mlflow.sklearn)` and scores it with
  * `fs.score_batch`, FS:343-363). transform() runs distributed inside
  * the JVM — no pandas collect, no per-batch Python boundary.
  * `numericCols`/`numericFill` replay the training-side na.fill so
  * train/serve preprocessing stays identical; ONLY those declared
  * feature columns are filled (they come back filled in the output —
  * exactly the values the model consumed), every other joined column
  * passes through untouched so callers can still see which lookups
  * missed.
  */
final case class MlModelScorer(
    name: String,
    version: Int,
    lookups: Seq[FeatureLookup],
    model: org.apache.spark.ml.PipelineModel,
    numericCols: Seq[String] = Seq.empty,
    numericFill: Double = 0.0) extends Scorer {

  override def scoreColumn(joined: DataFrame): Column =
    throw new UnsupportedOperationException(
      s"MlModelScorer $name scores whole DataFrames via scoreDf")

  override def scoreDf(joined: DataFrame): DataFrame = {
    require(!joined.columns.contains("prediction"),
      s"scoreBatch($name): batch already carries a 'prediction' column")
    val filled =
      if (numericCols.isEmpty) joined else joined.na.fill(numericFill, numericCols)
    val scored = model.transform(filled)
    // result_type='string' semantics (FS:363): binary prediction as
    // "True"/"False"; pipeline work columns are dropped, non-feature
    // columns pass through with their original (unfilled) values
    scored.select(joined.columns.map(col) :+
      when(col("prediction") > 0.5, "True").otherwise("False").as("prediction"): _*)
  }
}

/** Deterministic stand-in for the reference's GBT classifier (FS:333):
  * a logistic model over numeric feature columns. NULL features (spine
  * rows missing from a feature table after the left-outer join)
  * contribute 0 — matching sklearn-pipeline behavior after the
  * reference's fillna. `result_type='string'` (FS:363) ⇒ prediction is
  * the string "True"/"False", which callers recast (FS:364).
  */
final case class LogisticScorer(
    name: String,
    version: Int,
    lookups: Seq[FeatureLookup],
    weights: Map[String, Double],
    bias: Double = 0.0) extends Scorer {

  def scoreColumn(joined: DataFrame): Column = {
    val z = weights.toSeq.sortBy(_._1).map { case (c, w) =>
      coalesce(col(c).cast("double"), lit(0.0)) * lit(w)
    }.foldLeft(lit(bias))(_ + _)
    // sigmoid(z) > 0.5  ⟺  z > 0 — threshold on z avoids exp() in the
    // hot path and keeps the oracle SQL exactly portable.
    when(z > 0, "True").otherwise("False")
  }
}

final class ScorerRegistry {
  private var scorers = Map.empty[(String, Int), Scorer]

  def register(s: Scorer): Unit = synchronized { scorers += ((s.name, s.version) -> s) }

  /** Resolve `models:/name/version` (FS:363's URI scheme). */
  def resolve(uri: String): Scorer = {
    val parsed = uri.stripPrefix("models:/").split("/")
    require(parsed.length == 2, s"bad model URI: $uri (want models:/name/version)")
    scorers.getOrElse((parsed(0), parsed(1).toInt),
      throw new NoSuchElementException(s"no scorer registered for $uri"))
  }

  /** J4 — replay the training joins against current feature tables and
    * append `prediction` (FS:363). Uses the same LookupJoins builder as
    * TrainingSet.loadDf, so train/serve parity holds by construction.
    */
  def scoreBatch(store: FeatureStore, uri: String, batch: DataFrame): DataFrame = {
    val scorer = resolve(uri)
    val joined = LookupJoins.attach(store, batch, scorer.lookups)
    scorer.scoreDf(joined)
  }
}
