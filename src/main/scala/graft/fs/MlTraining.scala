package graft.fs

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U3 — the reference's model-training leg
  * (Feature_Store_Telco_Churn_Flight_School.py:320-345), Spark-native:
  * the reference collects the training set to pandas and fits a
  * single-node sklearn `OneHotEncoder + GradientBoostingClassifier`
  * pipeline — the scalability cliff SURVEY.md §3.3 calls out. Here the
  * SAME `TrainingSet.loadDf` output feeds spark.ml directly:
  * StringIndexer/OneHotEncoder for the categoricals, GBTClassifier for
  * the booster, class-balanced example weights (the reference's
  * churn_weight/not_churn_weight, FS:328-331) via `weightCol`, and the
  * deterministic hash split from `etl.Splits` standing in for
  * sklearn's train_test_split(random_state=42). Everything runs
  * distributed; nothing collects to the driver but the fitted model
  * coefficients (O(trees), not O(rows)).
  */
object MlTraining {

  final case class TrainedModel(
      model: PipelineModel,
      testAccuracy: Double,
      trainRows: Long,
      testRows: Long) {
    /** The run-tracking view of this fit (FS:340's logged score) —
      * feed to [[ScorerRegistry.logRun]] alongside `register`.
      */
    def metrics: Map[String, Double] = Map(
      "test_accuracy" -> testAccuracy,
      "train_rows" -> trainRows.toDouble,
      "test_rows" -> testRows.toDouble)
  }

  /** Fit a class-weighted GBT over `df`. `labelCol` must be boolean or
    * 0/1-numeric; categorical string columns are one-hot encoded with
    * unseen-value tolerance (sklearn's handle_unknown='ignore').
    * NULL numerics fill with `numericFill` — callers score through
    * [[MlModelScorer]] with the same fill for train/serve parity.
    */
  def trainWeightedGbt(df: DataFrame, labelCol: String, idCol: String,
      categoricalCols: Seq[String], numericCols: Seq[String],
      testPercent: Int = 20, seed: Long = 42L,
      numericFill: Double = 0.0, maxIter: Int = 10): TrainedModel = {
    val prepared = df
      .withColumn("label", col(labelCol).cast("double"))
      .na.fill(numericFill, numericCols)
    val (train0, test) = graft.etl.Splits.hashSplit(prepared, idCol, 100 - testPercent)

    // class-balanced weights: weight(c) = 1 / count(c) (FS:328-331);
    // one tiny agg on the train split — a terminal training action,
    // not plan construction
    val counts = train0.agg(
      sum(col("label")).cast("double").as("pos"),
      count(lit(1)).cast("double").as("n")).head()
    val n = counts.getDouble(1)
    require(n > 0, "trainWeightedGbt: train split is empty")
    // sum(label) is NULL when every train label is NULL — read it only
    // after ruling that out, or getDouble NPEs before the message fires
    require(!counts.isNullAt(0),
      s"trainWeightedGbt: label $labelCol is NULL on every train row")
    val pos = counts.getDouble(0)
    require(pos > 0 && pos < n,
      s"trainWeightedGbt: label $labelCol has a single class in the train split")
    val train = train0.withColumn("weight",
      when(col("label") === 1.0, lit(1.0 / pos)).otherwise(lit(1.0 / (n - pos))))

    val stages =
      categoricalCols.flatMap { c =>
        Seq(
          new StringIndexer().setInputCol(c).setOutputCol(s"${c}_ix")
            .setHandleInvalid("keep"),
          new OneHotEncoder().setInputCol(s"${c}_ix").setOutputCol(s"${c}_vec"))
      } :+
        new VectorAssembler()
          .setInputCols((numericCols ++ categoricalCols.map(c => s"${c}_vec")).toArray)
          .setOutputCol("features") :+
        new GBTClassifier().setLabelCol("label").setWeightCol("weight")
          .setMaxIter(maxIter).setSeed(seed)

    val model = new Pipeline().setStages(stages.toArray).fit(train)

    // test accuracy (the reference logs pipeline_model.score(X_test,
    // y_test), FS:340) — one distributed agg, no collect
    val scoredTest = model.transform(test)
    val acc = scoredTest.agg(
      avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)).as("acc"),
      count(lit(1)).as("n_test")).head()
    TrainedModel(model, acc.getDouble(0), n.toLong, acc.getLong(1))
  }
}
