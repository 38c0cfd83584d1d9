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

  test("U3 replay: weighted GBT + hash split + registry scoring round-trip") {
    val numerics = Seq("n_orders", "total_spent", "avg_order_price")
    val base = Pipelines.trainingSet(spark, sfDir)
      .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
    // learnable label (threshold at the median of a feature) so test
    // accuracy is a real signal that training worked, not a coin flip
    val med = base.stat.approxQuantile("n_orders", Array(0.5), 0.0).head
    val labeled = base.withColumn("reorders", col("n_orders") > med)

    val trained = MlTraining.trainWeightedGbt(labeled, "reorders", "c_custkey",
      categoricalCols = Seq("c_mktsegment"), numericCols = numerics)
    assert(trained.trainRows > 0 && trained.testRows > 0)
    assert(trained.testAccuracy >= 0.8,
      s"GBT failed to learn a threshold on its own feature: ${trained.testAccuracy}")

    // register the fitted pipeline and score through the SAME lookup
    // joins as training (fs.log_model -> fs.score_batch round trip);
    // durable registry so the run-metrics sidecar is exercised too
    val regRoot = java.nio.file.Files.createTempDirectory("graft-reg-").toString
    val registry = ScorerRegistry.persistent(spark, regRoot)
    registry.register(MlModelScorer("gbt_reorders", 1,
      numerics.map(c => FeatureLookup("order_features", c, "c_custkey")) :+
        FeatureLookup("customer_demographics", "c_mktsegment", "c_custkey"),
      trained.model, numericCols = numerics))
    registry.logRun(RunInfo("gbt_reorders", 1, trained.metrics,
      params = Map("data_version" -> "v1", "split_seed" -> "42")))
    val store = Pipelines.buildStore(spark, sfDir)
    val batch = graft.Tables.load(spark, sfDir, "customer").select(col("c_custkey"))
    val scored = registry.scoreBatch(store, "models:/gbt_reorders/1", batch)
    assert(scored.count() == batch.count())
    assert(scored.columns.contains("prediction"))
    // serve-side predictions reproduce the learned rule on the same data
    val agree = scored
      .withColumn("truth", coalesce(col("n_orders"), lit(0L)) > med)
      .agg(avg(when((col("prediction") === "True") === col("truth"), 1.0)
        .otherwise(0.0))).head().getDouble(0)
    assert(agree >= 0.8, s"train/serve agreement too low: $agree")

    // run-metrics round trip: a FRESH registry over the same root must
    // answer the training metrics from the run.properties sidecar —
    // the registry-survives-the-notebook semantics of FS:340-349
    val reloaded = ScorerRegistry.persistent(spark, regRoot)
    val run = reloaded.getRun("gbt_reorders", 1)
      .getOrElse(fail("run metrics did not survive the registry reload"))
    assert(run.metrics("test_accuracy") == trained.testAccuracy) // exact double round trip
    assert(run.metrics("train_rows") == trained.trainRows.toDouble)
    assert(run.params == Map("data_version" -> "v1", "split_seed" -> "42"))
    // and the scorer itself still resolves in the fresh session
    assert(reloaded.resolve("models:/gbt_reorders/1").version == 1)
    // unknown version: absent, not an error
    assert(reloaded.getRun("gbt_reorders", 99).isEmpty)
  }

  test("trainWeightedGbt: empty/degenerate train splits fail with the intended message") {
    import spark.implicits._
    // empty input → empty train split; regression: sum(label) is NULL
    // and getDouble NPE'd before the require message fired
    val empty = Seq.empty[(Long, Boolean, Double)].toDF("id", "churn", "x")
    val e1 = intercept[IllegalArgumentException] {
      MlTraining.trainWeightedGbt(empty, "churn", "id",
        categoricalCols = Nil, numericCols = Seq("x"))
    }
    assert(e1.getMessage.contains("train split is empty"))

    // all-NULL labels → sum(label) NULL with n > 0
    val nullLabels = Seq((1L, null.asInstanceOf[java.lang.Boolean], 1.0),
      (2L, null.asInstanceOf[java.lang.Boolean], 2.0)).toDF("id", "churn", "x")
    val e2 = intercept[IllegalArgumentException] {
      MlTraining.trainWeightedGbt(nullLabels, "churn", "id",
        categoricalCols = Nil, numericCols = Seq("x"))
    }
    assert(e2.getMessage.contains("NULL on every train row"))

    // single-class labels keep the original diagnostic
    val oneClass = (1L to 20L).map(i => (i, true, i.toDouble)).toDF("id", "churn", "x")
    val e3 = intercept[IllegalArgumentException] {
      MlTraining.trainWeightedGbt(oneClass, "churn", "id",
        categoricalCols = Nil, numericCols = Seq("x"))
    }
    assert(e3.getMessage.contains("single class"))
  }
}
