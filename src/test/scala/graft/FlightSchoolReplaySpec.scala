package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.etl.{Cleanse, Features, Identifiers}
import graft.fs._

/** End-to-end replay of the reference notebook's full pipeline on a
  * literal telco fixture, in the reference's own order
  * (Feature_Store_Telco_Churn_Flight_School.py):
  *
  *   1. cleanse raw data (setup.py:206-221)
  *   2. register + write demographic and service feature tables
  *      (FS:207-231)
  *   3. build spine with synthetic label (FS:156-157)
  *   4. create_training_set + load_df (FS:317-323)
  *   5. score_batch with a registered model (FS:363)
  *   6. evolve service features with two new columns via merge
  *      (FS:411-435) and re-score against the evolved table
  *   7. publish to the online store (SO:386-387)
  *
  * One flow, every capability — the integration contract a reference
  * user switching to this engine relies on.
  */
class FlightSchoolReplaySpec extends SparkSpec {
  import spark.implicits._

  private def rawTelco = Seq(
    // customerID, gender, SeniorCitizen, Partner, Dependents, tenure,
    // PhoneService, OnlineSecurity, OnlineBackup, DeviceProtection,
    // TechSupport, StreamingTV, StreamingMovies, PaperlessBilling,
    // Contract, MonthlyCharges, TotalCharges, Churn
    ("c1", "F", 1, "Yes", "No", 12, "Yes", "Yes", "No", "Yes", "No", "Yes", "No", "Yes", "Month-to-month", 70.0, "840.00", "Yes"),
    ("c2", "M", 0, "No", "No", 24, "Yes", "No", "No", "No", "No", "No", "No", "No", "Two year", 20.0, "480.00", "No"),
    ("c3", "F", 0, "Yes", "Yes", 0, "No", "No internet service", "No", "No", "No", "No", "No", "Yes", "One year", 45.0, " ", "No"))
    .toDF("customerID", "gender", "SeniorCitizen", "Partner", "Dependents",
      "tenure", "PhoneService", "OnlineSecurity", "OnlineBackup",
      "DeviceProtection", "TechSupport", "StreamingTV", "StreamingMovies",
      "PaperlessBilling", "Contract", "MonthlyCharges", "TotalCharges", "Churn")

  test("full flight-school pipeline replay") {
    // 0. per-user naming (ST:50)
    assert(Identifiers.databaseNameFor("First.Last+test@example.com") == "graft_firstlasttestexamplecom")

    // 1. cleanse
    val telco = Cleanse.telco(rawTelco)
    assert(telco.schema("Churn").dataType.typeName == "boolean")
    assert(telco.filter(col("customerID") === "c3").select("TotalCharges").collect()(0).isNullAt(0))

    // 2. feature tables: dry run first (FS:117), then register + write
    val store = FeatureStore.temp(spark)
    val demo = Features.computeDemographicFeatures(telco)
    assert(demo.columns.toSeq == Features.demographicCols)
    store.createTable(FeatureTableSpec("demographic_features", Seq("customerID"),
      demo.schema, "demographic features (FS:207-218)"))
    Features.computeDemographicFeatures.computeAndWrite(store, telco, "demographic_features")
    val svc = Features.computeServiceFeatures(telco)
    store.createTable(FeatureTableSpec("service_features", Seq("customerID"),
      svc.schema, "service features v1 (FS:127-135)"))
    Features.computeServiceFeatures.computeAndWrite(store, telco, "service_features")
    assert(store.readTable("service_features").count() == 3)

    // 3. spine with deterministic synthetic label (FS:156-157 uses
    //    hash%100<35; same expression shape here)
    val spine = telco.select(col("customerID"), col("Churn"))
      .withColumn("LastCallEscalated",
        when(col("Churn"), pmod(hash(col("customerID")), lit(100)) < 35)
          .otherwise(pmod(hash(col("customerID")), lit(100)) < 15))

    // 4. training set: all features from both tables, label kept,
    //    key excluded (FS:321)
    val lookups =
      FeatureLookup.allFeatures(store, "demographic_features", Seq("customerID")) ++
      FeatureLookup.allFeatures(store, "service_features", Seq("customerID"))
    val ts = FeatureStoreClient.createTrainingSet(store, spine, lookups,
      label = "Churn", excludeColumns = Seq("customerID"))
    val trainDf = ts.loadDf
    assert(!trainDf.columns.contains("customerID"))
    assert(trainDf.columns.contains("Churn") && trainDf.columns.contains("MonthlyCharges"))
    assert(trainDf.count() == 3)

    // 5. score_batch v1 (FS:363): monthly charges drive churn
    val registry = new ScorerRegistry
    registry.register(LogisticScorer("telco_churn", 1,
      Seq(FeatureLookup("service_features", "MonthlyCharges", "customerID")),
      weights = Map("MonthlyCharges" -> 1.0), bias = -50.0))
    val scored1 = registry.scoreBatch(store, "models:/telco_churn/1",
      telco.select(col("customerID")))
    val preds1 = scored1.orderBy("customerID").select("prediction")
      .as[String].collect().toSeq
    assert(preds1 == Seq("True", "False", "False")) // 70>50, 20<50, 45<50

    // 6. evolve: v2 adds NumOptionalServices + AvgPriceIncrease and
    //    merges into the EXISTING table (FS:411-435)
    Features.computeServiceFeaturesV2.computeAndWrite(store, telco, "service_features",
      WriteMode.Merge)
    val evolved = store.readTable("service_features")
    assert(evolved.columns.contains("NumOptionalServices"))
    assert(evolved.columns.contains("AvgPriceIncrease"))
    val c1 = evolved.filter(col("customerID") === "c1").collect()(0)
    assert(c1.getAs[Int]("NumOptionalServices") == 3) // Yes,No,Yes,No,Yes,No
    // c3: tenure 0 → AvgPriceIncrease 0.0 (E1 guard, FS:423-424)
    val c3 = evolved.filter(col("customerID") === "c3").collect()(0)
    assert(c3.getAs[Double]("AvgPriceIncrease") == 0.0)

    // re-score v2 against evolved features
    registry.register(LogisticScorer("telco_churn", 2,
      Seq(FeatureLookup("service_features", "NumOptionalServices", "customerID")),
      weights = Map("NumOptionalServices" -> 1.0), bias = -2.0))
    val preds2 = registry.scoreBatch(store, "models:/telco_churn/2",
      telco.select(col("customerID")))
      .orderBy("customerID").select("prediction").as[String].collect().toSeq
    assert(preds2 == Seq("True", "False", "False")) // 3>2, 0<2, 0<2

    // 7. publish online (SO:386-387)
    store.publishTable("service_features")
    assert(store.readOnlineTable("service_features").count() == 3)
  }
}
