package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.fs.FeatureFunction

/** Feature-engineering functions.
  *
  * Part A replays the reference's telco feature functions (FS:113-133,
  * FS:411-424) for unit tests on literal fixtures. Part B transposes the
  * same roles onto the driver's TPC-H-ish testdata (FIXTURES.md §C) for
  * the oracle/bench queries.
  */
object Features {

  // ------------------------------------------------------------ telco (A)

  /** FS:113-115 — static projection of demographic columns. */
  val demographicCols = Seq("customerID", "gender", "SeniorCitizen", "Partner", "Dependents")
  val computeDemographicFeatures: FeatureFunction =
    FeatureFunction("demographic_features", df => df.select(demographicCols.map(col): _*))

  /** FS:127-133 — DYNAMIC projection: everything that isn't the label or
    * a demographic column, plus null-fill. Column list computed from the
    * runtime schema (`data.columns`) — this is why the engine surface is
    * DataFrame, not Dataset[T] (SURVEY.md §7.5).
    */
  val computeServiceFeatures: FeatureFunction = FeatureFunction("service_features", { df =>
    // FS:132: ["customerID"] + [c for c in data.columns
    //                           if c not in ["Churn"] + demographic_cols]
    val serviceCols = "customerID" +:
      df.columns.toSeq.filterNot(c => c == "Churn" || demographicCols.contains(c))
    df.select(serviceCols.map(col): _*).na.fill(Map("TotalCharges" -> 0.0))
  })

  /** U1 rewritten as a native column expression — the reference's
    * `@pandas_udf('int') num_optional_services(*cols)` counts, per row,
    * how many of 6 service columns equal "Yes" (FS:413-416). As a
    * Catalyst expression it stays inside whole-stage codegen — no Arrow
    * JVM→Python hop per batch (SURVEY.md §4, "a genuine perf win").
    * NULL input counts 0, matching pandas `(NaN == "Yes") == False`.
    */
  def numOptionalServices(cols: Seq[String]): Column =
    cols.map(c => when(col(c) === "Yes", 1).otherwise(0)).reduce(_ + _)

  val optionalServiceCols = Seq("OnlineSecurity", "OnlineBackup", "DeviceProtection",
    "TechSupport", "StreamingTV", "StreamingMovies")

  /** FS:411-424 — evolved service features: the v1 columns plus
    * NumOptionalServices (U1) and AvgPriceIncrease (E1+E7), merged into
    * the existing table (add-column schema evolution, FS:435).
    */
  val computeServiceFeaturesV2: FeatureFunction = FeatureFunction("service_features_v2", { df =>
    computeServiceFeatures(df)
      .withColumn("NumOptionalServices", numOptionalServices(optionalServiceCols))
      .withColumn("AvgPriceIncrease",
        when(col("tenure") > 0, col("MonthlyCharges") - (col("TotalCharges") / col("tenure")))
          .otherwise(lit(0.0)))
  })

  // ------------------------------------------------------ testdata (B)

  /** Demographic-features analog: customer ⋈ nation projection (P1, J1).
    * `nation` is 25 rows — Catalyst broadcasts it; no shuffle.
    */
  val customerDemographics: FeatureFunction = FeatureFunction("customer_demographics", { cn =>
    // input: customer joined with nation upstream; projection only here
    cn.select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
      col("n_name").as("nation_name"), col("c_acctbal"))
  })

  /** Service-features analog: per-customer order aggregates (adds the
    * groupBy the reference lacks, SURVEY.md §2.5). Partial aggregation
    * is map-side; the single shuffle is on c_custkey — the same key the
    * training-set join uses, so at scale the exchange is reused.
    *
    * Monetary sums go through DECIMAL(18,2) (the source doubles are
    * exact 2-decimal values) so the sum is exact and independent of
    * partition/accumulation order — required for bit-identical results
    * vs the DuckDB oracle, and the right call at 100 TB anyway (float
    * sums drift with partitioning).
    */
  def orderFeatures(orders: DataFrame): DataFrame = {
    val priceDec = col("o_totalprice").cast(DecimalType(18, 2))
    orders.groupBy(col("o_custkey").as("c_custkey")).agg(
      count(lit(1)).as("n_orders"),
      sum(priceDec).cast("double").as("total_spent"),
      // No round() on the ratio: the decimal sum is exact, so the double
      // division is bit-identical across engines, while round() near a
      // half-cent boundary is implementation-defined.
      (sum(priceDec).cast("double") / count(lit(1))).as("avg_order_price"),
      // epoch micros, not a raw timestamp: timestamp dtype resolution
      // (ms vs µs) differs between the engines' parquet/pandas paths.
      unix_micros(max(col("o_orderdate")).cast("timestamp")).as("last_order_us"),
      sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open_orders"))
  }

  val computeOrderFeatures: FeatureFunction =
    FeatureFunction("order_features", orderFeatures)
}
