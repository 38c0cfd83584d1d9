package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Data-cleansing operators — the reference's ingest+coerce stage
  * (includes/setup.py:206-221), generalized. Each op is a pure column
  * expression (E1-E12 in SURVEY.md §2.3): Catalyst folds them into the
  * scan's projection, so they cost nothing extra at 100 TB.
  */
object Cleanse {

  /** S1 — CSV ingest with header + schema inference (setup.py:206). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S1 sibling [extension] — JSON-lines ingest, the dominant LLM
    * corpus interchange format (one JSON object per line). With an
    * explicit schema the reader skips the inference pass (one fewer
    * full scan) and is deterministic about numeric widths — pass it in
    * production; `None` falls back to inference for exploration. Both
    * paths are the real multiline=false streaming reader: each line
    * parses independently, so a 100 TB corpus splits by line ranges
    * exactly like CSV/parquet row groups.
    */
  def readJsonLines(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(s => spark.read.schema(s).json(path))

  /** E3-as-boolean — `col == value` recode (setup.py:209: SeniorCitizen
    * == 1; setup.py:211-212: "Yes" flags). Three-valued: NULL stays NULL.
    */
  def flagToBoolean(c: Column, trueValue: Any): Column = c === lit(trueValue)

  /** E2 — multi-arm CASE WHEN recode with NULL fallthrough (no
    * `otherwise`), exactly the Contract→months recode at setup.py:214-217.
    */
  def recode(c: Column, mapping: Seq[(Any, Any)]): Column = {
    require(mapping.nonEmpty, "recode needs at least one mapping")
    val first = when(c === lit(mapping.head._1), lit(mapping.head._2))
    mapping.tail.foldLeft(first) { case (w, (from, to)) =>
      w.when(c === lit(from), lit(to))
    } // no .otherwise → NULL fallthrough, matching the reference
  }

  /** E8+E9+E10+E11 — empty-string-to-NULL then cast to double
    * (setup.py:219-221: TotalCharges arrives as string with blanks).
    * try_cast, not cast: under Spark 4's default ANSI mode a plain cast
    * of a dirty value ("N/A", "1,234") throws CAST_INVALID_INPUT and
    * kills the job; the reference ran Spark-3 semantics where invalid
    * casts produce NULL — which is what a cleansing op must do.
    */
  def blankToNullDouble(c: Column): Column =
    when(length(trim(c)) === 0, lit(null)).otherwise(trim(c)).try_cast(DoubleType)

  /** Full replay of the telco cleanse (setup.py:206-221) for a raw
    * telco-schema DataFrame — used by unit tests on literal fixtures
    * (the CSV itself doesn't ship; FIXTURES.md §A).
    */
  def telco(raw: DataFrame): DataFrame = {
    val yesNoCols = Seq("Partner", "Dependents", "PhoneService", "PaperlessBilling", "Churn")
    val step1 = raw.withColumn("SeniorCitizen", flagToBoolean(col("SeniorCitizen"), 1))
    val step2 = yesNoCols.foldLeft(step1)((d, c) => d.withColumn(c, flagToBoolean(col(c), "Yes")))
    step2
      .withColumn("Contract", recode(col("Contract"),
        Seq("Month-to-month" -> 1, "One year" -> 12, "Two year" -> 24)))
      .withColumn("TotalCharges", blankToNullDouble(col("TotalCharges")))
  }
}
