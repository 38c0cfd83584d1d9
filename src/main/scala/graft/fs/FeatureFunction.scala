package graft.fs

import org.apache.spark.sql.DataFrame

/** A feature-computation function: a pure `DataFrame => DataFrame` that
  * derives a feature table from a raw input DataFrame.
  *
  * This is the reference's `@feature_table` decorator semantics
  * (Feature_Store_Telco_Churn_Flight_School.py:102-115): calling the
  * function directly is a dry run (FS:117 "simply call the function" to
  * preview), and `computeAndWrite` materializes the result into a
  * registered feature table with the given mode (FS:230-231 overwrite-
  * like first write; FS:435 evolving merge). No decorator machinery is
  * needed in Scala — a named case class wrapping the function carries
  * the same surface.
  */
final case class FeatureFunction(name: String, f: DataFrame => DataFrame) {

  /** Dry run — compute without writing (FS:117). */
  def apply(input: DataFrame): DataFrame = f(input)

  /** Compute and materialize into `tableName` (FS:104-108). */
  def computeAndWrite(
      store: FeatureStore,
      input: DataFrame,
      tableName: String,
      mode: WriteMode = WriteMode.Merge): DataFrame = {
    val out = f(input)
    store.writeTable(tableName, out, mode)
    out
  }
}
