package graft.fs

import org.apache.spark.sql.types.StructType

/** Metadata of a registered feature table (SURVEY.md §1.1).
  *
  * Mirrors the observable surface of `fs.create_feature_table(name,
  * keys, schema, description)` in the reference
  * (Feature_Store_Telco_Churn_Flight_School.py:207-218): a name, one or
  * more primary-key columns used for lookups, a fixed schema, and free-
  * text description. `partitionBy` is our 100 TB extension: optional
  * physical partition columns for the offline store (the reference's
  * tables are unpartitioned, includes/setup.py:241-247).
  */
final case class FeatureTableSpec(
    name: String,
    keys: Seq[String],
    schema: StructType,
    description: String = "",
    partitionBy: Seq[String] = Nil) {

  require(name.nonEmpty, "feature table name must be non-empty")
  require(keys.nonEmpty, s"feature table $name needs at least one key")

  /** Key validation replays the client-side check the reference's
    * catalog performs at create time (every key must be a schema column).
    */
  def validate(): Unit = {
    val cols = schema.fieldNames.toSet
    val missing = keys.filterNot(cols.contains)
    require(missing.isEmpty,
      s"feature table $name: key column(s) ${missing.mkString(", ")} not in schema ${cols.mkString(", ")}")
    val badPart = partitionBy.filterNot(cols.contains)
    require(badPart.isEmpty,
      s"feature table $name: partition column(s) ${badPart.mkString(", ")} not in schema")
  }
}
