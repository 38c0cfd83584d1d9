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
    partitionBy: Seq[String] = Nil,
    buckets: Int = 0) {

  require(name.nonEmpty, "feature table name must be non-empty")
  require(keys.nonEmpty, s"feature table $name needs at least one key")
  // buckets > 0 = the 100 TB lookup-join layout (SURVEY §7.7): data is
  // written CLUSTERED BY the keys INTO `buckets` BUCKETS (sorted within
  // each), so the J3 training-set join plans with NO Exchange on the
  // feature side. Mutually exclusive with partitionBy here — one
  // physical-layout dimension per table keeps the commit/catalog
  // machinery simple; compose at the query level if both are needed.
  require(buckets >= 0, s"feature table $name: buckets must be >= 0, got $buckets")
  require(buckets == 0 || partitionBy.isEmpty,
    s"feature table $name: buckets and partitionBy are mutually exclusive")

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
