package graft.fs

import org.apache.spark.sql.DataFrame

/** Declarative training-set assembly — the reference's
  * `fs.create_training_set(spine, feature_lookups, label,
  * exclude_columns)` + `training_set.load_df()` (FS:317-323, SO:232-236).
  *
  * Semantics (FS:266, FS:321): spine rows preserved (left-outer lookup
  * joins), the label column kept, `excludeColumns` dropped from the
  * materialized DataFrame (they participate in the joins first — the
  * reference excludes the join key itself, `exclude_columns=
  * "customerID"`, FS:321). `loadDf` stays distributed — the reference's
  * `.toPandas()` collect cliff (FS:323) is deliberately the caller's
  * explicit choice, not the engine's.
  */
final case class TrainingSet(
    store: FeatureStore,
    spine: DataFrame,
    lookups: Seq[FeatureLookup],
    label: Option[String] = None,
    excludeColumns: Seq[String] = Nil) {

  label.foreach { l =>
    require(spine.columns.contains(l), s"label column $l not in spine")
  }

  def loadDf: DataFrame = {
    val joined = LookupJoins.attach(store, spine, lookups)
    val toDrop = excludeColumns.filterNot(label.contains)
    joined.drop(toDrop: _*)
  }
}

object FeatureStoreClient {
  /** Convenience mirroring the reference client's entry point name. */
  def createTrainingSet(
      store: FeatureStore,
      spine: DataFrame,
      lookups: Seq[FeatureLookup],
      label: String,
      excludeColumns: Seq[String] = Nil): TrainingSet =
    TrainingSet(store, spine, lookups, Some(label), excludeColumns)
}
