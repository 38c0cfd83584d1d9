package graft.fs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative lookup spec — which feature, from which table, joined on
  * which spine column. Mirrors `FeatureLookup(table_name, lookup_key,
  * feature_name)` in the reference (FS:289, SO:201): pure metadata, no
  * data. `lookupKey` names the SPINE column(s) carrying the value that
  * matches the feature table's primary key(s), positionally.
  */
final case class FeatureLookup(table: String, feature: String, lookupKey: Seq[String])

object FeatureLookup {
  def apply(table: String, feature: String, lookupKey: String): FeatureLookup =
    FeatureLookup(table, feature, Seq(lookupKey))

  /** One lookup per (non-key) feature column of a table — the reference
    * generates its lookup list exactly this way (FS:286-289: iterate
    * `fs.read_table(name).columns`, skip the key).
    */
  def allFeatures(store: FeatureStore, table: String, lookupKey: Seq[String]): Seq[FeatureLookup] = {
    val spec = store.getSpec(table)
    spec.schema.fieldNames.toSeq
      .filterNot(spec.keys.contains)
      .map(f => FeatureLookup(table, f, lookupKey))
  }
}

/** The shared lookup-join builder — the single piece of plan-building
  * consumed by BOTH TrainingSet.loadDf (J3) and Scorer.scoreBatch (J4),
  * so train/serve join parity holds by construction (the reference
  * guarantees the same property by packaging lookup metadata with the
  * model, FS:266, FS:294-300, FS:342-349).
  *
  * Plan shape per referenced feature table: prune the feature table to
  * `keys + requested features` BEFORE the join (column pruning the
  * Feature Store client also performs, SURVEY.md §4), then LEFT OUTER
  * equi-join onto the spine — left-outer, not inner, so spine rows
  * without a feature row survive with NULL features: the feature-store
  * lookup contract. Spine rows are never duplicated as long as feature
  * tables are unique per key (the store's merge upsert maintains that).
  *
  * Scale: each join shuffles on the lookup key unless Catalyst
  * broadcasts the pruned feature side; at 100 TB, writing the feature
  * tables partitioned/bucketed by key keeps this a co-partitioned join.
  */
object LookupJoins {
  def attach(store: FeatureStore, spine: DataFrame, lookups: Seq[FeatureLookup]): DataFrame = {
    // Preserve first-appearance order of (table, lookupKey) groups.
    val grouped = lookups.groupBy(l => (l.table, l.lookupKey)).toSeq
      .sortBy { case ((t, k), _) => lookups.indexWhere(l => l.table == t && l.lookupKey == k) }

    grouped.foldLeft(spine) { case (acc, ((table, lookupKey), ls)) =>
      val spec = store.getSpec(table)
      require(spec.keys.size == lookupKey.size,
        s"lookup into $table: ${lookupKey.size} lookup key(s) for ${spec.keys.size} table key(s)")
      val features = ls.map(_.feature).distinct
      val unknown = features.filterNot(spec.schema.fieldNames.contains)
      require(unknown.isEmpty,
        s"lookup into $table: unknown feature column(s) ${unknown.mkString(", ")}")
      val keyClash = features.filter(lookupKey.contains)
      require(keyClash.isEmpty,
        s"lookup into $table: feature column(s) ${keyClash.mkString(", ")} collide with lookup key names")
      // also fail fast on collisions with the spine / features already
      // attached from earlier tables — the join would otherwise succeed
      // with duplicate column names and blow up downstream with
      // AMBIGUOUS_REFERENCE (or drop() removing both copies)
      val accClash = features.filter(acc.columns.contains)
      require(accClash.isEmpty,
        s"lookup into $table: feature column(s) ${accClash.mkString(", ")} already exist on the spine/earlier lookups")

      // Prune and rename table keys to the spine's lookup-key names in a
      // SINGLE aliased select (sequential withColumnRenamed corrupts the
      // frame when key names swap — a→b then b→a renames both columns).
      val pruned = store.readTable(table).select(
        spec.keys.zip(lookupKey).map { case (tk, sk) => col(tk).as(sk) } ++
          features.map(col): _*)
      acc.join(pruned, lookupKey, "left_outer")
    }
  }
}
