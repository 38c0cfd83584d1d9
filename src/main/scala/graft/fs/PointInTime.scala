package graft.fs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) feature lookup — the Feature Store capability
  * the public Databricks API exposes as `timestamp_lookup_key` on
  * time-series feature tables: for each spine row (key, t), attach the
  * LATEST feature row with the same key and feature-ts ≤ t. The
  * reference notebook stays batch/latest-only, so this is the natural
  * completion of its training-set surface (SURVEY.md §1.1 TrainingSet;
  * J3) for time-versioned features.
  *
  * Spark has no ASOF JOIN operator, so per the preference order
  * (SURVEY.md build brief) it is COMPOSED from built-ins: union the
  * spine probes and the feature rows tagged by origin, then one window
  * pass per key ordered by (ts, origin) taking last-non-null feature
  * values — a single shuffle on the key, no range join, no O(spine ×
  * feature-versions) blowup. Ties (feature ts == spine ts) resolve to
  * the feature row (feature sorts before probe at equal ts), matching
  * "value as of and including t".
  *
  * Scale: one shuffle + one sort per lookup table — the same cost
  * profile as the equi lookup join; state never exceeds a partition.
  *
  * Note one divergence from the streaming analog
  * (`graft.streaming.StreamingPit.asOfJoin`): this batch operator
  * always returns the stale-but-correct feature value no matter how
  * far the probe trails the newest version, while the streaming
  * operator retires probe-quiescent keys after `featureRetention`
  * (default 7 days) and answers None past it — pass
  * `featureRetention = "forever"` there for exact batch parity.
  */
object PointInTime {

  /** As-of join `spine ⟕ features` on `keys` with `spineTs`/`featTs`
    * timestamps. `featureCols` are attached (last value ≤ spine ts,
    * NULL if none).
    */
  def asOfJoin(
      spine: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      spineTs: String,
      featTs: String,
      featureCols: Seq[String]): DataFrame =
    asOfImpl(spine, features, keys, spineTs, featTs, featureCols, backward = true)

  /** Backward as-of join with a FEATURE TTL (max staleness): the match
    * additionally requires `spineTs − featTs ≤ maxStalenessMicros`, so
    * a probe trailing the newest version by more than the TTL gets
    * NULLs instead of an arbitrarily stale value — the "features
    * expire" semantic time-series feature stores expose (serving a
    * week-old engagement score is often worse than serving none). Same
    * one-shuffle union+window plan: the matched feature ts rides in
    * the carried struct, and the TTL check is a projection-stage
    * comparison on epoch micros — no second join, no extra shuffle.
    * Timestamp-typed ts columns only.
    */
  def asOfJoinWithTtl(
      spine: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      spineTs: String,
      featTs: String,
      featureCols: Seq[String],
      maxStalenessMicros: Long): DataFrame = {
    require(maxStalenessMicros >= 0,
      s"asOfJoinWithTtl: maxStalenessMicros must be >= 0, got $maxStalenessMicros")
    asOfImpl(spine, features, keys, spineTs, featTs, featureCols,
      backward = true, maxStalenessMicros = Some(maxStalenessMicros))
  }

  /** Forward as-of join: for each spine row, the EARLIEST feature row
    * with feature-ts ≥ spine ts (ties inclusive) — label attachment
    * ("first outcome at-or-after t"), the mirror of the backward
    * feature lookup. Same union+window construction with time order
    * reversed; identical one-shuffle cost profile.
    */
  def asOfJoinForward(
      spine: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      spineTs: String,
      featTs: String,
      featureCols: Seq[String]): DataFrame =
    asOfImpl(spine, features, keys, spineTs, featTs, featureCols, backward = false)

  /** Nearest as-of join: for each spine row, the feature row whose ts
    * is CLOSEST to the spine ts in either direction — equal distance
    * resolves backward (the stale-but-seen value, never the future
    * one). Sensor alignment / "snap each probe to the nearest
    * snapshot" semantics, completing the backward/forward pair.
    *
    * Same one-shuffle construction as [[asOfJoin]], but BOTH candidates
    * come out of a single union + single window partition: the
    * backward candidate is `last(feature row)` over the preceding
    * frame, the forward candidate `first(feature row)` over the
    * following frame — one Exchange, one sort, two frame scans; no
    * second join, no spine-row id bookkeeping. The matched feature ts
    * rides inside the candidate struct, so distance comparison works
    * for numeric and timestamp ts alike (timestamp differences compare
    * as intervals). A feature at exactly the spine ts sorts into the
    * preceding frame (origin 0 < 1) and wins at distance zero.
    */
  def asOfJoinNearest(
      spine: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      spineTs: String,
      featTs: String,
      featureCols: Seq[String]): DataFrame = {
    val spineCols = spine.columns.toSeq
    val probes = spine
      .withColumn("_ts", col(spineTs))
      .withColumn("_origin", lit(1))
      .select((keys.map(col) :+ col("_ts") :+ col("_origin")) ++
        spineCols.filterNot(keys.contains).map(c => col(c).as(s"_s_$c")) ++
        featureCols.map(c => lit(null).cast(features.schema(c).dataType).as(s"_f_$c")): _*)
    val feats = features
      // a NULL-ts feature row cannot be "nearest" to anything: it
      // would sort first (NULLS FIRST) and leak out as a match with a
      // NULL matched ts whenever no real candidate exists
      .filter(col(featTs).isNotNull)
      .withColumn("_ts", col(featTs))
      .withColumn("_origin", lit(0))
      .select((keys.map(col) :+ col("_ts") :+ col("_origin")) ++
        spineCols.filterNot(keys.contains).map(c =>
          lit(null).cast(spine.schema(c).dataType).as(s"_s_$c")) ++
        featureCols.map(c => col(s"$c").as(s"_f_$c")): _*)

    // Equal-(key, ts) feature rows would otherwise tie
    // nondeterministically in last()/first() (intra-ts order is
    // unspecified after a shuffle) — a content hash as the final sort
    // key pins the winner run-to-run.
    val tie = if (featureCols.isEmpty) lit(0L)
      else xxhash64(featureCols.map(c => col(s"_f_$c")): _*)
    val part = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_origin").asc, tie.asc)
    val wBack = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val featRow = when(col("_origin") === 0,
      struct((col("_ts").as("_ft") +:
        featureCols.map(c => col(s"_f_$c").as(c))): _*))

    val back = last(featRow, ignoreNulls = true).over(wBack)
    val fwd = first(featRow, ignoreNulls = true).over(wFwd)
    val chosen = when(col("_b").isNull, col("_w"))
      .when(col("_w").isNull, col("_b"))
      .when(col("_ts") - col("_b").getField("_ft") <=
        col("_w").getField("_ft") - col("_ts"), col("_b"))
      .otherwise(col("_w"))

    probes.unionByName(feats)
      .select((keys.map(col) :+ col("_ts") :+ col("_origin")) ++
        spineCols.filterNot(keys.contains).map(c => col(s"_s_$c")) :+
        back.as("_b") :+ fwd.as("_w"): _*)
      .filter(col("_origin") === 1)
      .withColumn("_n", chosen)
      .select(keys.map(col) ++
        Seq(col("_ts").as(spineTs)) ++
        spineCols.filterNot(c => keys.contains(c) || c == spineTs)
          .map(c => col(s"_s_$c").as(c)) ++
        // NULL-ts probes sort NULLS-FIRST and would take the earliest
        // feature as "nearest" — no time position, no match (the same
        // convention as the NULL-ts feature filter)
        featureCols.map(c =>
          when(col("_ts").isNotNull, col("_n").getField(c)).as(c)): _*)
  }

  private def asOfImpl(
      spine: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      spineTs: String,
      featTs: String,
      featureCols: Seq[String],
      backward: Boolean,
      maxStalenessMicros: Option[Long] = None): DataFrame = {

    val spineCols = spine.columns.toSeq
    // tag: 0 = feature row (sorts first at equal ts), 1 = spine probe
    val probes = spine
      .withColumn("_ts", col(spineTs))
      .withColumn("_origin", lit(1))
      .select((keys.map(col) :+ col("_ts") :+ col("_origin")) ++
        spineCols.filterNot(keys.contains).map(c => col(c).as(s"_s_$c")) ++
        featureCols.map(c => lit(null).cast(features.schema(c).dataType).as(s"_f_$c")): _*)
    val feats = features
      // same convention as [[asOfJoinNearest]]: a NULL-ts feature row
      // has no position on the time axis and must not match any probe
      .filter(col(featTs).isNotNull)
      .withColumn("_ts", col(featTs))
      .withColumn("_origin", lit(0))
      .select((keys.map(col) :+ col("_ts") :+ col("_origin")) ++
        spineCols.filterNot(keys.contains).map(c =>
          lit(null).cast(spine.schema(c).dataType).as(s"_s_$c")) ++
        featureCols.map(c => col(c).as(s"_f_$c")): _*)

    // backward: scan time ascending, keep the last feature row seen.
    // forward: scan time DEscending — "last seen" is then the earliest
    // feature with ts ≥ probe ts. Either way the feature sorts before
    // the probe at equal _ts (origin 0 < 1), making the bound inclusive.
    val tsOrder = if (backward) col("_ts").asc else col("_ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_origin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry the latest feature ROW as one struct, then extract fields:
    // last(value, ignoreNulls) per column would skip over a feature row
    // whose value is legitimately NULL (a cleared feature) and return a
    // STALE older value — the struct is non-null whenever a feature row
    // exists, so as-of semantics match the SQL ASOF JOIN exactly.
    // the matched feature ts rides in the struct (as in asOfJoinNearest)
    // so a TTL bound can compare it against the probe ts in projection
    val featRow = when(col("_origin") === 0,
      struct((col("_ts").as("_ft") +:
        featureCols.map(c => col(s"_f_$c").as(c))): _*))

    // within TTL (or no TTL): NULL-safe — a missing match (_frow NULL)
    // makes the comparison NULL, and the when() below falls through to
    // the NULL branch either way
    val fresh = maxStalenessMicros match {
      case None => lit(true)
      case Some(m) =>
        unix_micros(col("_ts").cast("timestamp")) -
          unix_micros(col("_frow").getField("_ft").cast("timestamp")) <= m
    }

    probes.unionByName(feats)
      .select((keys.map(col) :+ col("_ts") :+ col("_origin")) ++
        spineCols.filterNot(keys.contains).map(c => col(s"_s_$c")) :+
        last(featRow, ignoreNulls = true).over(w).as("_frow"): _*)
      .filter(col("_origin") === 1) // keep spine probes only
      .select(keys.map(col) ++
        Seq(col("_ts").as(spineTs)) ++
        spineCols.filterNot(c => keys.contains(c) || c == spineTs)
          .map(c => col(s"_s_$c").as(c)) ++
        // the _ts guard mirrors the NULL-ts feature filter above: a
        // NULL-ts PROBE has no position on the time axis either, so it
        // keeps its spine columns and takes NULL features — without
        // it, forward mode's descending sort puts NULL probes after
        // every feature row and they'd match the earliest feature
        featureCols.map(c =>
          when(col("_ts").isNotNull && fresh, col("_frow").getField(c))
            .otherwise(lit(null).cast(features.schema(c).dataType)).as(c)): _*)
  }

  /** Training-set assembly with a timestamp lookup key: the J3 lookup
    * join, but point-in-time-correct against a time-versioned feature
    * table (no feature leakage from the future).
    */
  def createTrainingSet(
      store: FeatureStore,
      spine: DataFrame,
      table: String,
      featureCols: Seq[String],
      spineTs: String,
      featTs: String,
      label: Option[String] = None,
      excludeColumns: Seq[String] = Nil): DataFrame = {
    val spec = store.getSpec(table)
    val features = store.readTable(table)
    val joined = asOfJoin(spine, features, spec.keys.filterNot(_ == featTs),
      spineTs, featTs, featureCols)
    joined.drop(excludeColumns.filterNot(label.contains): _*)
  }
}
