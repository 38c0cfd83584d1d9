package graft.fs

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class PointInTimeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest feature at-or-before spine ts, NULL before first") {
    val features = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-03 00:00:00"), 30.0),
      (2L, ts("2024-01-02 00:00:00"), 99.0))
      .toDF("user_id", "fts", "score")
    val spine = Seq(
      (100L, 1L, ts("2024-01-02 12:00:00")),  // between v1 and v2 → 10.0
      (101L, 1L, ts("2024-01-03 00:00:00")),  // exactly at v2 → inclusive → 30.0
      (102L, 1L, ts("2024-01-04 00:00:00")),  // after all → 30.0
      (103L, 2L, ts("2024-01-01 00:00:00")),  // before first → NULL
      (104L, 3L, ts("2024-01-05 00:00:00")))  // unknown key → NULL
      .toDF("event_id", "user_id", "sts")

    val got = PointInTime.asOfJoin(spine, features,
      keys = Seq("user_id"), spineTs = "sts", featTs = "fts",
      featureCols = Seq("score"))
      .orderBy("event_id")
      .select("event_id", "user_id", "score")
      .collect().toSeq

    assert(got == Seq(
      Row(100L, 1L, 10.0),
      Row(101L, 1L, 30.0),
      Row(102L, 1L, 30.0),
      Row(103L, 2L, null),
      Row(104L, 3L, null)))
  }

  test("asOfJoinForward: earliest feature at-or-after spine ts, NULL after last") {
    val features = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-03 00:00:00"), 30.0),
      (2L, ts("2024-01-02 00:00:00"), 99.0))
      .toDF("user_id", "fts", "score")
    val spine = Seq(
      (100L, 1L, ts("2024-01-02 12:00:00")),  // next is v2 → 30.0
      (101L, 1L, ts("2024-01-03 00:00:00")),  // exactly at v2 → inclusive → 30.0
      (102L, 1L, ts("2024-01-04 00:00:00")),  // after all → NULL
      (103L, 2L, ts("2024-01-01 00:00:00")),  // before first → 99.0
      (104L, 3L, ts("2024-01-05 00:00:00")))  // unknown key → NULL
      .toDF("event_id", "user_id", "sts")

    val got = PointInTime.asOfJoinForward(spine, features,
      keys = Seq("user_id"), spineTs = "sts", featTs = "fts",
      featureCols = Seq("score"))
      .orderBy("event_id")
      .select("event_id", "user_id", "score")
      .collect().toSeq

    assert(got == Seq(
      Row(100L, 1L, 30.0),
      Row(101L, 1L, 30.0),
      Row(102L, 1L, null),
      Row(103L, 2L, 99.0),
      Row(104L, 3L, null)))
  }

  test("asOfJoin: a NULL latest feature value is returned, not skipped") {
    // (1, t2) legitimately clears the feature to NULL; a probe after t2
    // must see NULL (the latest row), NOT the stale 5.0 from t1 —
    // matching SQL ASOF JOIN semantics
    val features = Seq[(Long, java.sql.Timestamp, java.lang.Double)](
      (1L, ts("2024-01-01 00:00:00"), 5.0),
      (1L, ts("2024-01-02 00:00:00"), null))
      .toDF("user_id", "fts", "score")
    val spine = Seq((9L, 1L, ts("2024-01-03 00:00:00")))
      .toDF("event_id", "user_id", "sts")
    val got = PointInTime.asOfJoin(spine, features, Seq("user_id"), "sts", "fts",
      Seq("score")).select("score").collect()(0)
    assert(got.isNullAt(0), s"expected NULL latest value, got $got")
  }

  test("asOfJoin: swapped composite names via single-select rename (LookupJoins analog)") {
    val store = FeatureStore.temp(spark)
    val feat = Seq((1L, 2L, 7.0)).toDF("a", "b", "f")
    store.createTable(FeatureTableSpec("t", Seq("a", "b"), feat.schema))
    store.writeTable("t", feat, WriteMode.Overwrite)
    // spine columns named (b, a) map POSITIONALLY to table keys (a, b):
    // spine.b carries table.a values, spine.a carries table.b values
    val spine = Seq((1L, 2L, "x")).toDF("b", "a", "v")
    val out = LookupJoins.attach(store, spine,
      Seq(FeatureLookup("t", "f", Seq("b", "a"))))
    assert(out.columns.toSeq == Seq("b", "a", "v", "f"))
    assert(out.collect().toSeq == Seq(Row(1L, 2L, "x", 7.0)))
  }

  test("createTrainingSet with timestamp key: store-registered time-series table") {
    val store = FeatureStore.temp(spark)
    val features = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-02 00:00:00"), 2.0))
      .toDF("user_id", "fts", "v")
    store.createTable(FeatureTableSpec("ts_feat", Seq("user_id", "fts"), features.schema,
      "time-versioned"))
    store.writeTable("ts_feat", features, WriteMode.Overwrite)
    val spine = Seq((7L, 1L, ts("2024-01-01 12:00:00"), true))
      .toDF("event_id", "user_id", "sts", "label")
    val got = PointInTime.createTrainingSet(store, spine, "ts_feat",
      featureCols = Seq("v"), spineTs = "sts", featTs = "fts",
      label = Some("label"), excludeColumns = Seq("event_id"))
    assert(got.columns.toSeq == Seq("user_id", "sts", "label", "v"))
    assert(got.collect().toSeq == Seq(Row(1L, ts("2024-01-01 12:00:00"), true, 1.0)))
  }

  test("asOfJoinNearest: closest version either direction, ties backward") {
    val features = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-03 00:00:00"), 30.0),
      (2L, ts("2024-01-02 00:00:00"), 99.0))
      .toDF("user_id", "fts", "score")
    val spine = Seq(
      (100L, 1L, ts("2024-01-01 06:00:00")),  // 6h back vs 42h fwd → 10.0
      (101L, 1L, ts("2024-01-02 18:00:00")),  // 42h back vs 6h fwd → 30.0
      (102L, 1L, ts("2024-01-02 00:00:00")),  // 24h both → tie → backward 10.0
      (103L, 1L, ts("2024-01-03 00:00:00")),  // exact hit → 30.0
      (104L, 2L, ts("2023-12-01 00:00:00")),  // only a future version → 99.0
      (105L, 1L, ts("2024-01-09 00:00:00")),  // only past versions → 30.0
      (106L, 3L, ts("2024-01-05 00:00:00")))  // unknown key → NULL
      .toDF("event_id", "user_id", "sts")

    val got = PointInTime.asOfJoinNearest(spine, features,
      keys = Seq("user_id"), spineTs = "sts", featTs = "fts",
      featureCols = Seq("score"))
      .orderBy("event_id")
      .select("event_id", "user_id", "score")
      .collect().toSeq

    assert(got == Seq(
      Row(100L, 1L, 10.0),
      Row(101L, 1L, 30.0),
      Row(102L, 1L, 10.0),
      Row(103L, 1L, 30.0),
      Row(104L, 2L, 99.0),
      Row(105L, 1L, 30.0),
      Row(106L, 3L, null)))
  }

  test("asOfJoinWithTtl: boundary-inclusive staleness, expired and missing matches go NULL") {
    val features = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, ts("2024-01-01 00:00:00"), 20.0),
      (3L, ts("2024-01-05 00:00:00"), 30.0))
      .toDF("user_id", "fts", "score")
    val day = 86400000000L
    val spine = Seq(
      (100L, 1L, ts("2024-01-03 00:00:00")), // staleness = 2d = ttl → kept
      (101L, 2L, ts("2024-01-03 00:00:01")), // 1s past the ttl → NULL
      (102L, 3L, ts("2024-01-05 00:00:00")), // exact hit, staleness 0 → kept
      (103L, 4L, ts("2024-01-03 00:00:00"))) // no feature at all → NULL
      .toDF("event_id", "user_id", "sts")
    val got = PointInTime.asOfJoinWithTtl(spine, features,
        keys = Seq("user_id"), spineTs = "sts", featTs = "fts",
        featureCols = Seq("score"), maxStalenessMicros = 2L * day)
      .orderBy("event_id").select("event_id", "score").collect().toSeq
    assert(got == Seq(Row(100L, 10.0), Row(101L, null),
      Row(102L, 30.0), Row(103L, null)))
    // ttl = 0: only exact-timestamp hits survive
    val zero = PointInTime.asOfJoinWithTtl(spine, features,
        keys = Seq("user_id"), spineTs = "sts", featTs = "fts",
        featureCols = Seq("score"), maxStalenessMicros = 0L)
      .orderBy("event_id").select("event_id", "score").collect().toSeq
    assert(zero == Seq(Row(100L, null), Row(101L, null),
      Row(102L, 30.0), Row(103L, null)))
  }

  test("asOfJoinNearest: NULL-ts feature rows never match (no phantom nearest)") {
    val features = Seq(
      (1L, Option(ts("2024-01-01 00:00:00")), 10.0),
      (2L, Option.empty[java.sql.Timestamp], 77.0)) // ts-less row: must be inert
      .toDF("user_id", "fts", "score")
    val spine = Seq(
      (100L, 1L, ts("2024-01-02 00:00:00")), // real candidate → 10.0
      (101L, 2L, ts("2024-01-02 00:00:00"))) // ONLY a NULL-ts row → no match
      .toDF("event_id", "user_id", "sts")
    val got = PointInTime.asOfJoinNearest(spine, features,
      keys = Seq("user_id"), spineTs = "sts", featTs = "fts",
      featureCols = Seq("score"))
      .orderBy("event_id").select("event_id", "score").collect().toSeq
    assert(got == Seq(Row(100L, 10.0), Row(101L, null)))
  }

  test("asOfJoin: NULL-ts feature rows never match") {
    val features = Seq(
      (2L, Option.empty[java.sql.Timestamp], 77.0))
      .toDF("user_id", "fts", "score")
    val spine = Seq((101L, 2L, ts("2024-01-02 00:00:00")))
      .toDF("event_id", "user_id", "sts")
    val got = PointInTime.asOfJoin(spine, features,
      keys = Seq("user_id"), spineTs = "sts", featTs = "fts",
      featureCols = Seq("score"))
      .select("event_id", "score").collect().toSeq
    assert(got == Seq(Row(101L, null)))
  }

  test("asOfJoinNearest: equal-(key, ts) feature duplicates resolve deterministically") {
    // two feature rows at the SAME (key, ts) — without a content
    // tie-break the winner depends on shuffle order; with it, repeated
    // runs (and repartitionings) must agree
    val features = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:00:00"), 20.0))
      .toDF("user_id", "fts", "score")
    val spine = Seq((100L, 1L, ts("2024-01-02 00:00:00")))
      .toDF("event_id", "user_id", "sts")
    def run(feats: org.apache.spark.sql.DataFrame): Double =
      PointInTime.asOfJoinNearest(spine, feats,
        keys = Seq("user_id"), spineTs = "sts", featTs = "fts",
        featureCols = Seq("score")).select("score").collect().head.getDouble(0)
    val results = (1 to 3).map(i => run(features.repartition(i))) :+
      run(features.orderBy(col("score").desc))
    assert(results.distinct.size == 1,
      s"tie must be deterministic across physical orders, got $results")
  }

  test("NULL-ts spine probes take NULL features in every as-of mode") {
    // a probe with no time position must keep its spine columns and
    // take NULL features — forward mode's descending sort (NULLS LAST)
    // and nearest's NULLS-FIRST would otherwise hand it the earliest
    // feature row
    val features = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-03 00:00:00"), 30.0))
      .toDF("user_id", "fts", "score")
    val spine = Seq(
      (100L, 1L, Option(ts("2024-01-02 00:00:00"))),
      (101L, 1L, Option.empty[Timestamp]))
      .toDF("event_id", "user_id", "sts")
    def scores(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.orderBy("event_id").select("score").collect().toSeq.map(_.get(0))
    assert(scores(PointInTime.asOfJoin(spine, features,
      Seq("user_id"), "sts", "fts", Seq("score"))) == Seq(10.0, null))
    assert(scores(PointInTime.asOfJoinForward(spine, features,
      Seq("user_id"), "sts", "fts", Seq("score"))) == Seq(30.0, null))
    assert(scores(PointInTime.asOfJoinNearest(spine, features,
      Seq("user_id"), "sts", "fts", Seq("score"))) == Seq(10.0, null))
    assert(scores(PointInTime.asOfJoinWithTtl(spine, features,
      Seq("user_id"), "sts", "fts", Seq("score"),
      maxStalenessMicros = 10L * 86400000000L)) == Seq(10.0, null))
  }

  test("asOfJoinNearest: one Exchange — both directions share the window sort") {
    val features = Seq((1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "fts", "score")
    val spine = Seq((7L, 1L, ts("2024-01-02 00:00:00")))
      .toDF("event_id", "user_id", "sts")
    val plan = PointInTime.asOfJoinNearest(spine, features, Seq("user_id"),
      "sts", "fts", Seq("score")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }
}
