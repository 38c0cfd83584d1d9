package graft.operators

import graft.SparkSpec

/** Categorical drift: hand-computed terms, one-sided categories, and
  * the zero-drift identity.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("categoricalDrift: hand-computed terms incl. one-sided category") {
    // snapshot A: x=3, y=1 (total 4); snapshot B: x=2, z=2 (total 4)
    val a = Seq(("x", 3L), ("y", 1L)).toDF("cat", "n")
    val b = Seq(("x", 2L), ("z", 2L)).toDF("cat", "n")
    val got = Drift.categoricalDrift(a, b, "cat", "n")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def term(p: Double, q: Double): Long =
      math.floor(((p - q) * (p - q)) / ((p + q) / 2.0) * 1e12 + 0.5).toLong
    assert(got("x") === ((3L, 2L, term(0.75, 0.5))))
    assert(got("y") === ((1L, 0L, term(0.25, 0.0))))   // one-sided: defined
    assert(got("z") === ((0L, 2L, term(0.0, 0.5))))
    // one-sided category's term is 2·p quantized (the (p+q)/2 design)
    assert(got("y")._3 === math.floor(2.0 * 0.25 * 1e12 + 0.5).toLong)
  }

  test("empty snapshot errors instead of emitting NULL drift") {
    val a = Seq(("x", 5L)).toDF("cat", "n")
    val empty = Seq.empty[(String, Long)].toDF("cat", "n")
    val e = intercept[Exception] {
      Drift.categoricalDrift(a, empty, "cat", "n").collect()
    }
    assert(e.getMessage.contains("drift undefined")
      || Option(e.getCause).exists(_.getMessage.contains("drift undefined")))
  }

  test("identical snapshots drift to exactly zero") {
    val a = Seq(("x", 5L), ("y", 7L)).toDF("cat", "n")
    val got = Drift.categoricalDrift(a, a, "cat", "n")
      .collect().map(_.getLong(3))
    assert(got.forall(_ === 0L))
  }

  test("numericDrift: frozen base edges, hand-computed terms, zero identity") {
    import org.apache.spark.sql.functions.col
    // base 1..8 → interpolated quartile edges [2.75, 4.5, 6.25], so
    // base bins hold exactly two values each (p = 0.25 per bin)
    val base = (1 to 8).map(_.toDouble).toDF("v")
    // current: mass concentrated at/above base's top edge — the shift
    // the FROZEN edges must expose (re-fit edges would re-balance it)
    val cur = Seq(6.0, 7.0, 9.0, 100.0).toDF("v")
    val got = Drift.numericDrift(base, cur, "v", nBins = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    def term(p: Double, q: Double): Long =
      math.floor(((p - q) * (p - q)) / ((p + q) / 2.0) * 1e12 + 0.5).toLong
    // bin = #edges <= v: current 6→2, 7/9/100→3
    assert(got(0) === ((2L, 0L, term(0.25, 0.0))))
    assert(got(1) === ((2L, 0L, term(0.25, 0.0))))
    assert(got(2) === ((2L, 1L, term(0.25, 0.25))))
    assert(got(2)._3 === 0L, "matching mass in a bin drifts zero")
    assert(got(3) === ((2L, 3L, term(0.25, 0.75))), "current mass in the top bin")
    // identical snapshots drift to exactly zero in every bin
    val zero = Drift.numericDrift(base, base, "v", nBins = 4)
      .select(col("drift_q")).collect().map(_.getLong(0))
    assert(zero.length === 4 && zero.forall(_ === 0L))
  }

  test("numericDriftApprox: zero identity, tail shift surfaces, accuracy guard") {
    import org.apache.spark.sql.functions.col
    val base = (1 to 200).map(_.toDouble).toDF("v")
    // identical snapshots → all-zero drift under ANY edge set — the
    // identity that survives sketch-specific edges
    val zero = Drift.numericDriftApprox(base, base, "v", nBins = 4, accuracy = 1000)
      .select(col("drift_q")).collect().map(_.getLong(0))
    assert(zero.length === 4 && zero.forall(_ === 0L))
    // all current mass beyond base's max → the top bin must carry
    // large drift (bin 3 gets q=1.0 vs p=0.25)
    val cur = Seq(500.0, 600.0, 700.0).toDF("v")
    val shifted = Drift.numericDriftApprox(base, cur, "v", nBins = 4, accuracy = 1000)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(shifted(3) > shifted.getOrElse(0, 0L))
    assert(shifted(3) > 0L)
    intercept[IllegalArgumentException](
      Drift.numericDriftApprox(base, cur, "v", nBins = 10, accuracy = 50))
  }

  test("embeddingDrift: zero on identical snapshots, exact on a hand-computed shift, one-sided labels excluded") {
    import spark.implicits._
    val base = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (2L, Array(0.0f, 1.0f), "a"),
      (3L, Array(0.5f, 0.5f), "b"),
      (4L, Array(0.0f, 0.0f), "gone")) // label absent from current
      .toDF("vec_id", "embedding", "label")
    val same = Drift.embeddingDrift(base, base, "label", "embedding")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(same == Map("a" -> 0L, "b" -> 0L, "gone" -> 0L))
    // current shifts label a's centroid by +0.5 in dim 1:
    // quantized mean diff = 500000 → term 2.5e11; dim 2 unchanged
    val cur = Seq(
      (11L, Array(1.5f, 0.0f), "a"),
      (12L, Array(0.5f, 1.0f), "a"),
      (13L, Array(0.5f, 0.5f), "b"))
      .toDF("vec_id", "embedding", "label")
    val got = Drift.embeddingDrift(base, cur, "label", "embedding")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 2L, 250000000000L), ("b", 1L, 1L, 0L)),
      s"got $got") // 'gone' has no current centroid → excluded
  }

  test("embeddingDrift: ragged dims and oversized mean deltas are named errors") {
    def msg(e: Exception): String =
      e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    // ragged: label 'a' has a 2-dim and a 1-dim vector in the base
    val ragged = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (2L, Array(1.0f), "a"))
      .toDF("vec_id", "embedding", "label")
    val ok = Seq((9L, Array(1.0f, 0.0f), "a")).toDF("vec_id", "embedding", "label")
    val e1 = intercept[Exception] {
      Drift.embeddingDrift(ragged, ok, "label", "embedding").collect()
    }
    assert(msg(e1).contains("ragged"), msg(e1))
    // a quantized mean delta past ~3e9 (raw gap 2e4 here) would
    // overflow the exact-BIGINT term — named error, not a wrapped sum
    val far1 = Seq((1L, Array(10000.0f), "a")).toDF("vec_id", "embedding", "label")
    val far2 = Seq((2L, Array(-10000.0f), "a")).toDF("vec_id", "embedding", "label")
    val e2 = intercept[Exception] {
      Drift.embeddingDrift(far1, far2, "label", "embedding").collect()
    }
    assert(msg(e2).contains("exceeds"), msg(e2))
  }

  test("temporalSpikes: planted spike scores, warm-up days stay NULL") {
    import spark.implicits._
    def t(day: Int, k: Int) = (1 to k).map(_ =>
      ("click", java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")))
    // 3 steady days of 4, then a day of 12 → spike = 12·3·1e6/12 = 3e6
    val events = (t(1, 4) ++ t(2, 4) ++ t(3, 4) ++ t(4, 12))
      .toDF("event_type", "ts")
    val got = Drift.temporalSpikes(events, "ts", "event_type", window = 3)
      .orderBy("day_us").collect()
      .map(r => (r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq === Seq(
      (4L, None), (4L, None), (4L, None), // warm-up: no full baseline
      (12L, Some(3000000L))))             // 3× baseline
    // a flat continuation scores exactly 1e6
    val flat = (t(1, 5) ++ t(2, 5) ++ t(3, 5) ++ t(4, 5))
      .toDF("event_type", "ts")
    val g2 = Drift.temporalSpikes(flat, "ts", "event_type", window = 3)
      .orderBy("day_us").collect()
    assert(g2.last.getLong(4) === 1000000L)
    intercept[IllegalArgumentException](
      Drift.temporalSpikes(events, "ts", "event_type", window = 0))
  }
}
