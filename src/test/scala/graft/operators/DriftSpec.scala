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
}
