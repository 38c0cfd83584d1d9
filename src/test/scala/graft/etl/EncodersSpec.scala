package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EncodersSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncodeLoo: hand-computed values, own label excluded") {
    // cats: a -> labels (1, 0); b -> (1); prior = 2/3, m = 1
    val df = Seq(("r1", "a", true), ("r2", "a", false), ("r3", "b", true))
      .toDF("id", "cat", "churn")
    val enc = Encoders.targetEncodeLoo(df, "cat", col("churn"), "enc",
        smoothing = 1.0)
      .select("id", "enc").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val prior = 2.0 / 3.0
    // cat a: n_g=2, s_g=1. r1 (label 1): (1-1 + 1*prior) / (2-1+1);
    // r2 (label 0): (1-0 + prior) / 2
    assert(math.abs(enc("r1") - prior / 2.0) < 1e-15)
    assert(math.abs(enc("r2") - (1 + prior) / 2.0) < 1e-15)
    // r3 singleton: (1-1 + prior) / (1-1+1) = prior exactly
    assert(enc("r3") == prior)
  }

  test("targetEncodeLoo: rows in the same category with equal labels encode equally") {
    val df = Seq(("a", true), ("a", true), ("a", false), ("b", false))
      .toDF("cat", "churn")
    val enc = Encoders.targetEncodeLoo(df, "cat", col("churn"), "enc")
      .select("cat", "churn", "enc").collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getDouble(2))
    val byKey = enc.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byKey(("a", true)).size == 1)
    // within a category, a positive row must encode LOWER than a
    // negative one (its own 1 is removed from the numerator)
    assert(byKey(("a", true)).head < byKey(("a", false)).head)
  }

  test("targetEncodeLoo: NULL category is a category — rows survive and encode against the NULL group") {
    // a plain inner equi join would drop the two NULL-category rows
    val df = Seq(("r1", Some("a"), true), ("r2", Some("a"), false),
      ("r3", None, true), ("r4", None, true))
      .toDF("id", "cat", "churn")
    val enc = Encoders.targetEncodeLoo(df, "cat", col("churn"), "enc",
        smoothing = 1.0)
      .select("id", "enc").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(enc.size == 4, "no rows may vanish")
    // NULL group: n_g=2, s_g=2, prior=3/4; both rows label 1:
    // (2-1 + 1*0.75) / (2-1+1) = 1.75/2
    assert(math.abs(enc("r3") - 1.75 / 2.0) < 1e-15)
    assert(enc("r3") == enc("r4"))
  }

  test("robustScale: median maps to 0, quartiles to ±1/1") {
    // 1..9: q1=3, med=5, q3=7, iqr=4
    val df = (1 to 9).map(_.toDouble).toDF("v")
    val s = Encoders.robustScale(df, "v", "z")
      .orderBy("v").collect().map(_.getDouble(1))
    assert(s(4) == 0.0)          // 5 -> 0
    assert(s(2) == -0.5 && s(6) == 0.5) // 3 -> -0.5, 7 -> +0.5
    assert(s(0) == -1.0 && s(8) == 1.0) // ends at ±1 for uniform data
  }

  test("robustScale: zero IQR scales to NaN (no mid-job ANSI throw)") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val s = Encoders.robustScale(df, "v", "z").select("z")
      .collect().map(_.getDouble(0))
    assert(s.forall(_.isNaN))
  }

  test("winsorize: per-group clamp at exact percentile bounds, rows kept") {
    // group a: 1..11 → p10 = 2.0, p90 = 10.0 (exact interp on 11 pts);
    // group b untouched band
    val rows = (1 to 11).map(i => ("a", i.toDouble)) ++
      Seq(("b", 100.0), ("b", 200.0), ("b", 300.0))
    val df = rows.toDF("g", "v")
    val got = Encoders.winsorize(df, "g", "v", "w", lo = 0.1, hi = 0.9)
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got.size == rows.size, "winsorize must keep every row")
    val a = got.filter(_._1 == "a").map(_._3)
    assert(a.head == 2.0 && a(1) == 2.0)       // 1, 2 clamp up to p10
    assert(a.last == 10.0 && a(a.size - 2) == 10.0) // 10, 11 clamp down
    assert(a(5) == 6.0)                        // interior untouched
    val b = got.filter(_._1 == "b").map(_._3)
    assert(b.head == 120.0 && b.last == 280.0) // 3-pt group interp bounds
    assert(b(1) == 200.0)
  }

  test("winsorize: NULL values pass through as NULL") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None)).toDF("g", "v")
    val got = Encoders.winsorize(df, "g", "v", "w")
    assert(got.filter(col("w").isNull).count() == 1)
    assert(got.count() == 4)
  }

  test("winsorizeApprox: sketch-banded clamp matches exact winsorize on rank-exact percentiles") {
    // 5 evenly ranked values: p25/p75 land exactly on ranks 1 and 3
    // (no interpolation), where the quantile sketch is value-exact —
    // approx must agree with the exact operator bit-for-bit
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0), ("a", 50.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0), ("b", 5.0))
      .toDF("g", "v")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("g", "v", "w").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(Encoders.winsorizeApprox(df, "g", "v", "w", lo = 0.25, hi = 0.75))
      == rows(Encoders.winsorize(df, "g", "v", "w", lo = 0.25, hi = 0.75)))
    // [0, 1] band = [min, max]: clamping is the identity, rows keep
    val id = Encoders.winsorizeApprox(df, "g", "v", "w", lo = 0.0, hi = 1.0)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(id.length == 10 && id.forall { case (v, w) => v == w })
  }

  test("winsorizeApprox: NULL group and NULL value semantics mirror the exact operator") {
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)), (Some("a"), Option.empty[Double]),
      (None, Some(10.0)), (None, Some(20.0)))
      .toDF("g", "v")
    val got = Encoders.winsorizeApprox(df, "g", "v", "w", lo = 0.0, hi = 1.0)
      .collect().map(r => (Option(r.getString(0)), Option(r.get(1)), Option(r.get(2))))
    assert(got.length == 5, "no rows may vanish")
    assert(got.count(_._1.isEmpty) == 2, "NULL-group rows survive")
    assert(got.exists(r => r._2.isEmpty && r._3.isEmpty), "NULL value stays NULL")
  }

  test("winsorize: NULL group is a group — rows survive and clamp against the NULL group's band") {
    // a plain inner equi join on the group key would drop the three
    // NULL-group rows (join keys never match NULL)
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0),
      (None, 10.0), (None, 20.0), (None, 30.0))
      .toDF("g", "v")
    val got = Encoders.winsorize(df, "g", "v", "w", lo = 0.25, hi = 0.75)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 6, "no rows may vanish")
    val nulls = got.filter(_._1.isEmpty).sortBy(_._2).map(_._3)
    // NULL group 10/20/30: p25 = 15, p75 = 25 (exact interp on 3 pts)
    assert(nulls.toSeq == Seq(15.0, 20.0, 25.0))
  }

  test("winsorizeApprox: accuracy below 1/tail is a named error") {
    // rank error ~n/accuracy larger than the clipped tail mass makes
    // the band edge noise — must fail fast, not silently mis-winsorize
    val df = Seq(("a", 1.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Encoders.winsorizeApprox(df, "g", "v", "w",
        lo = 0.01, hi = 0.99, accuracy = 50)
    }
    assert(e.getMessage.contains("rank error"))
    // boundary: accuracy == 1/tail is allowed
    Encoders.winsorizeApprox(df, "g", "v", "w",
      lo = 0.01, hi = 0.99, accuracy = 100).collect()
  }
}
