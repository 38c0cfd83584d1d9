package graft.ext

import graft.SparkSpec

/** Reliability audit: rank bins and the exact tie-aware Mann-Whitney
  * AUC against hand-computed values, plus the degenerate single-class
  * and guard edges.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("reliabilityAudit: hand-computed AUC with ties; bin counts exact") {
    // margins: negs {1, 3, 3}, poss {3, 5, 7}; pairwise (pos, neg):
    // 3v1 win, 3v3 tie, 3v3 tie, 5/7 beat all three each
    // U = (1 + 0.5 + 0.5) + 3 + 3 = 8 → AUC = 8 / 9
    val df = Seq(
      (1L, 1L, false), (2L, 3L, false), (3L, 3L, true),
      (4L, 3L, false), (5L, 5L, true), (6L, 7L, true))
      .toDF("id", "m", "pos")
    val out = Calibration.reliabilityAudit(df, "id", "m", "pos", bins = 3)
      .collect()
    assert(out.length === 3)
    val auc = out.head.getAs[Double]("auc")
    assert(math.abs(auc - 8.0 / 9.0) < 1e-15, s"auc $auc")
    assert(out.forall(_.getAs[Double]("auc") == auc))
    // 6 rows into 3 equal-count bins: 2 each; rank order is
    // (1,n) (3,p@3) (3,n@2... ) — total order ties on (margin, id):
    // idx: (1,1n)=0 (3,2n)=1 | (3,3p)=2 (3,4n)=3 | (5,5p)=4 (7,6p)=5
    val byBin = out.map(r => r.getAs[Int]("bin") ->
      (r.getAs[Long]("n"), r.getAs[Long]("n_pos"))).toMap
    assert(byBin === Map(0 -> (2L, 0L), 1 -> (2L, 1L), 2 -> (2L, 2L)))
    // margin spans per bin
    val spans = out.map(r => r.getAs[Int]("bin") ->
      (r.getAs[Long]("margin_lo"), r.getAs[Long]("margin_hi"))).toMap
    assert(spans === Map(0 -> (1L, 3L), 1 -> (3L, 3L), 2 -> (5L, 7L)))
  }

  test("reliabilityAudit: perfect and inverted rankers bracket the scale") {
    val perfect = Seq((1L, 0L, false), (2L, 1L, false), (3L, 2L, true),
      (4L, 3L, true)).toDF("id", "m", "pos")
    assert(Calibration.reliabilityAudit(perfect, "id", "m", "pos", 2)
      .head().getAs[Double]("auc") === 1.0)
    val inverted = Seq((1L, 0L, true), (2L, 1L, true), (3L, 2L, false),
      (4L, 3L, false)).toDF("id", "m", "pos")
    assert(Calibration.reliabilityAudit(inverted, "id", "m", "pos", 2)
      .head().getAs[Double]("auc") === 0.0)
  }

  test("reliabilityAudit: single-class input reports NULL auc, not NaN") {
    val df = Seq((1L, 5L, true), (2L, 9L, true)).toDF("id", "m", "pos")
    val out = Calibration.reliabilityAudit(df, "id", "m", "pos", 2).collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("auc"))))
    assert(out.map(_.getAs[Long]("n")).sum === 2L)
  }

  test("property: AUC equals O(n²) brute force with ties, random margins/labels") {
    // exact Mann-Whitney with 0.5 tie credit, replayed pairwise — the
    // rank-sum shortcut must agree on margin distributions dense with
    // ties (margins drawn from a small range)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val n = 5 + rnd.nextInt(40)
      val rows = (0 until n).map(i =>
        (i.toLong, (rnd.nextInt(9) - 4).toLong, rnd.nextBoolean()))
      val np = rows.count(_._3)
      val auc = Calibration.reliabilityAudit(
        rows.toDF("id", "m", "pos"), "id", "m", "pos", bins = 4)
        .head().getAs[java.lang.Double]("auc")
      if (np == 0 || np == n) assert(auc == null, s"trial $trial")
      else {
        val pos = rows.filter(_._3).map(_._2)
        val neg = rows.filterNot(_._3).map(_._2)
        val u = (for (p <- pos; q <- neg) yield
          if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val want = u / (pos.size.toDouble * neg.size)
        assert(math.abs(auc - want) < 1e-12,
          s"trial $trial: got $auc want $want rows=$rows")
      }
    }
  }

  test("reliabilityAudit: non-integral margin column refused (r12 audit)") {
    val df = Seq((1L, 0.5, true), (2L, 0.9, false)).toDF("id", "m", "pos")
    val ex = intercept[IllegalArgumentException](
      Calibration.reliabilityAudit(df, "id", "m", "pos", 2))
    assert(ex.getMessage.contains("integral"))
  }

  test("reliabilityAudit: bins guard; more bins than rows leaves empties out") {
    val df = Seq((1L, 5L, true), (2L, 9L, false)).toDF("id", "m", "pos")
    intercept[IllegalArgumentException](
      Calibration.reliabilityAudit(df, "id", "m", "pos", 0))
    // 2 rows, 5 bins: idx*5 div 2 → bins 0 and 2 only; empty bins are
    // absent rather than fabricated zero rows
    val bins = Calibration.reliabilityAudit(df, "id", "m", "pos", 5)
      .collect().map(_.getAs[Int]("bin")).toSeq
    assert(bins === Seq(0, 2))
  }
}
