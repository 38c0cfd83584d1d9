package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for [[Privacy.kAnonymize]] on a crafted fixture that reaches
  * every ladder level INCLUDING full suppression (which the q209 gate
  * data never produces — 1500 customers over 5 segments always clear
  * the final level), and the load-bearing iterative property: a
  * coarser class releases on its STILL-UNRELEASED count, so a class
  * whose total clears k but whose remainder does not must fall
  * through, not release.
  */
class PrivacySpec extends SparkSpec {

  private val ladder = Seq(Seq("a", "b", "c"), Seq("a", "b"), Seq("b"))

  // k = 3; groups by (a, b, c):
  //   (1,x,1) ×3          → level 0
  //   (1,x,2), (1,x,3)    → (1,x) remainder 2 < 3, but (1,x) TOTAL is 5:
  //                         naive level-1 count would release these at 1;
  //                         honest falls through to b=x
  //   (2,x,1) ×2          → (2,x) remainder 2 < 3 → falls to b=x
  //                         b=x remainder = 2 + 2 = 4 ≥ 3 → level 2
  //   (3,y,*) ×3 distinct c → bands of 1 < 3, (3,y) remainder 3 → level 1
  //   (4,z,1) ×2          → (4,z) remainder 2, b=z remainder 2 < 3 → level 3
  private def fixture = {
    import spark.implicits._
    (Seq.tabulate(3)(i => (100 + i, 1, "x", 1)) ++
      Seq((103, 1, "x", 2), (104, 1, "x", 3)) ++
      Seq((105, 2, "x", 1), (106, 2, "x", 1)) ++
      Seq((107, 3, "y", 1), (108, 3, "y", 2), (109, 3, "y", 3)) ++
      Seq((110, 4, "z", 1), (111, 4, "z", 1)))
      .toDF("id", "a", "b", "c")
  }

  test("kAnonymize assigns honest iterative levels, including suppression") {
    val got = Privacy.kAnonymize(fixture, ladder, k = 3)
      .select("id", "anon_level", "rel_a", "rel_b", "rel_c")
      .collect().map(r => r.getInt(0) ->
        ((r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))).toMap
    for (i <- 100 to 102)
      assert(got(i) === ((0, "1", "x", "1")), s"id $i")
    // the iterative pin: (1,x) total is 5 ≥ k, remainder 2 < k — these
    // MUST NOT release at level 1
    for (i <- 103 to 106)
      assert(got(i)._1 === 2, s"id $i fell to segment level")
    assert(got(103) === ((2, "*", "x", "*")))
    for (i <- 107 to 109)
      assert(got(i) === ((1, "3", "y", "*")), s"id $i")
    for (i <- 110 to 111)
      assert(got(i) === ((3, "*", "*", "*")), s"id $i suppressed")
  }

  test("every released class in the output has at least k members") {
    val out = Privacy.kAnonymize(fixture, ladder, k = 3)
    val bad = out.filter(col("anon_level") < ladder.size)
      .groupBy("rel_a", "rel_b", "rel_c").count()
      .filter(col("count") < 3)
    assert(bad.count() === 0)
  }

  test("null quasi values form their own class and are never dropped") {
    import spark.implicits._
    // a "segment unknown" population: 3 null-a rows clear k at level 0;
    // the 2 non-null rows fall the whole ladder to suppression. A plain
    // equi-join back would silently DROP the null-keyed rows.
    val df = Seq[(Int, Option[Int], String, Int)](
      (201, None, "n", 1), (202, None, "n", 1), (203, None, "n", 1),
      (204, Some(9), "n", 1), (205, Some(9), "n", 2)).toDF("id", "a", "b", "c")
    val out = Privacy.kAnonymize(df, ladder, k = 3)
    assert(out.count() === 5)
    val byId = out.select("id", "anon_level")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    for (i <- 201 to 203) assert(byId(i) === 0, s"id $i")
    for (i <- 204 to 205) assert(byId(i) === 3, s"id $i")
  }

  test("ladder validation rejects non-monotone and empty ladders") {
    val df = fixture
    val e1 = intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq(Seq("a", "b"), Seq("b", "c")), k = 3))
    assert(e1.getMessage.contains("strictly coarsen"))
    val e2 = intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, ladder, k = 0))
    assert(e2.getMessage.contains("k must be"))
  }

  test("a high-cardinality quasi set fails fast instead of broadcasting") {
    // r14 verdict ask #7: the class decision table is driver-broadcast;
    // a quasi column with ~row-count cardinality must error with advice,
    // not OOM. The probe is limit(n+1)-bounded — it never counts the
    // full class table.
    import spark.implicits._
    val wide = (1 to 50).map(i => (i, i, "x", 1)).toDF("id", "a", "b", "c")
    val e = intercept[IllegalArgumentException](
      Privacy.kAnonymize(wide, ladder, k = 3, maxClasses = 10).collect())
    assert(e.getMessage.contains("more than 10 distinct quasi-identifier"))
    assert(e.getMessage.contains("maxClasses"))
    // at the default bound the same frame anonymizes fine
    assert(Privacy.kAnonymize(wide, ladder, k = 3).count() === 50)
  }

  test("k = 1 releases everything at level 0 with original values") {
    val out = Privacy.kAnonymize(fixture, ladder, k = 1)
    assert(out.filter(col("anon_level") =!= 0).count() === 0)
    assert(out.filter(col("rel_a") === "*").count() === 0)
  }
}
