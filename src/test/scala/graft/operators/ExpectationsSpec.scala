package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private val dirty = Seq(
    (Some(1L), Some(10.0), Some("A"), 1),
    (Some(1L), Some(10.0), Some("A"), 1), // dup key (1,1)
    (Some(2L), Some(-5.0), Some("B"), 1), // range + set violations
    (None, Some(20.0), None, 2),          // null id; null flag (not a set violation)
    (Some(9L), None, Some("A"), 3)        // null qty (not a range violation)
  ).toDF("id", "qty", "flag", "line")

  test("all violation kinds counted, single scan for row-local checks") {
    val dim = Seq(1L, 2L).toDF("ref_id")
    val report = audit(dirty, Seq(
      NotNull("id"),
      InRange("qty", 0, 100),
      InSet("flag", Seq("A")),
      UniqueKey(Seq("id", "line")),
      Satisfies(col("qty").isNotNull, "qty_present"),
      RefIntegrity("id", dim, "ref_id")))
      .orderBy("check")
      .select("check", "violations", "passed")
      .as[(String, Long, Boolean)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap

    assert(report("not_null(id)") == ((1L, false)))
    assert(report("in_range(qty,0.0,100.0)") == ((1L, false)))
    assert(report("in_set(flag)") == ((1L, false)))
    assert(report("unique(id,line)") == ((1L, false)))
    assert(report("satisfies(qty_present)") == ((1L, false)))
    assert(report("ref_integrity(id)") == ((1L, false))) // id=9 not in dim
  }

  test("clean table passes every check") {
    val clean = Seq((1L, 5.0, "A", 1), (2L, 6.0, "A", 1)).toDF("id", "qty", "flag", "line")
    val report = audit(clean, Seq(
      NotNull("id"), InRange("qty", 0, 100), UniqueKey(Seq("id", "line"))))
    assert(report.filter(!col("passed")).count() == 0)
    assert(report.count() == 3)
    assert(report.select("total_rows").as[Long].collect().forall(_ == 2L))
  }

  test("enforce splits rows and names every violated check") {
    val (good, bad) = enforce(dirty, Seq(
      NotNull("id"), InRange("qty", 0, 100), InSet("flag", Seq("A"))))
    assert(good.count() + bad.count() == dirty.count())
    assert(!good.columns.contains("violations"))
    val reasons = bad.select(col("id"), col("violations"))
      .collect().map(r => (r.get(0), r.getSeq[String](1).toSet)).toMap
    // row (2, -5.0, "B"): both range and set violations named
    assert(reasons(2L) == Set("in_range(qty,0.0,100.0)", "in_set(flag)"))
    assert(reasons(null) == Set("not_null(id)"))
    // good rows really satisfy everything
    assert(good.filter(col("qty") < 0 || col("id").isNull).count() == 0)
  }

  test("enforce rejects an input that already has a violations column") {
    val e = intercept[IllegalArgumentException] {
      enforce(dirty.withColumn("violations", lit("user data")), Seq(NotNull("id")))
    }
    assert(e.getMessage.contains("violations"))
  }

  test("enforce rejects non-row-local checks with a named error") {
    val e = intercept[IllegalArgumentException] {
      enforce(dirty, Seq(UniqueKey(Seq("id"))))._2.count()
    }
    assert(e.getMessage.contains("unique(id)"))
  }

  test("operator construction is lazy — no Spark job fires") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val dim = Seq(1L).toDF("ref_id")
    audit(dirty, Seq(NotNull("id"), RefIntegrity("id", dim, "ref_id")))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "audit construction launched a Spark job")
  }
}
