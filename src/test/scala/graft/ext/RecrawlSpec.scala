package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  test("conditionalFetchDecision: decision table incl. symmetric NULL handling") {
    // (allowed, changed, has_validators) → decision. The two NULL rows
    // pin the r17 ADVICE fix: NULL allowed fails closed to skip, NULL
    // changed (a never-fetched frontier URL arriving via left outer
    // join) defaults to FETCH — revalidating a page never observed
    // would 304 into a permanently empty corpus entry.
    val rows = Seq(
      (Some(false), Some(false), true, "skip"),
      (None: Option[Boolean], Some(false), true, "skip"),
      (Some(true), Some(true), true, "fetch"),
      (Some(true), Some(false), true, "conditional"),
      (Some(true), Some(false), false, "fetch"),
      (Some(true), None: Option[Boolean], true, "fetch"),
      (Some(true), None: Option[Boolean], false, "fetch"))
    val df = rows.toDF("allowed", "changed", "has_validators", "expected")
      .withColumn("decision", Recrawl.conditionalFetchDecision(
        col("allowed"), col("changed"), col("has_validators")))
    val bad = df.filter(col("decision") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("rankByChangeRate: total order by (rate desc, key asc), rank 1-based") {
    val df = Seq(("u3", 5L), ("u1", 9L), ("u2", 5L), ("u4", 0L))
      .toDF("url", "rate")
    val (ranked, release) = Recrawl.rankByChangeRate(df, "url", "rate")
    val out = ranked.orderBy("recrawl_rank")
      .select("url", "recrawl_rank").as[(String, Long)].collect().toSeq
    release()
    assert(out == Seq(("u1", 1L), ("u2", 2L), ("u3", 3L), ("u4", 4L)))
  }
}
