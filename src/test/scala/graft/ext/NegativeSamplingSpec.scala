package graft.ext

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.functions._

import graft.SparkSpec

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("sampleTable: draws land in the hand-computed tempered intervals") {
    // counts 16 and 1: tempered weights 16^0.75 = 8 and 1 → quantized
    // 8e6 / 1e6; intervals a = [0, 8e6), b = [8e6, 9e6)
    val vocab = Seq(("a", 16L), ("b", 1L)).toDF("term", "cnt")
    val draws = spark.range(200).select(col("id").as("draw_id"))
    val got = NegativeSampling.sampleTable(vocab, "term", "cnt",
        draws, "draw_id")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === (0L until 200L), "every draw maps exactly once")
    val wTot = 9000000L
    got.foreach { case (id, term, wq) =>
      val u = java.lang.Long.parseLong(
        DigestUtils.md5Hex(s"$id:ns").substring(0, 13), 16)
      val expect = if (u % wTot < 8000000L) ("a", 8000000L) else ("b", 1000000L)
      assert((term, wq) === expect, s"draw $id")
    }
    // the 8:1 mass ratio shows up in the draw distribution
    val nA = got.count(_._2 == "a")
    assert(nA > 150 && nA < 200, s"expected ~8/9 of draws on 'a', got $nA/200")
  }

  test("sampleTable: deterministic, no nested loop, guards") {
    val vocab = Seq(("x", 3L), ("y", 5L), ("z", 2L)).toDF("term", "cnt")
    val draws = spark.range(20).select(col("id").as("draw_id"))
    val a = NegativeSampling.sampleTable(vocab, "term", "cnt", draws, "draw_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = NegativeSampling.sampleTable(vocab, "term", "cnt", draws, "draw_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b && a.size === 20)
    val plan = NegativeSampling.sampleTable(vocab, "term", "cnt",
      draws, "draw_id").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"containment must bucket:\n$plan")
    // a count below 1 raises the NAMED row-level error (r12 audit: the
    // old behavior silently NaN-poisoned the cumsum for negatives)
    val e = intercept[Exception](
      NegativeSampling.sampleTable(
        Seq(("x", 0L)).toDF("term", "cnt"), "term", "cnt", draws, "draw_id"))
    assert(e.getMessage.contains("must be >= 1"))
    // an EMPTY vocabulary still fails fast with the mass-0 error
    val e2 = intercept[IllegalArgumentException](
      NegativeSampling.sampleTable(
        Seq.empty[(String, Long)].toDF("term", "cnt"), "term", "cnt",
        draws, "draw_id"))
    assert(e2.getMessage.contains("mass is 0"))
  }
}
