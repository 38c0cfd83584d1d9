package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic decontamination contracts (VERDICT r12 #2):
  *   - the broadcast variant ENFORCES its bounded-probe contract
  *     (fails fast, named error — not a docstring);
  *   - retainBelow reproduces the inline q187 computation verbatim;
  *   - the IVF-routed variant at nprobe = nlist ≡ the broadcast
  *     variant exactly (values included);
  *   - at nprobe < nlist the retained set is a SUPERSET (IVF routing
  *     can under-drop, never over-drop) and every non-null routed max
  *     is ≤ the true max.
  */
class DecontaminationSpec extends SparkSpec {

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")

  private val threshold = 0.3

  private def probes = emb.filter(col("vec_id") % 100 === 3)

  private def broadcastRetained =
    Decontamination.retainBelow(emb, probes, threshold, excludeSelf = true)
      .orderBy("vec_id").collect().toSeq

  test("retainBelow: probe-count contract fails fast with a named error") {
    val e = intercept[IllegalArgumentException] {
      // maxProbes below the actual probe count → must raise before work
      Decontamination.retainBelow(emb, probes, threshold,
        excludeSelf = true, maxProbes = 1)
    }
    assert(e.getMessage.contains("maxProbes"))
    assert(e.getMessage.contains("retainBelowIvf"))
  }

  test("retainBelow drops exactly the vectors with a probe cosine at/above the threshold") {
    val got = broadcastRetained
    assert(got.nonEmpty && got.size < emb.count())
    assert(got.forall(_.getDouble(1) < threshold))
    // brute-force oracle: per-vector max cosine over all probes (self
    // excluded), computed by an independent collect-side loop
    def vecs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), Similarity.asDouble(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val all = vecs(emb)
    val ps = vecs(probes)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = all.flatMap { case (id, v) =>
      val m = ps.collect { case (pid, pv) if pid != id => cos(v, pv) }.max
      if (m < threshold) Some(id -> m) else None
    }
    assert(got.map(_.getLong(0)).toSet == expect.keySet)
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - expect(r.getLong(0))) < 1e-12)
    }
  }

  test("retainBelowIvf at nprobe = nlist reproduces the broadcast variant exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decontam-").toString
    Similarity.ivfIndexWrite(emb, dir, nlist = 8)
    val ivf = Decontamination.retainBelowIvf(spark, dir, probes, threshold,
        nprobe = 8, excludeSelf = true)
      .orderBy("vec_id").collect().toSeq
    val bc = broadcastRetained
    assert(ivf.map(_.getLong(0)) == bc.map(_.getLong(0)))
    ivf.zip(bc).foreach { case (a, b) =>
      assert(!a.isNullAt(1) && math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-12)
    }
  }

  test("an empty probe set retains the whole corpus (NULL max) in BOTH variants") {
    // r13 fresh-eyes audit: the first cut's inner join dropped the
    // ENTIRE corpus for an empty probe frame while the IVF variant
    // retained it — "nothing to decontaminate against" must retain.
    val none = probes.filter(lit(false))
    val bc = Decontamination.retainBelow(emb, none, threshold)
      .collect().toSeq
    assert(bc.size == emb.count())
    assert(bc.forall(_.isNullAt(1)))
    val dir = java.nio.file.Files.createTempDirectory("graft-decontam-").toString
    Similarity.ivfIndexWrite(emb, dir, nlist = 8)
    val ivf = Decontamination.retainBelowIvf(spark, dir, none, threshold,
      nprobe = 2).collect().toSeq
    assert(ivf.size == emb.count())
    assert(ivf.forall(_.isNullAt(1)))
  }

  test("retainBelowIvf at nprobe < nlist retains a superset; routed maxima are lower bounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decontam-").toString
    Similarity.ivfIndexWrite(emb, dir, nlist = 8)
    val ivf = Decontamination.retainBelowIvf(spark, dir, probes, threshold,
        nprobe = 2, excludeSelf = true)
      .orderBy("vec_id").collect().toSeq
    val bc = broadcastRetained
    val bcById = bc.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // superset: everything the exact pass retains, IVF retains too
    assert(bcById.keySet.subsetOf(ivf.map(_.getLong(0)).toSet))
    // lower bound: a routed max never exceeds the true max
    ivf.foreach { r =>
      bcById.get(r.getLong(0)).foreach { trueMax =>
        if (!r.isNullAt(1)) assert(r.getDouble(1) <= trueMax + 1e-12)
      }
    }
  }
}
