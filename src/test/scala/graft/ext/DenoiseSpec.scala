package graft.ext

import org.apache.commons.codec.digest.DigestUtils

import graft.SparkSpec

class DenoiseSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the full span-corruption semantics. */
  private def brute(id: Long, text: String, noiseFrac: Double,
      spanLen: Int): (String, String, Long, Long) = {
    val toks = text.trim match {
      case "" => Array.empty[String]
      case s => s.split("\\s+")
    }
    val n = toks.length
    val thr = f"${(noiseFrac / spanLen * 4294967296.0).toLong}%08x"
    val thrS = if (noiseFrac / spanLen == 1.0) "g" else thr
    val start = (1 to n).map(i =>
      DigestUtils.md5Hex(s"$id:$i:sc") < thrS)
    val masked = (1 to n).map(j =>
      (math.max(j - (spanLen - 1), 1) to j).exists(s => start(s - 1)))
    val runs = (1 to n).filter(j => masked(j - 1) &&
      (j == 1 || !masked(j - 2)))
    def sentinel(j: Int) = s"<extra_id_${runs.indexOf(j) + 1}>"
    val input = (1 to n).flatMap { j =>
      if (masked(j - 1))
        if (runs.contains(j)) Seq(sentinel(j)) else Seq.empty
      else Seq(toks(j - 1))
    }.mkString(" ")
    val target = (1 to n).flatMap { j =>
      if (masked(j - 1))
        if (runs.contains(j)) Seq(sentinel(j), toks(j - 1))
        else Seq(toks(j - 1))
      else Seq.empty
    }.mkString(" ")
    (input, target, masked.count(identity).toLong, runs.size.toLong)
  }

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    (2L, "single"),
    (3L, ""),
    (4L, "two tokens"))

  test("spanCorruptionPlan equals the driver-side md5 replay") {
    for (frac <- Seq(0.15, 0.45); l <- Seq(1, 3)) {
      val got = Denoise.spanCorruptionPlan(docs.toDF("doc_id", "text"),
          "doc_id", "text", noiseFrac = frac, spanLen = l)
        .as[(Long, String, String, Long, Long)]
        .collect().sortBy(_._1).toSeq
      val want = docs.sortBy(_._1).map { case (id, tx) =>
        val (i, t, m, s) = brute(id, tx, frac, l)
        (id, i, t, m, s)
      }
      assert(got === want, s"frac=$frac spanLen=$l")
    }
  }

  test("boundary fractions: 0 masks nothing, spanLen masks everything") {
    val none = Denoise.spanCorruptionPlan(docs.toDF("doc_id", "text"),
        "doc_id", "text", noiseFrac = 0.0, spanLen = 3)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    docs.sortBy(_._1).zip(none).foreach { case ((_, tx), (_, in, tgt, m, s)) =>
      assert(in === tx.trim.split("\\s+").filter(_.nonEmpty).mkString(" "))
      assert(tgt === "" && m === 0L && s === 0L)
    }
    // noiseFrac = spanLen ⇒ start rate 1 ⇒ one maximal run per doc
    val all = Denoise.spanCorruptionPlan(docs.toDF("doc_id", "text"),
        "doc_id", "text", noiseFrac = 3.0, spanLen = 3)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1)
    docs.sortBy(_._1).zip(all).foreach { case ((_, tx), (_, in, tgt, m, s)) =>
      val nTok = tx.trim.split("\\s+").count(_.nonEmpty)
      if (nTok == 0) { assert(in === "" && tgt === "" && m === 0L && s === 0L) }
      else {
        assert(in === "<extra_id_1>")
        assert(tgt.startsWith("<extra_id_1> ") && m === nTok.toLong && s === 1L)
      }
    }
  }

  test("determinism and guards") {
    val a = Denoise.spanCorruptionPlan(docs.toDF("doc_id", "text"),
      "doc_id", "text").collect().toSeq
    val b = Denoise.spanCorruptionPlan(docs.toDF("doc_id", "text"),
      "doc_id", "text").collect().toSeq
    assert(a === b)
    intercept[IllegalArgumentException](
      Denoise.spanCorruptionPlan(docs.toDF("doc_id", "text"), "doc_id",
        "text", noiseFrac = 4.0, spanLen = 3))
    intercept[IllegalArgumentException](
      Denoise.spanCorruptionPlan(docs.toDF("doc_id", "text"), "doc_id",
        "text", spanLen = 0))
  }

  private def bruteFim(id: Long, text: String,
      fimRate: Double): (String, Boolean, Long, Long, Long) = {
    val toks = text.trim match {
      case "" => Array.empty[String]
      case s => s.split("\\s+")
    }
    val n = toks.length.toLong
    val thr = if (fimRate == 1.0) "g"
      else f"${(fimRate * 4294967296.0).toLong}%08x"
    val fim = DigestUtils.md5Hex(s"$id:fim") < thr
    def u(salt: String): Long =
      java.lang.Long.parseLong(
        DigestUtils.md5Hex(s"$id$salt").substring(0, 13), 16)
    if (!fim) (toks.mkString(" "), false, n, 0L, 0L)
    else {
      val c1 = u(":c1") % (n + 1)
      val c2 = u(":c2") % (n + 1)
      val lo = math.min(c1, c2).toInt
      val hi = math.max(c1, c2).toInt
      val txt = (Seq("<fim_prefix>") ++ toks.take(lo) ++
        Seq("<fim_suffix>") ++ toks.drop(hi) ++
        Seq("<fim_middle>") ++ toks.slice(lo, hi)).mkString(" ")
      (txt, true, lo.toLong, (hi - lo).toLong, n - hi)
    }
  }

  test("fimPlan equals the driver-side md5 replay; segments partition") {
    for (rate <- Seq(0.0, 0.5, 1.0)) {
      val got = Denoise.fimPlan(docs.toDF("doc_id", "text"),
          "doc_id", "text", fimRate = rate)
        .as[(Long, String, Boolean, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      val want = docs.sortBy(_._1).map { case (id, tx) =>
        val (t, f, p, m, sfx) = bruteFim(id, tx, rate)
        (id, t, f, p, m, sfx)
      }
      assert(got === want, s"rate=$rate")
      got.zip(docs.sortBy(_._1)).foreach { case ((_, _, _, p, m, sfx), (_, tx)) =>
        val nTok = tx.trim.split("\\s+").count(_.nonEmpty).toLong
        assert(p + m + sfx === nTok, "segments partition the document")
      }
    }
    intercept[IllegalArgumentException](
      Denoise.fimPlan(docs.toDF("doc_id", "text"), "doc_id", "text", 1.5))
  }

  test("plan is a pure scan projection: no exchange, no join") {
    val plan = Denoise.spanCorruptionPlan(docs.toDF("doc_id", "text"),
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }
}
