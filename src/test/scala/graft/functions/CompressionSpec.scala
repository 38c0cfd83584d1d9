package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compressibility-signal semantics: class separation, the empty/null
  * contract, codegen-path determinism vs a direct JVM reference.
  */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: String*) =
    texts.toDF("t")
      .select(CompressionExpressions.deflateRatioMilli(col("t")).as("r"))
      .as[Option[Int]].collect().toSeq

  test("ratio separates repetition, prose, and random hex") {
    // ~1.1 kB of varied sentences, repeated once — enough length that
    // the DEFLATE window sees real prose statistics; a SHORT unique
    // paragraph runs 700+ milli on overhead alone (length context
    // matters, which is why the q294 gate bands same-length classes)
    val sentences = Seq(
      "The quick brown fox jumps over the lazy dog while a slower " +
        "hound naps beside the river bank.",
      "Seventeen gulls argue about crumbs near the old pier where " +
        "fishermen mend their worn nets at dawn.",
      "A narrow lane climbs past the bakery toward the lighthouse, " +
        "smelling of salt, yeast, and diesel.",
      "Children chase a paper kite across the dunes as the tide " +
        "drags shells back into the grey water.")
    val prose = (sentences ++ sentences).mkString(" ")
    val rep = "corpus quality signal " * 40
    val rnd = (0 until 16).map(j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"seed$j".getBytes).map("%02x".format(_)).mkString).mkString
    val Seq(Some(a), Some(b), Some(c)) = ratios(rep, prose, rnd)
    assert(a < 120, s"repetition ratio $a")
    assert(b > 150 && b < 500, s"prose ratio $b")
    assert(c > 400 && c > b, s"random ratio $c")
  }

  test("empty is NULL, NULL propagates, short-doc overhead never errors") {
    val got = Seq(Some(""), None, Some("x")).toDF("t")
      .select(CompressionExpressions.deflateRatioMilli(col("t")).as("r"))
      .as[Option[Int]].collect().toSeq
    assert(got(0).isEmpty && got(1).isEmpty)
    // one byte can't compress: ratio well above 1000 (overhead-bound)
    assert(got(2).exists(_ >= 1000))
  }

  test("expression path equals a direct Deflater reference byte count") {
    val text = "determinism probe " * 7 + "tail"
    val viaExpr = Seq(text).toDF("t")
      .select(CompressionExpressions.deflateSize(col("t")).as("n"))
      .as[Int].head()
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(text.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](8192)
    var ref = 0
    while (!d.finished()) ref += d.deflate(buf)
    d.end()
    assert(viaExpr === ref)
    // multibyte: the size is over UTF-8 BYTES, not chars
    val multi = "é" * 50
    val viaExpr2 = Seq(multi).toDF("t")
      .select(CompressionExpressions.deflateSize(col("t")).as("n"))
      .as[Int].head()
    assert(viaExpr2 > 0 && viaExpr2 < 100)
  }
}
