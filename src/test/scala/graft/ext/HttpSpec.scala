package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for [[Http]] — edge cases the q221 generator cannot reach:
  * header-block-only messages, bodies echoing header text, multiple
  * same-name headers, HTTP/1.0, and the header-token guard.
  */
class HttpSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, p: String): Option[String] = {
    import spark.implicits._
    Seq(p).toDF("p").select(c.cast("string")).as[Option[String]].head()
  }

  test("split is the FIRST blank line; a body echoing headers stays body") {
    val p = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "Content-Type: I am body text\r\n\r\nand so is this"
    assert(one(Http.contentTypeOf(col("p")), p) === Some("text/html"))
    assert(one(Http.bodyOf(col("p")), p) ===
      Some("Content-Type: I am body text\r\n\r\nand so is this"))
  }

  test("headerless-body and bodyless-header messages degrade safely") {
    // no separator: everything is headers, body empty
    val noSep = "HTTP/1.0 204 No Content\r\nServer: g"
    assert(one(Http.statusOf(col("p")), noSep) === Some("204"))
    assert(one(Http.bodyOf(col("p")), noSep) === Some(""))
    // separator present, empty body
    val emptyBody = "HTTP/1.1 200 OK\r\nServer: g\r\n\r\n"
    assert(one(Http.bodyOf(col("p")), emptyBody) === Some(""))
  }

  test("status is NULL for non-HTTP payloads, parsed for both 1.0 and 1.1") {
    assert(one(Http.statusOf(col("p")), "<html>raw</html>") === None)
    assert(one(Http.statusOf(col("p")), "HTTP/1.0 302 Found\r\n\r\n") === Some("302"))
    // HTTP/2 framing is binary — its absence here is deliberate
    assert(one(Http.statusOf(col("p")), "HTTP/2 200\r\n\r\n") === None)
  }

  test("content type lowercases and strips parameters; first header wins") {
    val p = "HTTP/1.1 200 OK\r\nCONTENT-TYPE: Text/HTML ; charset=ISO-8859-1\r\n" +
      "Content-Type: application/json\r\n\r\nx"
    assert(one(Http.contentTypeOf(col("p")), p) === Some("text/html"))
    assert(one(Http.headerOf(col("p"), "Content-Type"), p)
      === Some("Text/HTML ; charset=ISO-8859-1"))
  }

  test("decodeBody frames through latin-1 and decodes per declared charset") {
    import spark.implicits._
    val accented = "café über"
    def payload(ct: String, body: Array[Byte]): Array[Byte] =
      s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n".getBytes("US-ASCII") ++ body
    val rows = Seq(
      (1L, payload("text/html; charset=utf-8", accented.getBytes("UTF-8"))),
      (2L, payload("text/html; charset=\"ISO-8859-1\"",
        accented.getBytes("ISO-8859-1"))),
      (3L, payload("text/html; charset=latin1", accented.getBytes("ISO-8859-1"))),
      (4L, payload("text/html", "plain".getBytes("US-ASCII"))), // undeclared → UTF-8
      (5L, payload("text/html; charset=shift_jis", "x".getBytes("US-ASCII"))),
      (6L, payload("text/html; charset=utf-8", Array.emptyByteArray)),
      (7L, payload("text/html; charset=Windows-1252",
        "a€b“c”–d".getBytes("windows-1252"))),
      (8L, payload("text/html; charset=cp1252",
        Array[Byte]('x'.toByte, 0x81.toByte, 'y'.toByte))) // undefined byte
    ).toDF("id", "p")
    val got = rows.select(col("id"), Http.decodeBody(col("p")).as("b"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some(accented))
    assert(got(2L) === Some(accented)) // 1-byte é/ü decoded, not mojibake
    assert(got(3L) === Some(accented)) // alias folds to ISO-8859-1
    assert(got(4L) === Some("plain"))
    assert(got(5L) === None)           // unsupported charset → quarantine
    assert(got(6L) === Some(""))
    // cp1252: latin-1 decode + the 0x80–0x9F translate — € “ ” – are
    // NOT C1 controls in the result
    assert(got(7L) === Some("a€b“c”–d"))
    // the five UNDEFINED cp1252 bytes stay as C1 controls (lenient)
    assert(got(8L) === Some("x\u0081y"))
  }

  test("charsetOf strips quotes and case; empty when undeclared") {
    val p = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=\"UTF-8\"\r\n\r\nx"
    assert(one(Http.charsetOf(col("p")), p) === Some("utf-8"))
    assert(one(Http.charsetOf(col("p")),
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nx") === Some(""))
  }

  test("headerOf rejects non-token names loudly") {
    val e = intercept[IllegalArgumentException](
      Http.headerOf(col("p"), "bad name\r\nInjected: x"))
    assert(e.getMessage.contains("not a header token"))
  }

  private def asciiBytes(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunked(parts: Seq[Array[Byte]], trailer: String = ""): Array[Byte] =
    parts.map(p => asciiBytes(p.length.toHexString + "\r\n") ++ p ++
        asciiBytes("\r\n")).reduceOption(_ ++ _).getOrElse(Array.emptyByteArray) ++
      asciiBytes("0\r\n" + trailer + "\r\n")

  test("dechunk: sizes in hex, extensions dropped, trailer headers consumed") {
    val body = chunked(Seq(asciiBytes("hello "), asciiBytes("world")))
    assert(new String(Http.dechunk(body), "US-ASCII") === "hello world")
    // chunk extension after ';' and a trailer header line
    val ext = asciiBytes("6;name=v\r\n") ++ asciiBytes("abcdef") ++
      asciiBytes("\r\n0\r\nX-Trailer: t\r\n\r\n")
    assert(new String(Http.dechunk(ext), "US-ASCII") === "abcdef")
    // chunk DATA containing CRLF and a hex-looking line stays data
    val hazard = asciiBytes("8\r\n") ++ asciiBytes("x\r\n3\r\nyz") ++
      asciiBytes("\r\n0\r\n\r\n")
    assert(new String(Http.dechunk(hazard), "US-ASCII") === "x\r\n3\r\nyz")
  }

  test("dechunk: truncated and malformed framings are loud") {
    val e1 = intercept[IllegalArgumentException](
      Http.dechunk(asciiBytes("5\r\nab"))) // cut mid-chunk
    assert(e1.getMessage.contains("declares 5 bytes"))
    val e2 = intercept[IllegalArgumentException](
      Http.dechunk(asciiBytes("zz\r\nab\r\n0\r\n\r\n")))
    assert(e2.getMessage.contains("malformed chunk size"))
    val e3 = intercept[IllegalArgumentException](
      Http.dechunk(asciiBytes("2\r\nab\r\n0\r\n\r\nEXTRA")))
    assert(e3.getMessage.contains("after the final chunk"))
    val e4 = intercept[IllegalArgumentException](
      Http.dechunk(asciiBytes("2\r\nab\r\n0\r\nX-T: 1"))) // trailer cut
    assert(e4.getMessage.contains("trailer section"))
  }

  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  test("decodeMessageBody: chunked, gzip, deflate, chunked+gzip, quarantines") {
    def msg(headers: String, body: Array[Byte]): Array[Byte] =
      asciiBytes(s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n") ++ body
    val text = "résumé €9 body"
    // chunked utf-8
    val c = Http.decodeMessageBody(msg(
      "Content-Type: text/html; charset=utf-8\r\nTransfer-Encoding: chunked",
      chunked(Seq(text.getBytes("UTF-8")))))
    assert(c === (("utf-8", text)))
    // gzip content coding
    val g = Http.decodeMessageBody(msg(
      "Content-Type: text/html; charset=UTF-8\r\nContent-Encoding: gzip",
      gzipBytes(text.getBytes("UTF-8"))))
    assert(g._2 === text)
    // zlib-wrapped deflate AND raw deflate both decode
    def deflated(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(6, raw)
      d.setInput(text.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    for (raw <- Seq(false, true)) {
      val z = Http.decodeMessageBody(msg(
        "Content-Type: text/html; charset=utf-8\r\nContent-Encoding: deflate",
        deflated(raw)))
      assert(z._2 === text, s"deflate raw=$raw")
    }
    // chunked FRAMING over gzip CONTENT: strip order is chunked → gzip
    val both = Http.decodeMessageBody(msg(
      "Content-Type: text/html; charset=utf-8\r\n" +
        "Transfer-Encoding: chunked\r\nContent-Encoding: gzip",
      chunked(gzipBytes(text.getBytes("UTF-8")).grouped(7).toSeq)))
    assert(both._2 === text)
    // quarantines: truncated chunks, corrupt gzip, unknown coding/charset
    assert(Http.decodeMessageBody(msg(
      "Transfer-Encoding: chunked", asciiBytes("5\r\nab")))._2 === null)
    assert(Http.decodeMessageBody(msg(
      "Content-Encoding: gzip", asciiBytes("not gzip")))._2 === null)
    assert(Http.decodeMessageBody(msg(
      "Content-Encoding: br", asciiBytes("x")))._2 === null)
    assert(Http.decodeMessageBody(msg(
      "Content-Type: text/html; charset=no-such-cs", asciiBytes("x")))._2 === null)
  }

  test("decodeMessageBody: full JRE charsets — Shift_JIS/GBK/EUC-KR/Big5 decode") {
    def msg(cs: String, body: Array[Byte]): Array[Byte] =
      asciiBytes(s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=$cs\r\n\r\n") ++ body
    val cases = Seq(
      ("shift_jis", "東京 データ"), ("gbk", "数据管道"),
      ("euc-kr", "데이터"), ("big5", "資料"))
    for ((cs, s) <- cases) {
      val got = Http.decodeMessageBody(msg(cs, s.getBytes(cs)))
      assert(got === ((cs, s)), cs)
    }
  }

  test("decodeBodyFull ≡ decodeBody on identity-encoded shared-charset payloads") {
    import spark.implicits._
    // the drift pin: same header/body framing rule, two physical paths
    val payloads = Seq(
      ("utf-8", "café résumé".getBytes("UTF-8")),
      ("iso-8859-1", "café résumé".getBytes("ISO-8859-1")),
      ("us-ascii", "plain".getBytes("US-ASCII")),
      ("windows-1252", "price €9 “q”".getBytes("windows-1252")),
      ("", "undeclared utf-8 é".getBytes("UTF-8"))).zipWithIndex.map {
      case ((cs, body), i) =>
        val ct = if (cs.isEmpty) "text/html" else s"text/html; charset=$cs"
        (i.toLong, s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n"
          .getBytes("US-ASCII") ++ body)
    }
    val df = payloads.toDF("id", "payload")
    val nativeSide = df.select(col("id"),
        Http.decodeBody(col("payload")).as("native"))
    val jvmSide = Http.decodeBodyFull(df, "id", "payload")
    val joined = nativeSide.join(jvmSide, "id")
      .select("id", "native", "body_text").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"id ${r.getLong(0)}")
    }
  }

  test("sniffContentType: magics, markup with BOM/whitespace, printable fallback") {
    import spark.implicits._
    def sniff(latin1: String): String =
      Seq(latin1).toDF("b").select(Http.sniffContentType(col("b")))
        .as[String].head()
    assert(sniff("\u0089PNG\r\n\u001A\nxxxx") === "image/png")
    assert(sniff("\u001F\u008B\u0008whatever") === "application/gzip")
    assert(sniff("ÿØÿjpeg") === "image/jpeg")
    assert(sniff("GIF89a....") === "image/gif")
    assert(sniff("%PDF-1.7 x") === "application/pdf")
    assert(sniff("PK\u0003\u0004zip") === "application/zip")
    // markup sniffing tolerates whitespace AND a UTF-8 BOM (in its
    // Latin-1 view), case-insensitively
    assert(sniff("ï»¿\n  <!DOCTYPE HTML><html>") === "text/html")
    assert(sniff("<HTML><body>") === "text/html")
    assert(sniff("\t<?xml version=\"1.0\"?>") === "application/xml")
    assert(sniff("ordinary prose, digits 123.") === "text/plain")
    // control bytes outside the printable set → octet-stream
    assert(sniff("\u0000\u0001\u0002binary") === "application/octet-stream")
  }

  test("decodeMessageBody metaFallback: meta charset used only when the header is silent") {
    def payload(ctype: String, body: Array[Byte]): Array[Byte] =
      s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n".getBytes("US-ASCII") ++ body
    // header silent → the HTML5 meta form decides (real Shift_JIS)
    val sj = "<meta charset=shift_jis><p>東京</p>".getBytes("shift_jis")
    assert(Http.decodeMessageBody(payload("text/html", sj), metaFallback = true)
      === (("shift_jis", "<meta charset=shift_jis><p>東京</p>")))
    // header present → it WINS over a lying meta
    val lying = "<meta charset=shift_jis><p>café</p>".getBytes("UTF-8")
    assert(Http.decodeMessageBody(
      payload("text/html; charset=utf-8", lying), metaFallback = true)
      === (("utf-8", "<meta charset=shift_jis><p>café</p>")))
    // without the flag the scan never runs (q229/q230 behavior intact)
    assert(Http.decodeMessageBody(payload("text/html", sj))._1 === "")
    // meta past the 1 KiB prescan window is not consulted
    val far = (" " * 1100 + "<meta charset=shift_jis>x").getBytes("US-ASCII")
    assert(Http.decodeMessageBody(payload("text/html", far),
      metaFallback = true)._1 === "")
  }

  test("extractMetaCharset shares the decode gear's pattern") {
    import spark.implicits._
    def meta(h: String): Option[String] =
      Seq(h).toDF("h").select(Html.extractMetaCharset(col("h")))
        .as[Option[String]].head()
    assert(meta("<meta charset=\"UTF-8\">") === Some("utf-8"))
    assert(meta("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=KOI8-R\">") === Some("koi8-r"))
    assert(meta("<meta name=\"viewport\" content=\"width=1\">") === None)
  }
}
