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
}
