package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTTP/1.x response-message parsing — the layer between [[Warc]] and
  * [[Html]] that real crawl archives require: a WARC `response`
  * record's payload is not a bare document, it is the HTTP MESSAGE
  * the crawler received — status line, header block, blank line,
  * body — and a pipeline that treats the payload as page text feeds
  * status lines and header soup into every text operator downstream.
  * Splitting status / headers / body off first (and keeping only
  * 2xx + text/html) is the step Common-Crawl-style processing runs
  * between record framing and markup extraction.
  *
  * Reference scope: the reference pipelines
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py`)
  * ingest structured CSV — §8.2 extension surface, the stage between
  * [[Warc]] (q213/q214) and [[Html]] (q210).
  *
  * All native string/regexp expressions — per-row narrow projections,
  * no UDF, no shuffle; at 100 TB the parse rides the scan exactly
  * like [[Html.extractText]]. The header/body split is the FIRST
  * `\r\n\r\n` (the message grammar — header values cannot contain a
  * blank line, bodies routinely contain header-looking text, so
  * splitting on anything later would corrupt both sides). [[bodyOf]]
  * reads the payload as a string (right when upstream already decoded
  * bytes); [[decodeBody]] is the byte-true form — it frames through a
  * lossless Latin-1 view and transcodes the body per the declared
  * charset (UTF-8 / Latin-1 / ASCII / Windows-1252; anything else
  * quarantines to NULL rather than mojibake).
  */
object Http {

  private val CrlfCrlf = "\r\n\r\n"

  /** The header block of an HTTP response message (status line
    * included, terminating blank line excluded). A payload with no
    * blank-line separator is all headers and has an empty body —
    * the tolerant read for truncated fetches.
    */
  def headerBlockOf(payload: Column): Column =
    substring_index(payload, CrlfCrlf, 1)

  /** The message body: everything past the FIRST `\r\n\r\n`. Empty
    * when the separator is absent. `substring` past the header block
    * (never a second `substring_index`) keeps bodies intact when THEY
    * contain `\r\n\r\n`.
    */
  def bodyOf(payload: Column): Column = {
    val head = headerBlockOf(payload)
    when(length(payload) > length(head),
      substring(payload, length(head) + lit(5), lit(Int.MaxValue)))
      .otherwise(lit(""))
  }

  /** Status code of the response (`HTTP/1.0` or `HTTP/1.1` status
    * line), NULL when the payload does not start with one — the
    * quarantine signal for non-HTTP payloads.
    */
  def statusOf(payload: Column): Column = {
    val s = regexp_extract(payload, "^HTTP/1\\.[01] (\\d{3})", 1)
    when(s === "", lit(null).cast("int")).otherwise(s.cast("int"))
  }

  /** The media type of the `Content-Type` header, lowercased, charset
    * and other parameters stripped (`Text/HTML; charset=UTF-8` →
    * `text/html`); empty string when the header is absent. Matched
    * case-insensitively at line starts INSIDE the header block only —
    * a body echoing `Content-Type:` text never contaminates it.
    */
  def contentTypeOf(payload: Column): Column =
    lower(trim(regexp_extract(headerBlockOf(payload),
      "(?im)^content-type:[ \\t]*([^\\r\\n;]+)", 1)))

  /** One named response header's value (first occurrence, trimmed,
    * case-insensitive name match inside the header block); empty when
    * absent. The name must be a literal header token.
    */
  def headerOf(payload: Column, name: String): Column = {
    require(name.matches("[A-Za-z0-9-]+"),
      s"Http.headerOf: '$name' is not a header token")
    trim(regexp_extract(headerBlockOf(payload),
      "(?im)^" + name + ":[ \\t]*([^\\r\\n]+)", 1))
  }

  /** The declared charset of the `Content-Type` header, lowercased,
    * quotes stripped (`charset="ISO-8859-1"` → `iso-8859-1`); empty
    * when undeclared.
    */
  def charsetOf(payload: Column): Column =
    lower(regexp_extract(headerBlockOf(payload),
      "(?im)^content-type:[^\\r\\n]*;[ \\t]*charset=\"?([^\\r\\n;\" ]+)\"?", 1))

  /** Charsets [[decodeBody]] transcodes: the set Spark's `decode`
    * supports plus WINDOWS-1252 (decoded as Latin-1 then the 0x80–0x9F
    * block translated — see [[Cp1252HighChars]]), with common aliases.
    * The crawl majority: W3C's census puts UTF-8 + cp1252/Latin-1 +
    * ASCII above 95% of pages; anything else returns NULL — the
    * quarantine signal, never a silently mojibake'd document.
    */
  val SupportedCharsets: Map[String, String] = Map(
    "utf-8" -> "UTF-8", "utf8" -> "UTF-8",
    "iso-8859-1" -> "ISO-8859-1", "latin1" -> "ISO-8859-1",
    "l1" -> "ISO-8859-1",
    "us-ascii" -> "US-ASCII", "ascii" -> "US-ASCII",
    "windows-1252" -> "CP1252", "cp1252" -> "CP1252",
    "" -> "UTF-8") // RFC 9110: undeclared text defaults are caller policy; UTF-8 is the crawl default

  /** The 27 defined WINDOWS-1252 code points in 0x80–0x9F, indexed by
    * byte − 0x80 (the five undefined bytes map to themselves as C1
    * controls, the lenient convention). Everything else in cp1252 is
    * byte-identical to ISO-8859-1, so cp1252 = latin-1 decode + one
    * native `translate` of this block — no JRE charset needed.
    */
  private val Cp1252HighChars: Seq[(Char, Char)] =
    "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ"
      .zipWithIndex.collect {
        case (c, i) if c >= 0xA0 => ((0x80 + i).toChar, c)
      }

  private def decodeAs(bin: Column, canonical: String): Column =
    if (canonical != "CP1252") decode(bin, canonical)
    else translate(decode(bin, "ISO-8859-1"),
      Cp1252HighChars.map(_._1).mkString, Cp1252HighChars.map(_._2).mkString)

  /** Charset-correct body text from a BINARY HTTP payload — the
    * production form of [[bodyOf]]: real fetches are bytes, and a
    * Latin-1 page read as UTF-8 mojibakes every non-ASCII character
    * into the text pipeline. Two-phase, all native expressions:
    *
    *   1. frame through a LATIN-1 view of the bytes (a lossless
    *      byte↔char bijection, so header offsets in chars ARE byte
    *      offsets — a UTF-8 view would desynchronize on the first
    *      non-ASCII header byte),
    *   2. slice the body BYTES (`substring` on binary) past the
    *      header block + separator and `decode` them per the declared
    *      charset ([[charsetOf]]), folding the [[SupportedCharsets]]
    *      aliases through one CASE — an out-of-set charset yields
    *      NULL (quarantine), never wrong text.
    *
    * HTTP headers are ASCII by grammar, so phase 1's framing is exact
    * for any body encoding.
    */
  def decodeBody(payloadBin: Column): Column = {
    val latin1 = decode(payloadBin, "ISO-8859-1")
    val head = headerBlockOf(latin1)
    val bodyBin = when(length(latin1) > length(head),
        substring(payloadBin, length(head) + lit(5), lit(Int.MaxValue)))
      .otherwise(lit(Array.emptyByteArray))
    val cs = charsetOf(latin1)
    SupportedCharsets.groupBy(_._2).toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("string")) { case (rest, (canonical, aliases)) =>
        when(cs.isin(aliases.keys.toSeq.map(x => x: Any): _*),
          decodeAs(bodyBin, canonical)).otherwise(rest)
      }
  }
}
