package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** One regex, BOTH `<meta>` charset forms — `<meta charset="x">`
    * (HTML5) and `<meta http-equiv="Content-Type" content="…;
    * charset=x">` (the legacy form real pages still carry): the
    * `charset=` token inside the tag is what matters, whichever
    * attribute holds it. Shared verbatim by the native
    * [[Html.extractMetaCharset]] expression and the JVM decode gear's
    * fallback scan, so the two can never drift.
    */
  val MetaCharsetPattern: String =
    "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9._-]+)"

  /** Sniff the media type from CONTENT bytes (their lossless Latin-1
    * view — the framing convention of this module): real crawl
    * `Content-Type` headers LIE routinely (PNGs served as text/html,
    * gzip as text/plain), and a pipeline that trusts them feeds binary
    * soup into text operators. Magic numbers are matched on the RAW
    * head (gzip, PNG, JPEG, GIF, PDF, ZIP); markup sniffing
    * (`<!doctype html`/`<html`, `<?xml`) tolerates leading whitespace
    * and a UTF-8 BOM; a head of printable/whitespace Latin-1 falls to
    * `text/plain`, anything else to `application/octet-stream`. One
    * native expression, no UDF.
    */
  def sniffContentType(latin1: Column): Column = {
    val head = substring(latin1, 1, 512)
    val markup = lower(regexp_replace(head,
      "^(\\uFEFF|\\u00EF\\u00BB\\u00BF|\\s)+", ""))
    when(head.startsWith("\u001F\u008B"), lit("application/gzip"))
      .when(head.startsWith("\u0089PNG"), lit("image/png"))
      .when(head.startsWith("\u00FF\u00D8\u00FF"), lit("image/jpeg"))
      .when(head.startsWith("GIF8"), lit("image/gif"))
      .when(head.startsWith("%PDF-"), lit("application/pdf"))
      .when(head.startsWith("PK\u0003\u0004"), lit("application/zip"))
      .when(markup.startsWith("<!doctype html") || markup.startsWith("<html"),
        lit("text/html"))
      .when(markup.startsWith("<?xml"), lit("application/xml"))
      .when(head.rlike("^[\\x09\\x0A\\x0D\\x20-\\x7E\\u00A0-\\u00FF]*$"),
        lit("text/plain"))
      .otherwise(lit("application/octet-stream"))
  }

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

  // ---------------------------------------------------------------------
  // Transfer/content-decoding gear — the FULL production form of
  // [[decodeBody]]: real crawl responses routinely arrive with
  // `Transfer-Encoding: chunked` (hex chunk-size framing interleaved
  // with the data) and/or `Content-Encoding: gzip`/`deflate`
  // (compressed bodies), and a decoder that skips those layers feeds
  // chunk-size lines or raw deflate bytes into every text operator
  // downstream. Framing (chunked) strips BEFORE content decoding
  // (gzip), which strips before charset decoding — the inverse of the
  // order the layers were applied on the wire (RFC 9112 §6.1/§7).
  //
  // The gear is a narrow `mapPartitions` pass (the [[Multimodal]] /
  // [[Warc]] codec discipline): gzip/deflate need the JVM's Inflater,
  // and once a JVM pass exists the charset decode rides it too —
  // which lifts the charset set from [[SupportedCharsets]] to the
  // FULL JRE set (Shift_JIS, GBK, EUC-KR, Big5, …): a multilingual
  // crawl keeps whole languages the native path must quarantine.
  // Malformed layers (bad chunk framing, corrupt gzip, unknown
  // charset or content coding) yield NULL — the quarantine signal,
  // never wrong text; HttpSpec proves the JVM path ≡ [[decodeBody]]
  // on identity-encoded payloads over the shared charsets, so the two
  // gears cannot drift.
  // ---------------------------------------------------------------------

  private val CrlfCrlfBytes = Array[Byte]('\r', '\n', '\r', '\n')

  /** Index of the first `\r\n\r\n` in `payload`, or -1 — the BYTE form
    * of [[headerBlockOf]]'s split (HTTP headers are ASCII by grammar,
    * so the byte scan and the Latin-1-view scan find the same offset;
    * one framing rule, two physical paths).
    */
  private[ext] def headerEnd(payload: Array[Byte]): Int = {
    var i = 0
    val last = payload.length - 4
    while (i <= last) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** RFC 9112 §7.1 chunked-coding decode over raw body bytes: hex
    * size line (chunk extensions after `;` dropped), CRLF, size data
    * bytes, CRLF, repeating; a `0` chunk then OPTIONAL trailer header
    * lines until a blank line end the body. Malformed framing —
    * non-hex size, missing CRLF, truncated chunk or trailer, bytes
    * after the terminator — throws `IllegalArgumentException` (the
    * caller quarantines to NULL).
    */
  private[ext] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    def crlfFrom(i: Int): Int = {
      var j = i
      while (j + 1 < body.length) {
        if (body(j) == '\r' && body(j + 1) == '\n') return j
        j += 1
      }
      -1
    }
    while (true) {
      val eol = crlfFrom(pos)
      require(eol >= 0, s"Http.dechunk: chunk-size line without CRLF at byte $pos")
      val line = new String(body, pos, eol - pos, "ISO-8859-1")
      val hex = line.split(";", 2)(0).trim
      require(hex.nonEmpty && hex.forall(c => Character.digit(c, 16) >= 0),
        s"Http.dechunk: malformed chunk size '$hex' at byte $pos")
      val size = java.lang.Long.parseLong(hex, 16)
      require(size <= Int.MaxValue, s"Http.dechunk: chunk size $size too large")
      pos = eol + 2
      if (size == 0) {
        // trailer section: header lines until the blank line
        var done = false
        while (!done) {
          val t = crlfFrom(pos)
          require(t >= 0,
            s"Http.dechunk: trailer section without terminating CRLF at byte $pos")
          done = t == pos // blank line
          pos = t + 2
        }
        require(pos == body.length,
          s"Http.dechunk: ${body.length - pos} bytes after the final chunk")
        return out.toByteArray
      }
      require(pos + size + 2 <= body.length,
        s"Http.dechunk: chunk declares $size bytes but only " +
          s"${body.length - pos} remain at byte $pos")
      out.write(body, pos, size.toInt)
      pos += size.toInt
      require(body(pos) == '\r' && body(pos + 1) == '\n',
        s"Http.dechunk: chunk data not followed by CRLF at byte $pos")
      pos += 2
    }
    out.toByteArray // unreachable
  }

  /** One content-coding decode: gzip rides [[Warc.GzipMemberStream]]
    * (exact accounting, multi-member tolerant — the same core as the
    * `.warc.gz` path, one shared decompressor); deflate accepts the
    * zlib-wrapped form RFC 9110 specifies AND the raw-deflate form
    * real servers ship (tried second). Unknown codings throw (the
    * caller quarantines).
    */
  private[ext] def decodeContentCoding(coding: String,
      body: Array[Byte]): Array[Byte] = coding match {
    case "" | "identity" => body
    case "gzip" | "x-gzip" =>
      require(body.length >= 2 &&
        (body(0) & 0xFF) == 0x1f && (body(1) & 0xFF) == 0x8b,
        "Http: Content-Encoding gzip body lacks the gzip magic")
      Warc.gunzipMembers(body)
    case "deflate" =>
      def inflateWith(raw: Boolean): Array[Byte] = {
        val inf = new java.util.zip.Inflater(raw)
        try {
          inf.setInput(body)
          val out = new java.io.ByteArrayOutputStream(body.length * 4)
          val buf = new Array[Byte](8192)
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n > 0) out.write(buf, 0, n)
            else if (inf.needsInput() || inf.needsDictionary())
              throw new java.util.zip.DataFormatException(
                "truncated deflate body")
          }
          out.toByteArray
        } finally inf.end()
      }
      try inflateWith(raw = false)
      catch { case _: java.util.zip.DataFormatException =>
        inflateWith(raw = true) // raw-deflate servers (the historic IE bug)
      }
    case other =>
      throw new IllegalArgumentException(s"Http: unsupported Content-Encoding '$other'")
  }

  private def headerValue(head: String, name: String): String = {
    val m = java.util.regex.Pattern
      .compile("(?im)^" + name + ":[ \\t]*([^\\r\\n]+)").matcher(head)
    if (m.find()) m.group(1).trim else ""
  }

  private lazy val MetaCharsetRx =
    java.util.regex.Pattern.compile(MetaCharsetPattern)

  /** JVM core of [[decodeBodyFull]] — one payload to `(charset,
    * text-or-null)`. Kept separate so HttpSpec can drive it directly
    * and so the framing rules live in ONE place for both the
    * column gear and any future caller. With `metaFallback` a payload
    * whose HEADER declares no charset is scanned (first 1 KiB of the
    * transfer/content-decoded body, Latin-1 view — the WHATWG
    * prescan) for a `<meta>` charset ([[MetaCharsetPattern]]); the
    * header always wins when both declare. The returned charset is
    * the EFFECTIVE one (header, else meta, else "").
    */
  private[ext] def decodeMessageBody(payload: Array[Byte],
      metaFallback: Boolean = false): (String, String) = {
    val he = headerEnd(payload)
    val head = new String(payload, 0,
      if (he < 0) payload.length else he, "ISO-8859-1")
    val rawBody =
      if (he < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(payload, he + 4, payload.length)
    val headerCs = {
      val m = java.util.regex.Pattern.compile(
        "(?im)^content-type:[^\\r\\n]*;[ \\t]*charset=\"?([^\\r\\n;\" ]+)\"?")
        .matcher(head)
      if (m.find()) m.group(1).toLowerCase else ""
    }
    var csName = headerCs
    try {
      val te = headerValue(head, "Transfer-Encoding").toLowerCase
      val framed = te match {
        case ""        => rawBody
        case "chunked" => dechunk(rawBody)
        case other => throw new IllegalArgumentException(
          s"Http: unsupported Transfer-Encoding '$other'")
      }
      val ce = headerValue(head, "Content-Encoding").toLowerCase
      val decoded = decodeContentCoding(ce, framed)
      if (csName.isEmpty && metaFallback) {
        val view = new String(decoded, 0, math.min(1024, decoded.length),
          "ISO-8859-1")
        val m = MetaCharsetRx.matcher(view)
        if (m.find()) csName = m.group(1).toLowerCase
      }
      val cs = java.nio.charset.Charset.forName(
        if (csName.isEmpty) "UTF-8" else csName)
      // REPLACE on malformed/unmappable — Spark's decode() convention,
      // so the two gears agree byte-for-byte on the shared charsets
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      (csName, dec.decode(java.nio.ByteBuffer.wrap(decoded)).toString)
    } catch {
      // malformed framing, corrupt compression, unknown coding or
      // charset: NULL is the quarantine signal, never wrong text
      case _: IllegalArgumentException | _: java.nio.charset.CharacterCodingException |
           _: java.io.IOException | _: java.util.zip.DataFormatException =>
        (csName, null)
    }
  }

  /** Charset-correct body text honoring `Transfer-Encoding: chunked`
    * and `Content-Encoding: gzip`/`deflate`, with the FULL JRE charset
    * set — the production decode for real crawl archives (see the
    * gear comment above). Input: `(idCol castable to long, payloadCol
    * binary)`. Output: `(idCol, charset, out)` — `charset` as declared
    * (lowercased, empty when undeclared), `out` NULL when any layer is
    * malformed or unsupported. One narrow `mapPartitions` pass, no
    * shuffle; at 100 TB the decode rides the scan like [[Multimodal]]'s
    * codecs.
    */
  def decodeBodyFull(df: DataFrame, idCol: String, payloadCol: String,
      out: String = "body_text", metaFallback: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (cs, text) = decodeMessageBody(payload, metaFallback)
          (id, cs, text)
        }
      }.toDF(idCol, "charset", out)
  }
}
