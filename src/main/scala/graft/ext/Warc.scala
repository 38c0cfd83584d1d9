package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) record parsing — the container format web crawls
  * actually arrive in: each fetched page is a record of CRLF header
  * lines (`WARC/1.0`, `WARC-Type`, `WARC-Target-URI`,
  * `Content-Length`, …), a blank line, then EXACTLY `Content-Length`
  * payload bytes, then a blank-line separator. The payload routinely
  * CONTAINS header-looking text (an archived page quoting a WARC, an
  * HTTP response embedding `WARC/1.0`), so the only correct framing
  * is length-driven: count the declared bytes, never scan for the
  * next magic string. That hazard is planted in the q213 gate fixture
  * and HtmlSpec-style pinned here.
  *
  * Reference scope: the reference
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py`)
  * ingests one CSV; WARC is §8.2 extension surface — the source
  * format upstream of [[Html]]/[[Urls]], sibling of the CSV (q44) and
  * JSONL (q196) ingest tiers.
  *
  * Scale shape: one WARC blob parses independently of every other —
  * the parser runs inside `mapPartitions` (the [[Multimodal]] decoder
  * discipline), so at 100 TB the cost parallelizes with the scan and
  * nothing shuffles until whatever the caller aggregates. Payload
  * lengths are honored in BYTES (the spec's multibyte pin): a UTF-8
  * payload's char count and byte count differ, and a char-counting
  * parser desynchronizes on the first non-ASCII page and misparses
  * every record after it.
  */
object Warc {

  final case class WarcRecord(recIdx: Int, warcType: String,
      targetUri: String, recordId: String, contentLength: Long,
      payload: Array[Byte])


  /** Parse every record in one WARC blob. Framing errors (bad magic,
    * missing Content-Length, truncated payload, missing separator)
    * throw with the byte offset — a crawl pipeline quarantines such
    * blobs (the q63 discipline), it never guesses.
    */
  def parseRecords(blob: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    def readLine(): String = {
      val start = pos
      while (pos + 1 < blob.length &&
        !(blob(pos) == '\r' && blob(pos + 1) == '\n')) pos += 1
      require(pos + 1 < blob.length,
        s"Warc: header line without CRLF at byte $start")
      val line = new String(blob, start, pos - start, "UTF-8")
      pos += 2
      line
    }
    while (pos < blob.length) {
      val magic = readLine()
      require(magic == "WARC/1.0",
        s"Warc: expected WARC/1.0 magic at byte ${pos - magic.length - 2}, got '$magic'")
      var warcType = ""
      var uri = ""
      var recordId = ""
      var len = -1L
      var line = readLine()
      while (line.nonEmpty) {
        val sep = line.indexOf(':')
        require(sep > 0, s"Warc: malformed header line '$line'")
        val (k, v) = (line.substring(0, sep).trim, line.substring(sep + 1).trim)
        k.toLowerCase match {
          case "warc-type"       => warcType = v
          case "warc-target-uri" => uri = v
          case "warc-record-id"  => recordId = v
          case "content-length"  => len = v.toLong
          case _                 => () // tolerated: unknown headers are legal
        }
        line = readLine()
      }
      require(len >= 0, s"Warc: record $idx has no Content-Length")
      require(pos + len <= blob.length,
        s"Warc: record $idx declares $len payload bytes but only " +
          s"${blob.length - pos} remain")
      val payload = java.util.Arrays.copyOfRange(blob, pos, pos + len.toInt)
      pos += len.toInt
      // record terminator: two CRLFs
      for (_ <- 0 until 2) {
        require(pos + 2 <= blob.length &&
          blob(pos) == '\r' && blob(pos + 1) == '\n',
          s"Warc: record $idx payload not followed by CRLF CRLF at byte $pos")
        pos += 2
      }
      out += WarcRecord(idx, warcType, uri, recordId, len, payload)
      idx += 1
    }
    out.result()
  }

  /** Decompress a (possibly multi-member) gzip stream to its full
    * concatenated payload — the framing real crawl archives use:
    * a `.warc.gz` file is one gzip MEMBER per record, members simply
    * concatenated, so a random-access reader can start at any member
    * boundary. `GZIPInputStream` reads consecutive members natively
    * when given enough lookahead, and the decompressed concatenation
    * is byte-identical to the uncompressed WARC, so [[parseRecords]]'
    * Content-Length contract applies unchanged to the result.
    *
    * Truncated members throw (EOFException surfaced with context) —
    * the quarantine discipline, never a silent partial parse.
    */
  def gunzipMembers(blob: Array[Byte]): Array[Byte] = {
    require(blob.length >= 2 &&
      (blob(0) & 0xFF) == 0x1f && (blob(1) & 0xFF) == 0x8b,
      "Warc.gunzipMembers: payload does not start with the gzip magic " +
        "(1f 8b) — already-uncompressed WARCs go through parseRecords directly")
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(blob), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(blob.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch {
      // EOFException = cut mid-stream; ZipException = corrupt bytes —
      // both are a truncated/damaged member to a crawl pipeline
      case e: java.io.IOException =>
        throw new IllegalArgumentException(
          s"Warc.gunzipMembers: truncated gzip member after " +
            s"${out.size} decompressed bytes: ${e.getMessage}", e)
    } finally in.close()
    out.toByteArray
  }

  private val recordSchema = StructType(Seq(
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Explode a frame of `(idCol long, blobCol binary)` WARC blobs into
    * one row per record: (idCol, rec_idx, warc_type, target_uri,
    * record_id, content_length, payload). One narrow `mapPartitions`
    * pass, no shuffle. With `gzipped = true` each blob is a
    * concatenation of per-record gzip members (the `.warc.gz` crawl
    * layout) and is decompressed via [[gunzipMembers]] first — the
    * decompression runs inside the same partition-local pass, so the
    * scale shape is unchanged.
    */
  def parseWarcColumn(df: DataFrame, idCol: String, blobCol: String,
      gzipped: Boolean = false): DataFrame = {
    val schema = StructType(StructField(idCol, LongType, nullable = false) +:
      recordSchema.fields.toSeq)
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    df.select(df(idCol).cast("long"), df(blobCol)).mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val raw = row.getAs[Array[Byte]](1)
        val bytes = if (gzipped) gunzipMembers(raw) else raw
        parseRecords(bytes).map(r =>
          Row(id, r.recIdx, r.warcType, r.targetUri, r.recordId,
            r.contentLength, r.payload))
      }
    }(enc)
  }
}
