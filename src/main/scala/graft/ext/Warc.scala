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
    * blobs (the q63 discipline), it never guesses. One framing path:
    * this is [[parseRecordsStream]] over the raw bytes, fully drained.
    */
  def parseRecords(blob: Array[Byte]): Seq[WarcRecord] =
    parseRecordsStream(new java.io.ByteArrayInputStream(blob)).toSeq

  /** STREAMING record parse — the shared framing core of
    * [[parseRecords]] and the gzipped [[parseWarcColumn]] path: records
    * are parsed one at a time as bytes become available, so memory is
    * bounded by the LARGEST RECORD, never the (decompressed) file.
    * That bound is what makes one task per multi-GB `.warc.gz` file
    * sane on a real executor: fused over [[GzipMemberStream]], each
    * record parses as its member decompresses. Byte offsets in error
    * messages are positions in the DECOMPRESSED stream. The iterator
    * is one-record-lookahead lazy: `next()` never reads past the
    * current record's terminator.
    */
  def parseRecordsStream(in: java.io.InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0L
      private var idx = 0
      private var nextRec: WarcRecord = _
      private var done = false
      private val one = new Array[Byte](1)

      private def read1(): Int = {
        val n = in.read(one, 0, 1)
        if (n < 0) -1 else { pos += 1; one(0) & 0xFF }
      }

      private def readLine(firstByte: Int): String = {
        val start = pos - 1
        val sb = new java.lang.StringBuilder(64)
        var b = firstByte
        while (true) {
          if (b < 0) throw new IllegalArgumentException(
            s"Warc: header line without CRLF at byte $start")
          if (b == '\r') {
            val nl = read1()
            if (nl == '\n') return sb.toString
            if (nl < 0) throw new IllegalArgumentException(
              s"Warc: header line without CRLF at byte $start")
            sb.append('\r').append(nl.toChar)
          } else sb.append(b.toChar)
          b = read1()
        }
        "" // unreachable
      }

      private def readFully(buf: Array[Byte], what: String): Unit = {
        var off = 0
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          if (n < 0) throw new IllegalArgumentException(what +
            s" (stream ends after $off of ${buf.length} bytes)")
          off += n
          pos += n
        }
      }

      private def advance(): Unit = {
        val first = read1()
        if (first < 0) { done = true; return }
        val magicAt = pos - 1
        val magic = readLine(first)
        require(magic == "WARC/1.0",
          s"Warc: expected WARC/1.0 magic at byte $magicAt, got '$magic'")
        var warcType = ""
        var uri = ""
        var recordId = ""
        var len = -1L
        var line = readLine(read1())
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
          line = readLine(read1())
        }
        require(len >= 0, s"Warc: record $idx has no Content-Length")
        require(len <= Int.MaxValue,
          s"Warc: record $idx declares $len payload bytes — past the " +
            "2 GiB per-record bound of a byte-array payload column")
        val payload = new Array[Byte](len.toInt)
        readFully(payload, s"Warc: record $idx declares $len payload bytes")
        // record terminator: two CRLFs
        for (_ <- 0 until 2) {
          val c = read1(); val l = if (c == '\r') read1() else -2
          require(c == '\r' && l == '\n',
            s"Warc: record $idx payload not followed by CRLF CRLF at byte ${pos - 2}")
        }
        nextRec = WarcRecord(idx, warcType, uri, recordId, len, payload)
        idx += 1
      }

      override def hasNext: Boolean = {
        if (!done && nextRec == null) advance()
        !done && nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("Warc: past last record")
        val r = nextRec; nextRec = null; r
      }
    }

  /** Streaming decompressor over a concatenation of gzip MEMBERS —
    * the `.warc.gz` layout (one member per record, members simply
    * concatenated so a random-access reader can start at any member
    * boundary) — with EXACT byte accounting: each member's RFC 1952
    * header is parsed by hand, its deflate body inflated with a raw
    * `Inflater` (so compressed consumption is known to the byte), and
    * its trailer's CRC32 + ISIZE verified against the decompressed
    * output. That accounting is what `GZIPInputStream` cannot give:
    * it treats a corrupt next-member header as clean end-of-stream
    * (read() returns -1), silently dropping every remaining record —
    * here, ANY leftover bytes that do not start a valid member throw.
    *
    * Memory: one fixed `Inflater` window — the stream never buffers
    * the decompressed blob, so a consumer like [[parseRecordsStream]]
    * holds at most one record regardless of file size (a real
    * Common-Crawl file is ~1 GB compressed / ~5 GB decompressed;
    * whole-blob buffering caps file parallelism at memory/blob).
    *
    * Truncated or corrupt members throw `IllegalArgumentException`
    * with the decompressed-byte position — the quarantine discipline,
    * never a silent partial parse.
    */
  private[ext] final class GzipMemberStream(blob: Array[Byte])
      extends java.io.InputStream {
    private var pos = 0 // next unconsumed COMPRESSED byte
    private var inflater: java.util.zip.Inflater = _
    private val crc = new java.util.zip.CRC32
    private var memberOut = 0L // decompressed bytes of the current member
    private var totalOut = 0L  // decompressed bytes overall (for errors)
    private val one = new Array[Byte](1)

    /** Compressed bytes consumed so far (member-granular: a member's
      * bytes count once its header is parsed). Exposed for the
      * laziness pin in WarcSpec.
      */
    private[ext] def compressedConsumed: Int = pos

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"Warc.gunzipMembers: $msg after $totalOut decompressed bytes")

    private def u8(i: Int): Int = {
      if (i >= blob.length) fail("truncated gzip member header")
      blob(i) & 0xFF
    }

    /** Parse one RFC 1952 member header at `pos`, leaving `pos` at the
      * first deflate byte and the inflater primed.
      */
    private def startMember(): Unit = {
      if (u8(pos) != 0x1f || u8(pos + 1) != 0x8b)
        fail(s"${blob.length - pos} trailing bytes do not start a gzip member")
      if (u8(pos + 2) != 8) fail(s"unsupported compression method ${u8(pos + 2)}")
      val flg = u8(pos + 3)
      var p = pos + 10 // past MTIME(4) XFL(1) OS(1)
      if ((flg & 4) != 0) p += 2 + (u8(p) | (u8(p + 1) << 8)) // FEXTRA
      if ((flg & 8) != 0) { while (u8(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (u8(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC (header CRC16 — not verified)
      if (p > blob.length) fail("truncated gzip member header")
      pos = p
      inflater = new java.util.zip.Inflater(true) // raw deflate
      inflater.setInput(blob, pos, blob.length - pos)
      crc.reset()
      memberOut = 0L
    }

    /** Verify the 8-byte trailer of the member that just finished and
      * release its inflater.
      */
    private def finishMember(): Unit = {
      // exact compressed consumption: everything we handed to setInput
      // minus what the finished inflater left untouched
      pos = blob.length - inflater.getRemaining
      inflater.end()
      inflater = null
      if (pos + 8 > blob.length) fail("truncated gzip member trailer")
      def le32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
          (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
      val gotCrc = le32(pos)
      val gotIsize = le32(pos + 4)
      if (gotCrc != crc.getValue)
        fail(f"member CRC32 mismatch (trailer $gotCrc%08x, data ${crc.getValue}%08x)")
      if (gotIsize != (memberOut & 0xFFFFFFFFL))
        fail(s"member ISIZE mismatch (trailer $gotIsize, data $memberOut)")
      pos += 8
    }

    override def read(): Int = {
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xFF
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (inflater == null) {
          if (pos >= blob.length) return -1
          startMember()
        }
        val n =
          try inflater.inflate(b, off, len)
          catch {
            case e: java.util.zip.DataFormatException =>
              fail(s"corrupt deflate data (${e.getMessage})")
          }
        if (n > 0) {
          crc.update(b, off, n)
          memberOut += n
          totalOut += n
          return n
        }
        if (inflater.finished()) finishMember() // then loop: next member or EOF
        else if (inflater.needsInput())
          fail("truncated gzip member") // we handed it ALL remaining bytes
      }
      -1 // unreachable
    }
  }

  /** Decompress a (possibly multi-member) gzip stream to its full
    * concatenated payload — the buffered convenience form of
    * [[GzipMemberStream]] (which [[parseWarcColumn]] uses streaming,
    * never buffering the blob): the decompressed concatenation is
    * byte-identical to the uncompressed WARC, so [[parseRecords]]'
    * Content-Length contract applies unchanged to the result.
    *
    * Truncated members, CRC/length mismatches, and trailing bytes
    * that do not start a valid member ALL throw — the quarantine
    * discipline, never a silent partial parse (`GZIPInputStream`
    * would silently drop every record after mid-stream corruption).
    */
  def gunzipMembers(blob: Array[Byte]): Array[Byte] = {
    require(blob.length >= 2 &&
      (blob(0) & 0xFF) == 0x1f && (blob(1) & 0xFF) == 0x8b,
      "Warc.gunzipMembers: payload does not start with the gzip magic " +
        "(1f 8b) — already-uncompressed WARCs go through parseRecords directly")
    val in = new GzipMemberStream(blob)
    val out = new java.io.ByteArrayOutputStream(blob.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // WARC WRITING — the output side of the container: a pipeline that
  // re-shards, filters, or re-crawls needs to EMIT `.warc(.gz)` blobs,
  // not only read them, and a writer that drifts from the reader's
  // framing silently poisons every downstream archive. One framing
  // contract, both directions: [[buildRecordBytes]] emits exactly what
  // [[parseRecordsStream]] consumes (WarcSpec pins the round trip
  // byte-for-byte), and the gzipped layout is one member per record —
  // the random-access property real crawl archives rely on.
  // ---------------------------------------------------------------------

  /** Serialize ONE record: `WARC/1.0` magic, the four headers the
    * reader frames by, blank line, exactly `payload.length` bytes,
    * CRLF CRLF terminator. Headers encode as ISO-8859-1 — the byte
    * form [[parseRecordsStream]]'s Latin-1 line reader inverts
    * exactly; header values containing CR/LF (framing corruption) or
    * characters past 0xFF (not Latin-1-encodable — real WARC writers
    * percent-encode URIs to ASCII first) throw rather than emit a
    * blob the reader would misparse. `Content-Length` counts BYTES
    * (the multibyte pin shared with the reader).
    */
  def buildRecordBytes(warcType: String, targetUri: String,
      recordId: String, payload: Array[Byte]): Array[Byte] = {
    require(payload != null, "Warc.buildRecordBytes: null payload")
    Seq("WARC-Type" -> warcType, "WARC-Target-URI" -> targetUri,
        "WARC-Record-ID" -> recordId).foreach { case (k, v) =>
      require(v != null && !v.exists(c => c == '\r' || c == '\n'),
        s"Warc.buildRecordBytes: $k value contains CR/LF or is null")
      require(v.forall(_ <= 0xFF),
        s"Warc.buildRecordBytes: $k value is not Latin-1-encodable " +
          "(percent-encode URIs to ASCII first)")
    }
    val head = s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
      s"WARC-Target-URI: $targetUri\r\nWARC-Record-ID: $recordId\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    val headBytes = head.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](headBytes.length + payload.length + 4)
    System.arraycopy(headBytes, 0, out, 0, headBytes.length)
    System.arraycopy(payload, 0, out, headBytes.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One gzip MEMBER (RFC 1952) of `bytes` — the `.warc.gz` unit:
    * members concatenate into a random-access archive. `close()` ends
    * the native Deflater deterministically (the q214 leak pin).
    */
  private[ext] def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Assemble a frame of records into one WARC blob per `idCol` —
    * the inverse of [[parseWarcColumn]]: records group on the blob id
    * (ONE shuffle — the re-shard every archive writer pays, with
    * map-side partial collect), order by `ordCol` inside the group
    * (`sort_array` on the collected structs — collect order is
    * partition-nondeterministic, the blob must not be), then a narrow
    * mapPartitions serializes each group. With `gzipped = true` every
    * record becomes its own gzip member (the random-access `.warc.gz`
    * layout [[GzipMemberStream]] consumes). Memory per task is one
    * blob's records — the writer-side mirror of the reader's
    * one-record bound; callers size blobs accordingly (crawl archives
    * target ~1 GB compressed). `ordCol` must be unique within an id —
    * ties would fall through to comparing the later struct fields
    * (payload bytes included), an order nobody intended.
    *
    * Output: one row per id — (idCol long, `warc_blob` binary).
    */
  /** WARC revisit-record assignment — the payload-digest dedup web
    * archives run across crawl snapshots (WARC 1.1 `revisit` records
    * with `WARC-Refers-To`): of all captures sharing one payload
    * digest, the FIRST (by capture time, then URL for determinism)
    * stays a full `response` record; every later capture becomes a
    * `revisit` stub pointing at it. Identity is the PAYLOAD, not the
    * URL — a mirror page on a different host revisits the original,
    * and a URL whose content changed between crawls stores both
    * versions. Digest is md5 (the engine's portable-digest choice;
    * production archives use sha1 — same mechanics, different
    * constant).
    *
    * Plan: one window over the digest key — one hash exchange, no
    * join, no self-pairing; a digest shared by millions of captures
    * is partition skew on that key, never a pairwise blow-up.
    *
    * Emits every capture row + `payload_digest`, `record_type`
    * (`response`/`revisit`), and `refers_to_url`/`refers_to_ts`
    * (NULL on originals).
    */
  def revisitRecords(captures: DataFrame, urlCol: String, tsCol: String,
      payloadCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val internal = Seq("payload_digest", "record_type", "refers_to_url",
      "refers_to_ts", "_rn")
    val clash = captures.columns.filter(internal.contains)
    require(clash.isEmpty, s"Warc.revisitRecords: input already has " +
      s"column(s) ${clash.mkString(", ")} — rename them first")
    val w = Window.partitionBy(col("payload_digest"))
      .orderBy(col(tsCol), col(urlCol))
    captures.withColumn("payload_digest", md5(col(payloadCol)))
      .withColumn("_rn", row_number().over(w))
      .withColumn("record_type",
        when(col("_rn") === 1, lit("response")).otherwise(lit("revisit")))
      .withColumn("refers_to_url",
        when(col("_rn") > 1, first(col(urlCol)).over(w)))
      .withColumn("refers_to_ts",
        when(col("_rn") > 1, first(col(tsCol)).over(w)))
      .drop("_rn")
  }

  def buildWarcColumn(df: DataFrame, idCol: String, ordCol: String,
      typeCol: String, uriCol: String, recIdCol: String,
      payloadCol: String, gzipped: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("warc_blob", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    groupedRecords(df, idCol, ordCol, typeCol, uriCol, recIdCol, payloadCol)
      .mapPartitions { it =>
        it.map { row =>
          val bos = new java.io.ByteArrayOutputStream()
          row.getSeq[Row](1).foreach { r =>
            val rec = buildRecordBytes(r.getString(1), r.getString(2),
              r.getString(3), r.getAs[Array[Byte]](4))
            bos.write(if (gzipped) gzipMember(rec) else rec)
          }
          Row(row.getLong(0), bos.toByteArray)
        }
      }(enc)
  }

  private def groupedRecords(df: DataFrame, idCol: String, ordCol: String,
      typeCol: String, uriCol: String, recIdCol: String,
      payloadCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(col(idCol).cast("long").as(idCol))
      .agg(sort_array(collect_list(struct(
        col(ordCol).cast("long").as("o"),
        col(typeCol).as("t"), col(uriCol).as("u"),
        col(recIdCol).as("r"), col(payloadCol).as("p")))).as("_recs"))
  }

  /** [[buildWarcColumn]] with a CDX-style per-record index — the
    * random-access companion every real web archive ships beside its
    * `.warc.gz` files (Common Crawl's CDXJ): because the gzipped
    * layout is one MEMBER per record, a reader can fetch one record
    * with one ranged read of `length` bytes at `offset` and one
    * member decompression — no scan of the file. Gzipped only (the
    * layout that makes the index useful). The index rides the blob
    * row as `cdx: array<struct<target_uri, rec_idx, offset, length,
    * digest>>` — offsets are COMPRESSED byte positions in
    * `warc_blob`, `digest` is the payload's md5 hex (the CDX content
    * digest, dedup's cheap first pass). Same one-shuffle plan as the
    * writer; the index falls out of the serialization loop for free.
    */
  def buildWarcColumnIndexed(df: DataFrame, idCol: String, ordCol: String,
      typeCol: String, uriCol: String, recIdCol: String,
      payloadCol: String): DataFrame = {
    val cdxType = ArrayType(StructType(Seq(
      StructField("target_uri", StringType, nullable = false),
      StructField("rec_idx", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("length", LongType, nullable = false),
      StructField("digest", StringType, nullable = false))),
      containsNull = false)
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("warc_blob", BinaryType, nullable = false),
      StructField("cdx", cdxType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    groupedRecords(df, idCol, ordCol, typeCol, uriCol, recIdCol, payloadCol)
      .mapPartitions { it =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        it.map { row =>
          val bos = new java.io.ByteArrayOutputStream()
          val cdx = Seq.newBuilder[Row]
          row.getSeq[Row](1).zipWithIndex.foreach { case (r, i) =>
            val payload = r.getAs[Array[Byte]](4)
            val member = gzipMember(buildRecordBytes(r.getString(1),
              r.getString(2), r.getString(3), payload))
            val offset = bos.size().toLong
            bos.write(member)
            md5.reset()
            val digest = md5.digest(payload)
              .map(b => f"${b & 0xFF}%02x").mkString
            cdx += Row(r.getString(2), i, offset, member.length.toLong, digest)
          }
          Row(row.getLong(0), bos.toByteArray, cdx.result())
        }
      }(enc)
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
    * layout) and parses STREAMING — [[parseRecordsStream]] fused over
    * [[GzipMemberStream]], each record framed as its member
    * decompresses, so per-task memory is bounded by the largest
    * RECORD (compressed blob + one payload), never the decompressed
    * file: one task per multi-GB crawl file stays executor-sane. The
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
        val records =
          if (gzipped) {
            require(raw.length >= 2 &&
              (raw(0) & 0xFF) == 0x1f && (raw(1) & 0xFF) == 0x8b,
              "Warc.parseWarcColumn: gzipped=true but the blob does not " +
                "start with the gzip magic (1f 8b)")
            parseRecordsStream(new GzipMemberStream(raw))
          } else parseRecordsStream(new java.io.ByteArrayInputStream(raw))
        records.map(r =>
          Row(id, r.recIdx, r.warcType, r.targetUri, r.recordId,
            r.contentLength, r.payload))
      }
    }(enc)
  }
}
