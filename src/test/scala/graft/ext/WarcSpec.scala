package graft.ext

import graft.SparkSpec

/** Pins for [[Warc]] — what the q213 oracle cannot see: byte-exact
  * Content-Length framing with MULTIBYTE payloads (the gate fixture
  * is ASCII so chars == bytes there), zero-length payloads, unknown
  * headers, and the named framing errors.
  */
class WarcSpec extends SparkSpec {

  private def rec(headers: Seq[String], payload: Array[Byte]): Array[Byte] = {
    val head = ("WARC/1.0" +: headers :+
      s"Content-Length: ${payload.length}").mkString("", "\r\n", "\r\n\r\n")
    head.getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  test("length framing is BYTES: a multibyte payload does not desynchronize") {
    // 'é' is 2 UTF-8 bytes but 1 char — a char-counting parser would
    // leave one byte behind and misparse record 2's magic
    val p1 = "héllo wörld".getBytes("UTF-8")
    val p2 = "plain".getBytes("US-ASCII")
    val blob = rec(Seq("WARC-Type: response", "WARC-Target-URI: http://a/1"), p1) ++
      rec(Seq("WARC-Type: request", "WARC-Target-URI: http://a/2"), p2)
    val rs = Warc.parseRecords(blob)
    assert(rs.map(_.targetUri) === Seq("http://a/1", "http://a/2"))
    assert(new String(rs(0).payload, "UTF-8") === "héllo wörld")
    assert(rs(0).contentLength === p1.length.toLong)
    assert(rs(1).warcType === "request")
  }

  test("payload containing a fake WARC header parses as opaque bytes") {
    val evil = "x\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\ny".getBytes("US-ASCII")
    val rs = Warc.parseRecords(
      rec(Seq("WARC-Type: response"), evil) ++
        rec(Seq("WARC-Type: request"), "tail".getBytes("US-ASCII")))
    assert(rs.size === 2)
    assert(new String(rs(0).payload, "US-ASCII").contains("WARC-Type: fake"))
    assert(rs(1).warcType === "request")
  }

  test("zero-length payloads and unknown headers are legal") {
    val rs = Warc.parseRecords(rec(
      Seq("WARC-Type: metadata", "X-Custom-Header: kept-but-ignored",
        "WARC-Record-ID: <urn:uuid:0>"), Array.emptyByteArray))
    assert(rs.size === 1)
    assert(rs.head.contentLength === 0L)
    assert(rs.head.recordId === "<urn:uuid:0>")
  }

  test("framing errors are loud and named") {
    val e1 = intercept[IllegalArgumentException](
      Warc.parseRecords("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII")))
    assert(e1.getMessage.contains("expected WARC/1.0 magic"))
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes("US-ASCII")
    val e2 = intercept[IllegalArgumentException](Warc.parseRecords(noLen))
    assert(e2.getMessage.contains("no Content-Length"))
    val truncated = "WARC/1.0\r\nContent-Length: 99\r\n\r\nshort".getBytes("US-ASCII")
    val e3 = intercept[IllegalArgumentException](Warc.parseRecords(truncated))
    assert(e3.getMessage.contains("declares 99 payload bytes"))
    val noSep = ("WARC/1.0\r\nContent-Length: 2\r\n\r\nab" +
      "WARC/1.0\r\n").getBytes("US-ASCII")
    val e4 = intercept[IllegalArgumentException](Warc.parseRecords(noSep))
    assert(e4.getMessage.contains("not followed by CRLF CRLF"))
  }

  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  test("gunzipMembers: concatenated per-record members decompress to the full WARC") {
    // the .warc.gz layout: one gzip member PER record, members simply
    // concatenated — a single-member reader would stop after record 0
    val r1 = rec(Seq("WARC-Type: response", "WARC-Target-URI: http://a/1"),
      "one".getBytes("US-ASCII"))
    val r2 = rec(Seq("WARC-Type: request", "WARC-Target-URI: http://a/2"),
      "héllo".getBytes("UTF-8")) // multibyte survives compression framing
    val blob = gzMember(r1) ++ gzMember(r2)
    val rs = Warc.parseRecords(Warc.gunzipMembers(blob))
    assert(rs.map(_.targetUri) === Seq("http://a/1", "http://a/2"))
    assert(new String(rs(1).payload, "UTF-8") === "héllo")
  }

  test("gunzipMembers: truncated member and non-gzip input are loud") {
    val whole = gzMember(rec(Seq("WARC-Type: response"), "abcdefgh".getBytes))
    val e1 = intercept[IllegalArgumentException](
      Warc.gunzipMembers(whole.dropRight(6))) // cut inside the trailer
    assert(e1.getMessage.contains("truncated gzip member"))
    val e2 = intercept[IllegalArgumentException](
      Warc.gunzipMembers("WARC/1.0\r\n".getBytes("US-ASCII")))
    assert(e2.getMessage.contains("gzip magic"))
  }

  test("streaming gzip parse is byte-identical to the buffered path") {
    val recs = (0 until 5).map(i => rec(
      Seq(s"WARC-Type: response", s"WARC-Target-URI: http://a/$i"),
      (s"payload $i " + "x" * (i * 7)).getBytes("UTF-8")))
    val blob = recs.map(gzMember).reduce(_ ++ _)
    val streamed = Warc.parseRecordsStream(new Warc.GzipMemberStream(blob)).toSeq
    val buffered = Warc.parseRecords(Warc.gunzipMembers(blob))
    assert(streamed.map(_.targetUri) === buffered.map(_.targetUri))
    assert(streamed.zip(buffered).forall { case (a, b) =>
      java.util.Arrays.equals(a.payload, b.payload) &&
        a.contentLength == b.contentLength && a.recIdx == b.recIdx })
  }

  test("streaming gzip parse is LAZY: one record never drains the file") {
    // the memory contract: next() consumes only the current record's
    // member(s), so a multi-GB .warc.gz never buffers decompressed —
    // pinned by compressed-consumption position after the first record
    val recs = (0 until 4).map(i => rec(
      Seq("WARC-Type: response", s"WARC-Target-URI: http://a/$i"),
      ("y" * 2000).getBytes("US-ASCII")))
    val blob = recs.map(gzMember).reduce(_ ++ _)
    val in = new Warc.GzipMemberStream(blob)
    val it = Warc.parseRecordsStream(in)
    assert(it.next().targetUri === "http://a/0")
    assert(in.compressedConsumed < blob.length / 2,
      s"first record consumed ${in.compressedConsumed} of ${blob.length} " +
        "compressed bytes — the parse is draining ahead of the iterator")
    assert(it.toSeq.size === 3) // and the rest still parses
  }

  test("gunzipMembers: inter-member corruption and trailing garbage are LOUD") {
    // GZIPInputStream's failure mode: corrupt bytes between members
    // read as clean EOF, silently dropping every remaining record —
    // the exact-accounting decompressor must throw instead
    val r1 = gzMember(rec(Seq("WARC-Type: response"), "one".getBytes))
    val r2 = gzMember(rec(Seq("WARC-Type: request"), "two".getBytes))
    val garbageBetween = r1 ++ "GARBAGE!".getBytes("US-ASCII") ++ r2
    val e1 = intercept[IllegalArgumentException](
      Warc.gunzipMembers(garbageBetween))
    assert(e1.getMessage.contains("do not start a gzip member"))
    val garbageAfter = r1 ++ Array[Byte](0x1f, 0x00, 0x00)
    val e2 = intercept[IllegalArgumentException](
      Warc.gunzipMembers(garbageAfter))
    assert(e2.getMessage.contains("do not start a gzip member") ||
      e2.getMessage.contains("truncated gzip member"))
    // a flipped trailer CRC byte is named, not absorbed
    val flipped = r1.clone()
    flipped(flipped.length - 5) = (flipped(flipped.length - 5) ^ 0x01).toByte
    val e3 = intercept[IllegalArgumentException](Warc.gunzipMembers(flipped))
    assert(e3.getMessage.contains("CRC32 mismatch"))
  }

  test("parseWarcColumn gzipped=true parses member-per-record blobs") {
    import spark.implicits._
    val blob = gzMember(rec(Seq("WARC-Type: response", "WARC-Target-URI: u1"),
        "p1".getBytes("US-ASCII"))) ++
      gzMember(rec(Seq("WARC-Type: request", "WARC-Target-URI: u2"),
        "p2".getBytes("US-ASCII")))
    val df = Seq((3L, blob)).toDF("doc_id", "blob")
    val got = Warc.parseWarcColumn(df, "doc_id", "blob", gzipped = true)
      .orderBy("rec_idx")
      .collect().map(r => (r.getInt(1), r.getString(3))).toSeq
    assert(got === Seq((0, "u1"), (1, "u2")))
  }

  test("parseWarcColumn explodes blobs distributively with ids attached") {
    import spark.implicits._
    val blob = rec(Seq("WARC-Type: response", "WARC-Target-URI: u1"),
      "p1".getBytes("US-ASCII")) ++
      rec(Seq("WARC-Type: request", "WARC-Target-URI: u2"),
        "p2".getBytes("US-ASCII"))
    val df = Seq((7L, blob)).toDF("doc_id", "blob")
    val got = Warc.parseWarcColumn(df, "doc_id", "blob")
      .orderBy("rec_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), new String(r.getAs[Array[Byte]]("payload"), "UTF-8")))
    assert(got.toSeq === Seq(
      (7L, 0, "response", "u1", "p1"), (7L, 1, "request", "u2", "p2")))
  }

  test("buildRecordBytes round-trips through parseRecords byte-exactly") {
    // multibyte payload (Content-Length counts BYTES) carrying an
    // embedded WARC/1.0 magic (length-driven framing hazard)
    val payload = "café WARC/1.0\r\nWARC-Type: fake\r\n\r\nstill payload é"
      .getBytes("UTF-8")
    val bytes = Warc.buildRecordBytes("response", "http://x.com/p",
      "<urn:uuid:1>", payload) ++
      Warc.buildRecordBytes("request", "http://x.com/q", "<urn:uuid:2>",
        Array.emptyByteArray)
    val recs = Warc.parseRecords(bytes)
    assert(recs.map(r => (r.recIdx, r.warcType, r.targetUri, r.recordId,
      r.contentLength)) === Seq(
      (0, "response", "http://x.com/p", "<urn:uuid:1>", payload.length.toLong),
      (1, "request", "http://x.com/q", "<urn:uuid:2>", 0L)))
    assert(java.util.Arrays.equals(recs.head.payload, payload))
  }

  test("buildRecordBytes refuses header values the reader would misparse") {
    val p = "x".getBytes("US-ASCII")
    val crlf = intercept[IllegalArgumentException](
      Warc.buildRecordBytes("response", "http://x.com/\r\nInjected: 1",
        "<urn:uuid:1>", p))
    assert(crlf.getMessage.contains("CR/LF"))
    val wide = intercept[IllegalArgumentException](
      Warc.buildRecordBytes("response", "http://東京.jp/p", "<urn:uuid:1>", p))
    assert(wide.getMessage.contains("Latin-1"))
    val np = intercept[IllegalArgumentException](
      Warc.buildRecordBytes("response", "http://x.com", "<urn:uuid:1>", null))
    assert(np.getMessage.contains("null payload"))
  }

  test("buildWarcColumnIndexed: each cdx entry slices a standalone member") {
    import spark.implicits._
    val recs = Seq(
      (9L, 0L, "response", "u0", "<r0>", "first é".getBytes("UTF-8")),
      (9L, 1L, "response", "u1", "<r1>", "second".getBytes("UTF-8")),
      (9L, 2L, "request", "u2", "<r2>", Array.emptyByteArray))
      .toDF("doc_id", "ord", "t", "u", "r", "p")
    val out = Warc.buildWarcColumnIndexed(recs, "doc_id", "ord", "t", "u",
      "r", "p").collect().head
    val blob = out.getAs[Array[Byte]]("warc_blob")
    val cdx = out.getSeq[org.apache.spark.sql.Row](2)
    assert(cdx.map(r => (r.getString(0), r.getInt(1))) ===
      Seq(("u0", 0), ("u1", 1), ("u2", 2)))
    // offsets tile the blob exactly: contiguous, gap-free, full cover
    val spans = cdx.map(r => (r.getLong(2), r.getLong(3)))
    assert(spans.head._1 === 0L)
    spans.sliding(2).foreach { case Seq((o1, l1), (o2, _)) =>
      assert(o1 + l1 === o2)
    case _ => ()
    }
    assert(spans.last._1 + spans.last._2 === blob.length.toLong)
    // every slice parses standalone and byte-matches its payload
    val payloads = Seq("first é".getBytes("UTF-8"), "second".getBytes("UTF-8"),
      Array.emptyByteArray)
    cdx.zip(payloads).foreach { case (e, expected) =>
      val member = java.util.Arrays.copyOfRange(blob,
        e.getLong(2).toInt, (e.getLong(2) + e.getLong(3)).toInt)
      val rec = Warc.parseRecords(Warc.gunzipMembers(member))
      assert(rec.size === 1)
      assert(rec.head.targetUri === e.getString(0))
      assert(java.util.Arrays.equals(rec.head.payload, expected))
      // digest is the payload md5 (the CDX content-digest contract)
      val md5 = java.security.MessageDigest.getInstance("MD5")
      assert(e.getString(4) ===
        md5.digest(expected).map(b => f"${b & 0xFF}%02x").mkString)
    }
  }

  test("buildWarcColumn orders records by ordCol and round-trips gzipped") {
    import spark.implicits._
    // records arrive SHUFFLED; the blob must come out in ord order
    val recs = Seq(
      (5L, 1L, "request", "u1", "<r1>", "b".getBytes("UTF-8")),
      (5L, 0L, "response", "u0", "<r0>", "a é".getBytes("UTF-8")),
      (6L, 0L, "response", "u2", "<r2>", "c".getBytes("UTF-8")))
      .toDF("doc_id", "ord", "t", "u", "r", "p")
    for (gz <- Seq(true, false)) {
      val blob = Warc.buildWarcColumn(recs, "doc_id", "ord", "t", "u", "r",
        "p", gzipped = gz)
      val back = Warc.parseWarcColumn(blob, "doc_id", "warc_blob",
          gzipped = gz)
        .orderBy("doc_id", "rec_idx")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3),
          new String(r.getAs[Array[Byte]]("payload"), "UTF-8")))
      assert(back.toSeq === Seq((5L, 0, "u0", "a é"), (5L, 1, "u1", "b"),
        (6L, 0, "u2", "c")), s"gzipped=$gz")
    }
  }
}
