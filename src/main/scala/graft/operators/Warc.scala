package graft.operators

/** WARC (ISO 28500) + gzip — the actual on-disk shape of a web crawl:
  * CommonCrawl ships WARC/WET files as concatenated gzip members, one
  * record per member. This is the FIRST step of every pipeline that
  * consumes a crawl, before HTML extraction even starts.
  *
  *  - gzip: the JDK's Inflater/GZIPInputStream — a REAL DEFLATE
  *    decode with header parsing and CRC32 verification (the same
  *    zlib machinery [[PngPixels]] proves on IDAT), multi-member
  *    streams supported, output capped before allocation.
  *  - WARC: the version-line + named-headers + Content-Length block
  *    grammar, records walked sequentially with exact byte accounting
  *    (a Content-Length slip desynchronizes every later record, so
  *    the parse is a validator, not a sniff).
  *
  * Pure `Array[Byte] => Option[...]` kernels; dirty bytes → None. */
object Warc {

  final case class Record(
      recType: String, targetUri: String, contentLength: Long,
      payload: Array[Byte])

  // ---------------------------------------------------------------- gzip

  def isGzip(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 &&
      (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Decompress a (possibly multi-member) gzip stream; None on dirty
    * bytes, CRC mismatch, or output beyond the shared decode cap. */
  def gunzip(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (!isGzip(bytes)) return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > PngPixels.MaxDecodedBytes) return None
        n = in.read(buf)
      }
      in.close()
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Canonical single-member gzip of given bytes (JDK Deflater via
    * GZIPOutputStream) — fixtures and round-trip specs. */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(bytes, 0, bytes.length)
    out.close()
    bos.toByteArray
  }

  // ---------------------------------------------------------------- warc

  /** Parse a WARC file: sequential records, each a `WARC/1.x` version
    * line, CRLF-separated headers, an exact Content-Length payload
    * block, and the two record-separator CRLFs. None on any grammar
    * violation. */
  def parse(bytes: Array[Byte]): Option[Vector[Record]] = {
    try parse0(bytes)
    catch { case _: Exception => None }
  }

  private def parse0(b: Array[Byte]): Option[Vector[Record]] = {
    if (b == null || b.length < 10) return None
    val out = Vector.newBuilder[Record]
    var pos = 0
    var count = 0
    while (pos < b.length) {
      // version line
      val vEnd = lineEnd(b, pos)
      if (vEnd < 0) return None
      val version = new String(b, pos, vEnd - pos, "US-ASCII")
      if (!version.startsWith("WARC/1.")) return None
      pos = vEnd + 2
      // headers until empty line
      var recType = ""; var uri = ""; var len = -1L
      var done = false
      while (!done) {
        val hEnd = lineEnd(b, pos)
        if (hEnd < 0) return None
        if (hEnd == pos) { done = true; pos += 2 }
        else {
          val line = new String(b, pos, hEnd - pos, "UTF-8")
          val colon = line.indexOf(':')
          if (colon <= 0) return None
          val key = line.substring(0, colon).trim
          val value = line.substring(colon + 1).trim
          key.toLowerCase(java.util.Locale.ROOT) match {
            case "warc-type" => recType = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              if (!value.forall(_.isDigit) || value.length > 12) return None
              len = value.toLong
            case _ => () // other headers (record-id, date, ...) skipped
          }
          pos = hEnd + 2
        }
      }
      if (len < 0 || recType.isEmpty) return None
      if (pos + len + 4 > b.length) return None
      val payload = java.util.Arrays.copyOfRange(b, pos, (pos + len).toInt)
      pos = (pos + len).toInt
      // record separator: exactly two CRLFs
      if (b(pos) != '\r' || b(pos + 1) != '\n' ||
        b(pos + 2) != '\r' || b(pos + 3) != '\n') return None
      pos += 4
      out += Record(recType, uri, len, payload)
      count += 1
      if (count > (1 << 20)) return None
    }
    val v = out.result()
    if (v.isEmpty) None else Some(v)
  }

  /** Index of the '\r' of the next CRLF at/after `from`; -1 if the
    * line never terminates. Bare '\n' (a grammar violation) fails. */
  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      if (b(i) == '\n') return -1
      i += 1
    }
    -1
  }

  // ---------------------------------------------------------------- writer

  /** One WARC record's bytes (CRLF grammar, exact Content-Length). */
  def record(recType: String, uri: String, payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(recType).append("\r\n")
    if (uri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    extraHeaders.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    out.write(payload, 0, payload.length)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** The un-compressed two-record WARC (warcinfo + response) — the
    * payload both compressed fixture shapes wrap. */
  def warcPlain(uri: String, html: String, infoBody: String)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val info = record("warcinfo", "", infoBody.getBytes("UTF-8"),
      Seq("WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>"))
    val resp = record("response", uri, html.getBytes("UTF-8"),
      Seq("WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000001>"))
    out.write(info, 0, info.length)
    out.write(resp, 0, resp.length)
    out.toByteArray
  }

  /** A gzipped two-record WARC (warcinfo + response) — the
    * CommonCrawl file shape in miniature. */
  def warcGz(uri: String, html: String, infoBody: String): Array[Byte] =
    gzip(warcPlain(uri, html, infoBody))
}
