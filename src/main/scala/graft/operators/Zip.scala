package graft.operators

/** ZIP archive ingest (PKWARE APPNOTE / ISO 21320) — the other
  * archive shape a crawl pipeline meets beside gzipped WARC: dataset
  * dumps, document bundles, and office formats (docx/xlsx/epub are
  * all ZIP containers) arrive as .zip blobs in a binary column.
  *
  * The reader is the real container grammar, walked from the END as
  * the spec requires (a ZIP is defined by its central directory, not
  * by the local headers a streaming reader sniffs):
  *
  *  - EOCD scan: last `PK\x05\x06` within the trailing comment
  *    window, with the comment-length field required to account for
  *    the remaining bytes exactly (an unanchored signature match in
  *    entry DATA is rejected by that check);
  *  - central-directory walk: one `PK\x01\x02` record per entry
  *    (name, method, sizes, CRC-32, local offset), entry count and
  *    name lengths capped before any allocation;
  *  - extraction: seek to the entry's `PK\x03\x04` local header,
  *    skip ITS OWN name/extra lengths (they legally differ from the
  *    central copy), slice the compressed bytes, then either copy
  *    (method 0, sizes must agree) or raw-DEFLATE inflate (method 8,
  *    JDK Inflater nowrap — the same machinery [[Warc.gunzip]] and
  *    [[PngPixels]] prove) — and verify the CRC-32 and exact
  *    uncompressed length, so a corrupt payload fails the entry
  *    rather than yielding silent garbage.
  *
  * Pure `Array[Byte] => Option[...]` kernels; dirty bytes → None,
  * never a throw. The writer emits the same grammar (local headers +
  * central directory + EOCD, real Deflater for method-8 entries);
  * specs cross-check both directions against the JDK's
  * ZipInputStream/ZipOutputStream as an external implementation. */
object Zip {

  /** One central-directory entry. `method` is 0 (stored) or 8
    * (deflate) — anything else stays listable but not extractable. */
  final case class Entry(
      name: String, method: Int, compSize: Long, size: Long,
      crc32: Long, localOffset: Long)

  private val MaxEntries = 4096
  private val MaxNameLen = 4096

  def isZip(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** List the central directory. None on any grammar violation. */
  def entries(b: Array[Byte]): Option[Vector[Entry]] = {
    try entries0(b)
    catch { case _: Exception => None }
  }

  private def entries0(b: Array[Byte]): Option[Vector[Entry]] = {
    if (b == null || b.length < 22) return None
    // EOCD: scan back through the comment window for PK\x05\x06 whose
    // comment-length field accounts for the tail exactly.
    var eocd = -1
    var i = b.length - 22
    val floor = math.max(0, b.length - 22 - 0xffff)
    while (eocd < 0 && i >= floor) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6 &&
        i + 22 + u16(b, i + 20) == b.length) eocd = i
      else i -= 1
    }
    if (eocd < 0) return None
    val n = u16(b, eocd + 10)
    val nTotal = u16(b, eocd + 8)
    val cdSize = u32(b, eocd + 12)
    val cdOff = u32(b, eocd + 16)
    if (n != nTotal || n > MaxEntries) return None // no multi-disk
    if (cdOff + cdSize > eocd) return None
    val out = Vector.newBuilder[Entry]
    var pos = cdOff.toInt
    var k = 0
    while (k < n) {
      if (pos + 46 > eocd) return None
      if (!(b(pos) == 'P' && b(pos + 1) == 'K' &&
        b(pos + 2) == 1 && b(pos + 3) == 2)) return None
      val flags = u16(b, pos + 8)
      if ((flags & 0x1) != 0) return None // encrypted
      val method = u16(b, pos + 10)
      val crc = u32(b, pos + 16)
      val compSize = u32(b, pos + 20)
      val size = u32(b, pos + 24)
      val nameLen = u16(b, pos + 28)
      val extraLen = u16(b, pos + 30)
      val commentLen = u16(b, pos + 32)
      val localOff = u32(b, pos + 42)
      if (nameLen > MaxNameLen || pos + 46 + nameLen > eocd) return None
      if (size > PngPixels.MaxDecodedBytes) return None
      val name = new String(b, pos + 46, nameLen, "UTF-8")
      out += Entry(name, method, compSize, size, crc, localOff)
      pos += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    Some(out.result())
  }

  /** Extract one entry's bytes via its local header; CRC-32 and exact
    * length verified. None for missing names, unsupported methods, or
    * corrupt payloads. */
  def extract(b: Array[Byte], name: String): Option[Array[Byte]] =
    entries(b).flatMap(_.find(_.name == name)).flatMap(extractEntry(b, _))

  def extractEntry(b: Array[Byte], e: Entry): Option[Array[Byte]] = {
    try {
      val lo = e.localOffset
      if (lo < 0 || lo + 30 > b.length) return None
      val p = lo.toInt
      if (!(b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 3 && b(p + 3) == 4))
        return None
      // the LOCAL name/extra lengths govern where data starts
      val dataAt = p + 30 + u16(b, p + 26) + u16(b, p + 28)
      if (dataAt + e.compSize > b.length ||
        e.size > PngPixels.MaxDecodedBytes) return None
      val raw = e.method match {
        case 0 =>
          if (e.compSize != e.size) return None
          java.util.Arrays.copyOfRange(b, dataAt, (dataAt + e.size).toInt)
        case 8 =>
          val inf = new java.util.zip.Inflater(true) // raw deflate
          try {
            inf.setInput(b, dataAt, e.compSize.toInt)
            val out = new Array[Byte](e.size.toInt)
            var got = 0
            while (got < out.length && !inf.finished()) {
              val m = inf.inflate(out, got, out.length - got)
              if (m == 0 && inf.needsInput()) return None // truncated
              got += m
            }
            if (got != e.size || !inf.finished()) return None
            out
          } finally inf.end()
        case _ => return None
      }
      val crc = new java.util.zip.CRC32()
      crc.update(raw, 0, raw.length)
      if (crc.getValue != e.crc32) return None
      Some(raw)
    } catch { case _: Exception => None }
  }

  // ---------------------------------------------------------------- writer

  /** A complete archive (local headers + central directory + EOCD);
    * method 8 entries through a real Deflater. Fixture/spec side. */
  def zip(files: Seq[(String, Array[Byte])], deflate: Boolean): Array[Byte] = {
    require(files.length <= MaxEntries, s"${files.length} entries")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val central = files.map { case (name, data) =>
      val nameB = name.getBytes("UTF-8")
      val crc = new java.util.zip.CRC32()
      crc.update(data, 0, data.length)
      val comp =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(data); d.finish()
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
            bos.toByteArray
          } finally d.end()
        }
      val method = if (deflate) 8 else 0
      val offset = out.size()
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      w16(20); w16(0); w16(method); w16(0); w16(0) // version/flags/mtime
      w32(crc.getValue); w32(comp.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB, 0, nameB.length)
      out.write(comp, 0, comp.length)
      (nameB, method, crc.getValue, comp.length.toLong, data.length.toLong,
        offset.toLong)
    }
    val cdStart = out.size()
    central.foreach { case (nameB, method, crc, compLen, len, offset) =>
      out.write('P'); out.write('K'); out.write(1); out.write(2)
      w16(20); w16(20); w16(0); w16(method); w16(0); w16(0)
      w32(crc); w32(compLen); w32(len)
      w16(nameB.length); w16(0); w16(0) // name/extra/comment
      w16(0); w16(0); w32(0) // disk/internal/external attrs
      w32(offset)
      out.write(nameB, 0, nameB.length)
    }
    val cdSize = out.size() - cdStart
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    w16(0); w16(0); w16(files.length); w16(files.length)
    w32(cdSize.toLong); w32(cdStart.toLong); w16(0)
    out.toByteArray
  }
}
