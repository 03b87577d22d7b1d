package graft.operators

/** TIFF 6.0 IFD machinery — one real directory walk serving two crawl
  * surfaces:
  *
  *  - standalone TIFF files (scans, archival imagery): width/height/
  *    channels metadata from IFD0 (entropy payloads — LZW/packbits/
  *    JPEG-in-TIFF — stay behind the codec seam, like every other
  *    metadata triage here);
  *  - EXIF blocks inside JPEG APP1 segments ("Exif\0\0" + an embedded
  *    TIFF structure): orientation, camera make/model, timestamps,
  *    and the Exif-private sub-IFD — the metadata an image pipeline
  *    filters and normalizes on (orientation especially: a crawl
  *    image viewer that ignores tag 274 shows 1/8 of photos
  *    sideways).
  *
  * Both byte orders (II/MM), inline-vs-offset values, bounds-checked
  * offsets, entry-count caps. Dirty bytes → None, never a throw. */
object Tiff {

  final case class Exif(
      orientation: Int, make: String, model: String, dateTime: String,
      exifW: Int, exifH: Int)

  /** A parsed IFD entry's numeric or string value. */
  private final class Reader(b: Array[Byte], base: Int, le: Boolean) {
    def u16(o: Int): Int = {
      if (o < 0 || o + 2 > b.length) throw new IllegalArgumentException
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    def u32(o: Int): Long = {
      if (o < 0 || o + 4 > b.length) throw new IllegalArgumentException
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    }

    /** tag -> (type, count, valueFieldOffset) for one IFD. */
    def ifdEntries(ifdOff: Long): Map[Int, (Int, Long, Int)] = {
      val off = base + ifdOff
      if (off < 0 || off + 2 > b.length) throw new IllegalArgumentException
      val n = u16(off.toInt)
      if (n > 512) throw new IllegalArgumentException // bound dirty counts
      (0 until n).map { i =>
        val e = off.toInt + 2 + 12 * i
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        tag -> ((typ, count, e + 8))
      }.toMap
    }

    /** SHORT/LONG scalar value (first element). */
    def numeric(entry: (Int, Long, Int)): Option[Long] = entry match {
      case (3, _, v) => Some(u16(v).toLong) // SHORT, inline
      case (4, _, v) => Some(u32(v)) // LONG, inline
      case _ => None
    }

    /** ASCII value (count includes the NUL); inline if count <= 4. */
    def ascii(entry: (Int, Long, Int)): Option[String] = entry match {
      case (2, count, v) if count >= 1 && count <= 4096 =>
        val off = if (count <= 4) v.toLong else base + u32(v)
        if (off < 0 || off + count > b.length) None
        else {
          val len = (count - 1).toInt // strip the NUL
          Some(new String(b, off.toInt, math.max(len, 0), "US-ASCII"))
        }
      case _ => None
    }
  }

  /** Byte-order probe at `base`: Some(littleEndian) or None. */
  private def order(b: Array[Byte], base: Int): Option[Boolean] = {
    if (base + 8 > b.length) return None
    if (b(base) == 'I' && b(base + 1) == 'I') Some(true)
    else if (b(base) == 'M' && b(base + 1) == 'M') Some(false)
    else None
  }

  /** Standalone TIFF metadata (IFD0 geometry tags). */
  def parseTiff(b: Array[Byte]): Option[MediaCodec.Meta] = {
    try {
      if (b == null) return None
      val le = order(b, 0).getOrElse(return None)
      val r = new Reader(b, 0, le)
      if (r.u16(2) != 42) return None
      val entries = r.ifdEntries(r.u32(4))
      def num(tag: Int): Option[Long] = entries.get(tag).flatMap(r.numeric)
      val w = num(256).getOrElse(return None)
      val h = num(257).getOrElse(return None)
      val spp = num(277).getOrElse(1L)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
        spp <= 0 || spp > 16) return None
      Some(MediaCodec.Meta(w.toInt, h.toInt, spp.toInt, "tiff"))
    } catch { case _: Exception => None }
  }

  /** EXIF from a JPEG's APP1 segment: walk markers to APP1
    * `Exif\0\0`, parse the embedded TIFF structure's IFD0 + the
    * Exif-private sub-IFD (tag 34665). Absent fields default
    * (orientation 1, empty strings, 0 dims); files without an Exif
    * APP1 → None. */
  def parseExif(b: Array[Byte]): Option[Exif] = {
    try {
      if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        val m = b(i + 1) & 0xff
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) { i += 2 }
        else if (m == 0xd9 || m == 0xda) return None // EOI/SOS: no APP1
        else {
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > b.length) return None
          if (m == 0xe1 && len >= 2 + 6 + 8 &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
            return parseExifTiff(b, i + 10)
          }
          i += 2 + len
        }
      }
      None
    } catch { case _: Exception => None }
  }

  private def parseExifTiff(b: Array[Byte], base: Int): Option[Exif] = {
    val le = order(b, base).getOrElse(return None)
    val r = new Reader(b, base, le)
    if (r.u16(base + 2) != 42) return None
    val ifd0 = r.ifdEntries(r.u32(base + 4))
    def num(m: Map[Int, (Int, Long, Int)], tag: Int): Long =
      m.get(tag).flatMap(r.numeric).getOrElse(0L)
    def str(m: Map[Int, (Int, Long, Int)], tag: Int): String =
      m.get(tag).flatMap(r.ascii).getOrElse("")
    val orientation = {
      val o = num(ifd0, 274)
      if (o >= 1 && o <= 8) o.toInt else 1
    }
    val make = str(ifd0, 271)
    val model = str(ifd0, 272)
    var dateTime = str(ifd0, 306)
    var exifW = 0L; var exifH = 0L
    ifd0.get(34665).flatMap(r.numeric).foreach { subOff =>
      val sub = r.ifdEntries(subOff)
      val dto = str(sub, 36867)
      if (dto.nonEmpty) dateTime = dto
      exifW = num(sub, 40962)
      exifH = num(sub, 40963)
    }
    Some(Exif(orientation, make, model, dateTime, exifW.toInt, exifH.toInt))
  }

  // ---------------------------------------------------------------- writers

  /** Header-complete standalone TIFF (both byte orders): IFD0 with the
    * geometry tags a reader needs; pixel data is a placeholder strip
    * (the compression seam). */
  def tiff(w: Int, h: Int, channels: Int, littleEndian: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      else { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (littleEndian) {
        bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
        bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
      } else {
        bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
        bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
      }
    bos.write(if (littleEndian) 'I' else 'M')
    bos.write(if (littleEndian) 'I' else 'M')
    w16(42)
    w32(8) // IFD0 right after the header
    val tags = Seq( // (tag, type, count, value) — ascending tag order
      (256, 4, 1L, w.toLong), (257, 4, 1L, h.toLong),
      (258, 3, 1L, 8L), (259, 3, 1L, 1L), (262, 3, 1L, 1L),
      (277, 3, 1L, channels.toLong))
    w16(tags.length)
    tags.foreach { case (tag, typ, count, value) =>
      w16(tag); w16(typ); w32(count)
      if (typ == 3) { w16(value.toInt); w16(0) } else w32(value)
    }
    w32(0) // no next IFD
    bos.toByteArray
  }

  /** APP1 Exif segment bytes (marker + length included) with IFD0
    * (orientation/make/model/datetime) and an Exif sub-IFD
    * (DateTimeOriginal + pixel dims). */
  def exifApp1(orientation: Int, make: String, model: String,
      dateTime: String, exifW: Int, exifH: Int,
      littleEndian: Boolean): Array[Byte] = {
    val t = new java.io.ByteArrayOutputStream() // the TIFF block
    def w16(v: Int): Unit =
      if (littleEndian) { t.write(v & 0xff); t.write((v >> 8) & 0xff) }
      else { t.write((v >> 8) & 0xff); t.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (littleEndian) {
        t.write((v & 0xff).toInt); t.write(((v >> 8) & 0xff).toInt)
        t.write(((v >> 16) & 0xff).toInt); t.write(((v >> 24) & 0xff).toInt)
      } else {
        t.write(((v >> 24) & 0xff).toInt); t.write(((v >> 16) & 0xff).toInt)
        t.write(((v >> 8) & 0xff).toInt); t.write((v & 0xff).toInt)
      }
    t.write(if (littleEndian) 'I' else 'M')
    t.write(if (littleEndian) 'I' else 'M')
    w16(42); w32(8)
    // IFD0: orientation, make, model, datetime, exif pointer
    // (5 entries). ASCII values of <= 4 bytes are INLINE in the
    // value field per the spec (left-justified, zero-padded) — the
    // reader's inline path is exercised whenever a short make/model
    // lands here; longer values go to the string area after IFD0.
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val dtB = (dateTime + "\u0000").getBytes("US-ASCII")
    val ifd0Entries = 5
    val ifd0Size = 2 + 12 * ifd0Entries + 4
    val dataStart = 8 + ifd0Size // string area after IFD0
    val outOfLine = Seq(makeB, modelB, dtB).filter(_.length > 4)
    val offsets = outOfLine.scanLeft(dataStart)(_ + _.length)
    val offsetOf = outOfLine.zip(offsets).toMap
    def asciiValue(bytes: Array[Byte]): Unit =
      if (bytes.length <= 4) {
        var i = 0
        while (i < 4) { t.write(if (i < bytes.length) bytes(i) else 0); i += 1 }
      } else w32(offsetOf(bytes).toLong)
    val exifIfdOff = dataStart + outOfLine.map(_.length).sum
    w16(ifd0Entries)
    w16(271); w16(2); w32(makeB.length.toLong); asciiValue(makeB)
    w16(272); w16(2); w32(modelB.length.toLong); asciiValue(modelB)
    w16(274); w16(3); w32(1); w16(orientation); w16(0)
    w16(306); w16(2); w32(dtB.length.toLong); asciiValue(dtB)
    w16(34665); w16(4); w32(1); w32(exifIfdOff.toLong)
    w32(0) // next IFD
    outOfLine.foreach(bs => t.write(bs, 0, bs.length))
    // Exif sub-IFD: pixel dims (2 entries)
    w16(2)
    w16(40962); w16(4); w32(1); w32(exifW.toLong)
    w16(40963); w16(4); w32(1); w32(exifH.toLong)
    w32(0)
    val tiffBlock = t.toByteArray
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = 2 + 6 + tiffBlock.length
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write("Exif".getBytes("US-ASCII")); seg.write(0); seg.write(0)
    seg.write(tiffBlock, 0, tiffBlock.length)
    seg.toByteArray
  }

  /** Splice an Exif APP1 right after a JPEG's SOI — the spliced file
    * still decodes through [[JpegDc]] (marker walks skip APP1). */
  def withExif(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2)
    out.write(app1, 0, app1.length)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }
}
