package graft.operators

/** Zstandard frame-header triage (RFC 8878) — CommonCrawl's newer
  * indexes and many dataset dumps ship .zst; without a zstd library
  * in this environment the CONTENT stays behind the codec seam, but
  * the frame header alone answers the triage questions a pipeline
  * asks before routing a blob: declared content size, window budget,
  * dictionary requirement, checksum presence.
  *
  * Parsed per the RFC's bit layout:
  *
  *  - magic `0xFD2FB528` (LE), plus leading SKIPPABLE frames
  *    (`0x184D2A50..5F` + u32 size) counted and stepped over;
  *  - the frame-header descriptor: FCS field size (bits 6-7,
  *    with the single-segment special case), single-segment flag
  *    (bit 5), checksum flag (bit 2), dictionary-ID field size
  *    (bits 0-1);
  *  - window descriptor (absent when single-segment): windowSize =
  *    (1 << (10+exp)) + mantissa * (1 << (10+exp)) / 8;
  *  - dictionary ID (0/1/2/4 bytes LE) and frame content size
  *    (0/1/2/4/8 bytes LE, the 2-byte form biased by 256).
  *
  * Dirty bytes → None, never a throw. */
object Zstd {

  final case class Meta(contentSize: Long, hasContentSize: Boolean,
      windowSize: Long, dictId: Long, hasChecksum: Boolean,
      skippableFrames: Int)

  private val Magic = 0xFD2FB528L
  private val SkippableBase = 0x184D2A50L

  private def u32le(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw new IllegalArgumentException
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  private def leN(b: Array[Byte], o: Int, n: Int): Long = {
    if (o < 0 || o + n > b.length) throw new IllegalArgumentException
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }

  def parse(b: Array[Byte]): Option[Meta] = {
    try {
      if (b == null || b.length < 5) return None
      var pos = 0
      var skippable = 0
      // leading skippable frames: magic low nibble is user-defined
      while (pos + 8 <= b.length &&
        (u32le(b, pos) & 0xFFFFFFF0L) == SkippableBase) {
        val size = u32le(b, pos + 4)
        if (pos + 8 + size > b.length) return None
        pos += 8 + size.toInt
        skippable += 1
        if (skippable > 64) return None
      }
      if (pos + 5 > b.length || u32le(b, pos) != Magic) return None
      pos += 4
      val desc = b(pos) & 0xff
      pos += 1
      if ((desc & 0x08) != 0) return None // reserved bit must be zero
      val fcsFlag = (desc >> 6) & 0x3
      val singleSegment = (desc & 0x20) != 0
      val hasChecksum = (desc & 0x04) != 0
      val dictFlag = desc & 0x3
      val windowSize =
        if (singleSegment) -1L // defined by the content size below
        else {
          if (pos >= b.length) return None
          val wd = b(pos) & 0xff
          pos += 1
          val exp = wd >> 3
          val mant = wd & 0x7
          val base = 1L << (10 + exp)
          base + mant * (base >> 3)
        }
      val dictBytes = dictFlag match {
        case 0 => 0
        case 1 => 1
        case 2 => 2
        case _ => 4
      }
      val dictId = if (dictBytes == 0) 0L else leN(b, pos, dictBytes)
      pos += dictBytes
      val fcsBytes = fcsFlag match {
        case 0 => if (singleSegment) 1 else 0
        case 1 => 2
        case 2 => 4
        case _ => 8
      }
      val hasFcs = fcsBytes > 0
      val contentSize =
        if (!hasFcs) 0L
        else {
          val raw = leN(b, pos, fcsBytes)
          if (fcsBytes == 2) raw + 256 else raw
        }
      val window = if (singleSegment) contentSize else windowSize
      Some(Meta(contentSize, hasFcs, window, dictId, hasChecksum,
        skippable))
    } catch { case _: Exception => None }
  }

  // ---------------------------------------------------------------- writer

  /** A frame header (+ `nSkippable` leading skippable frames) with
    * filler content bytes — header-complete for triage; the block
    * payload is the documented codec seam. */
  def zstHeader(contentSize: Long, windowExp: Int, windowMant: Int,
      dictId: Long, checksum: Boolean, nSkippable: Int): Array[Byte] = {
    require(windowExp >= 0 && windowExp <= 31 && windowMant >= 0 &&
      windowMant <= 7)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    (0 until nSkippable).foreach { i =>
      w32(SkippableBase | (i % 16).toLong)
      w32(4); w32(0xDEADL + i) // 4 payload bytes
    }
    w32(Magic)
    val fcsFlag =
      if (contentSize < 0) 0 // no FCS field: size undeclared
      else if (contentSize >= 256 && contentSize <= 0xffffL + 256) 1
      else if (contentSize <= 0xffffffffL) 2
      else 3
    val dictFlag =
      if (dictId == 0) 0
      else if (dictId <= 0xff) 1
      else if (dictId <= 0xffff) 2
      else 3
    val hasFcs = contentSize >= 0
    val desc = ((if (hasFcs) fcsFlag else 0) << 6) |
      ((if (checksum) 1 else 0) << 2) | dictFlag
    out.write(desc)
    // window descriptor (never single-segment in this writer)
    out.write((windowExp << 3) | windowMant)
    dictFlag match {
      case 0 => ()
      case 1 => out.write((dictId & 0xff).toInt)
      case 2 =>
        out.write((dictId & 0xff).toInt)
        out.write(((dictId >> 8) & 0xff).toInt)
      case _ => w32(dictId)
    }
    if (hasFcs) fcsFlag match {
      case 0 => () // no FCS field without single-segment
      case 1 =>
        val v = contentSize - 256
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      case 2 => w32(contentSize)
      case _ =>
        w32(contentSize & 0xffffffffL); w32(contentSize >>> 32)
    }
    out.write(Array.fill[Byte](8)(0x55), 0, 8) // opaque block bytes
    out.toByteArray
  }
}
