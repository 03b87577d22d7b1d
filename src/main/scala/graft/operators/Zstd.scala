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

  // ------------------------------------------------------- full writer

  /** FULL valid frames (r9) — decodable by [[ZstdDecode]] and any
    * conformant decoder. `variant` cycles the frame shapes so the
    * oracle-gated query exercises real structure, not just headers:
    *
    *  - 0: one raw block, declared content size, XXH64 checksum
    *  - 1: TWO concatenated frames splitting the content, no checksum
    *  - 2: leading skippable frame + a compressed block holding raw
    *       literals with zero sequences, checksum
    *  - 3: compressed block with ONE real LZ sequence through
    *       RLE-mode FSE tables (0-bit states, real extra bits, real
    *       backward bitstream) — the content's periodic tail is a
    *       match copy, not stored bytes
    *  - 4: a raw block (window history) + two zero-literal
    *       compressed blocks: the first's RLE-mode match copies
    *       across the block boundary from the raw block, the second
    *       reuses the tables via REPEAT mode (RLE tables pin each
    *       field to one CODE, so both sequences share LL/OF/ML codes
    *       and differ only in per-sequence extra bits)
    *  - 5: HUFFMAN-compressed literals through the 4-stream layout
    *       (direct-weights tree description, jump table, per-stream
    *       backward bitstreams), zero sequences
    *
    * Sequence encoding needs no FSE encoder: RLE-mode tables pin each
    * code to one symbol, so the bitstream is exactly the extra bits
    * (packed backward with the sentinel). Content must be periodic
    * with period ≥ 4 for variants 3-4 (the match copies whole
    * periods). */
  def zstEncode(content: Array[Byte], variant: Int,
      period: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def frameHeader(size: Int, checksum: Boolean): Unit = {
      w32(Magic)
      // single-segment, 4-byte FCS (flag 2) keeps the header simple
      out.write(0x20 | 0x80 | (if (checksum) 0x04 else 0))
      w32(size.toLong)
    }
    def rawBlock(data: Array[Byte], off: Int, len: Int, last: Boolean)
        : Unit = {
      val hdr = (len << 3) | (if (last) 1 else 0)
      out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
      out.write((hdr >> 16) & 0xff)
      out.write(data, off, len)
    }
    def checksumOf(data: Array[Byte]): Unit =
      w32(ZstdDecode.xxh64(data) & 0xffffffffL)
    /** raw-literals header for a compressed block. */
    def litHeader(bb: java.io.ByteArrayOutputStream, n: Int): Unit = {
      if (n < 32) bb.write(n << 3) // size-format 0: 5-bit size
      else { // size-format 1: 12-bit size
        bb.write(((n & 0xf) << 4) | 0x04)
        bb.write((n >> 4) & 0xff)
      }
    }
    /** fields in READ order (value, width) → backward bitstream with
      * the top sentinel bit. */
    def packBackward(fields: Seq[(Int, Int)]): Array[Byte] = {
      val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
      fields.foreach { case (v, w) =>
        var j = w - 1
        while (j >= 0) { bits += (v >> j) & 1; j -= 1 }
      }
      val n = bits.length
      val arr = new Array[Byte](n / 8 + 1)
      var k = 0
      while (k < n) {
        val i = n - 1 - k
        if (bits(k) == 1)
          arr(i >> 3) = (arr(i >> 3) | (1 << (i & 7))).toByte
        k += 1
      }
      arr(n >> 3) = (arr(n >> 3) | (1 << (n & 7))).toByte // sentinel
      arr
    }
    // (code, extra value, extra width) per the RFC code tables —
    // re-derived here rather than reaching into the decoder, so the
    // two sides stay independent implementations of the same spec
    def seqCodes(ll: Int, ml: Int, offsetValue: Int)
        : (Seq[(Int, Int, Int)]) = {
      def llc(v: Int): (Int, Int, Int) =
        if (v < 16) (v, 0, 0)
        else {
          val bases = Seq((16, 16, 1), (17, 18, 1), (18, 20, 1),
            (19, 22, 1), (20, 24, 2), (21, 28, 2), (22, 32, 3),
            (23, 40, 3), (24, 48, 4), (25, 64, 6), (26, 128, 7),
            (27, 256, 8), (28, 512, 9), (29, 1024, 10), (30, 2048, 11),
            (31, 4096, 12), (32, 8192, 13), (33, 16384, 14),
            (34, 32768, 15), (35, 65536, 16))
          val (c, base, eb) = bases.reverse.find(_._2 <= v).get
          (c, v - base, eb)
        }
      def mlc(v: Int): (Int, Int, Int) =
        if (v < 35) (v - 3, 0, 0)
        else {
          val bases = Seq((32, 35, 1), (33, 37, 1), (34, 39, 1),
            (35, 41, 1), (36, 43, 2), (37, 47, 2), (38, 51, 3),
            (39, 59, 3), (40, 67, 4), (41, 83, 4), (42, 99, 5),
            (43, 131, 7), (44, 259, 8), (45, 515, 9), (46, 1027, 10),
            (47, 2051, 11), (48, 4099, 12), (49, 8195, 13),
            (50, 16387, 14), (51, 32771, 15), (52, 65539, 16))
          val (c, base, eb) = bases.reverse.find(_._2 <= v).get
          (c, v - base, eb)
        }
      def ofc(v: Int): (Int, Int, Int) = {
        val c = 31 - Integer.numberOfLeadingZeros(v)
        (c, v - (1 << c), c)
      }
      Seq(llc(ll), ofc(offsetValue), mlc(ml))
    }
    /** one compressed block: `lits` raw literals + one sequence
      * (ll = lits.length, given offset/ml), tables in `mode`
      * (1 = RLE descriptions, 3 = repeat previous). */
    def seqBlock(lits: Array[Byte], offset: Int, ml: Int,
        mode: Int, last: Boolean): Unit = {
      val bb = new java.io.ByteArrayOutputStream()
      litHeader(bb, lits.length)
      bb.write(lits, 0, lits.length)
      bb.write(1) // one sequence
      val m = if (mode == 1) 0x54 else 0xFC // LL/OF/ML all RLE or all repeat
      bb.write(m)
      val Seq((llC, llX, llB), (ofC, ofX, ofB), (mlC, mlX, mlB)) =
        seqCodes(lits.length, ml, offset + 3)
      if (mode == 1) { bb.write(llC); bb.write(ofC); bb.write(mlC) }
      // read order: 0-bit state inits, then OF extra, ML extra, LL extra
      val stream = packBackward(
        Seq((ofX, ofB), (mlX, mlB), (llX, llB)))
      bb.write(stream, 0, stream.length)
      val block = bb.toByteArray
      val hdr = (block.length << 3) | 4 | (if (last) 1 else 0)
      out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
      out.write((hdr >> 16) & 0xff)
      out.write(block, 0, block.length)
    }
    def rawLitsBlock(data: Array[Byte], last: Boolean): Unit = {
      val bb = new java.io.ByteArrayOutputStream()
      litHeader(bb, data.length)
      bb.write(data, 0, data.length)
      bb.write(0) // zero sequences
      val block = bb.toByteArray
      val hdr = (block.length << 3) | 4 | (if (last) 1 else 0)
      out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
      out.write((hdr >> 16) & 0xff)
      out.write(block, 0, block.length)
    }

    math.floorMod(variant, 6) match {
      case 0 =>
        frameHeader(content.length, checksum = true)
        rawBlock(content, 0, content.length, last = true)
        checksumOf(content)
      case 1 =>
        val half = content.length / 2
        frameHeader(half, checksum = false)
        rawBlock(content, 0, half, last = true)
        frameHeader(content.length - half, checksum = false)
        rawBlock(content, half, content.length - half, last = true)
      case 2 =>
        w32(SkippableBase | 7L); w32(4); w32(0xC0FFEEL)
        frameHeader(content.length, checksum = true)
        rawLitsBlock(content, last = true)
        checksumOf(content)
      case 3 =>
        require(period >= 4 && content.length > period &&
          content.length % period == 0, s"periodic content required")
        frameHeader(content.length, checksum = true)
        seqBlock(content.take(period), period, content.length - period,
          mode = 1, last = true)
        checksumOf(content)
      case 5 =>
        // HUFFMAN-compressed literals (4 streams, direct-weights tree)
        // with zero sequences. The tree gives all 128 low-ASCII
        // symbols weight 1 — a legal canonical table whose assignment
        // (weight groups ascending, symbols ascending, codes counting
        // up) reduces to code(s) = s at 7 bits — so the encoder stays
        // independent of the decoder while exercising the tree parse,
        // the 4-stream jump table, and per-stream exact consumption.
        require(content.length >= 4 && content.length < (1 << 14) &&
          content.forall(b => (b & 0xff) < 128),
          "low-ASCII content up to 16k required")
        frameHeader(content.length, checksum = true)
        val bb = new java.io.ByteArrayOutputStream()
        val per = (content.length + 3) / 4
        val counts = Array(per, per, per, content.length - 3 * per)
        require(counts(3) >= 1,
          s"4-stream split needs a non-empty 4th stream " +
            s"(len=${content.length} gives ${counts(3)})")
        var off = 0
        val streams = counts.map { n =>
          val part = java.util.Arrays.copyOfRange(content, off, off + n)
          off += n
          packBackward(part.toSeq.map(b => ((b & 0xff), 7)))
        }
        val comp = 1 + 64 + 6 + streams.map(_.length).sum
        val h = 2L | (2L << 2) | (content.length.toLong << 4) |
          (comp.toLong << 18)
        bb.write((h & 0xff).toInt); bb.write(((h >> 8) & 0xff).toInt)
        bb.write(((h >> 16) & 0xff).toInt); bb.write(((h >> 24) & 0xff).toInt)
        bb.write(254) // direct weights, 127 explicit symbols...
        val wts = new Array[Byte](64) // ...all weight 1 (2 per byte);
        java.util.Arrays.fill(wts, 0x11.toByte) // symbol 127 implied
        bb.write(wts, 0, 64)
        for (k <- 0 until 3) {
          bb.write(streams(k).length & 0xff)
          bb.write((streams(k).length >> 8) & 0xff)
        }
        streams.foreach(s => bb.write(s, 0, s.length))
        bb.write(0) // zero sequences
        val block = bb.toByteArray
        val hdr = (block.length << 3) | 4 | 1
        out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
        out.write((hdr >> 16) & 0xff)
        out.write(block, 0, block.length)
        checksumOf(content)
      case _ =>
        require(period >= 4 && content.length > 3 * period,
          s"periodic content required")
        // Raw history block + two ZERO-literal sequence blocks. The
        // RLE block's match copies from the raw block (cross-block
        // window reference) and the repeat-mode block reuses its
        // tables. Repeat-mode over RLE tables pins each field to ONE
        // CODE, so both sequences must share (LL code 0, the same OF
        // code, one ML code) — only the per-sequence extra bits may
        // differ. The split point is nudged until both match lengths
        // land in the same ML code bucket.
        frameHeader(content.length, checksum = true)
        rawBlock(content, 0, period, last = false)
        val rest = content.length - period
        def mlCode(v: Int): Int = seqCodes(0, v, period + 3)(2)._1
        val ml2 = (rest / 2 to rest - 3)
          .find(m => mlCode(m) == mlCode(rest - m))
          .getOrElse(sys.error(s"no same-ML-code split for $rest"))
        seqBlock(Array.emptyByteArray, period, ml2, mode = 1,
          last = false)
        seqBlock(Array.emptyByteArray, period, rest - ml2, mode = 3,
          last = true)
        checksumOf(content)
    }
    out.toByteArray
  }
}
