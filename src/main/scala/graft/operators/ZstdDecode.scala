package graft.operators

/** RFC 8878 (zstd) DECOMPRESSION — the block layer the round-8
  * frame-header triage ([[Zstd]]) stopped at. Self-contained: FSE
  * (tANS) table parsing + decoding, Huffman literals (direct and
  * FSE-compressed weights, 1- and 4-stream), the three sequence
  * codes with all four table modes (predefined / RLE / FSE-described
  * / repeat), repeat-offset history with the literals-length-0
  * quirk, raw/RLE blocks, multi-frame and skippable-frame input, and
  * XXH64 content-checksum verification.
  *
  * Unlocks zstd-compressed dumps and `.warc.zst` crawls for the
  * ingestion path (`unzstd` SQL function; composes with
  * [[Warc.records]] exactly as gzip does).
  *
  * Conformance: decoded output is checked against the REFERENCE zstd
  * implementation in ZstdDecodeSpec — real files produced by the
  * `zstd` binary at several levels (forcing Huffman literals, FSE
  * tables, repeat offsets, 4-stream literals, long matches) must
  * decode byte-identically; engine-written fixtures cover the
  * frame/raw/RLE/compressed-framing/checksum paths under the DuckDB
  * oracle (`zstd_extract`).
  *
  * Validator stance like every codec here: malformed input — bad
  * magic, reserved block type, FSE counts that don't sum, a Huffman
  * stream that doesn't consume exactly, an offset past the window, a
  * checksum mismatch — returns None, never throws, never guesses.
  * Dictionary frames (dictId != 0) are out of subset and return None
  * loudly (a dictionary is external content by definition).
  */
object ZstdDecode {

  private object Invalid extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** All malformation paths funnel here: the stackless sentinel in
    * production; a real stack trace under -Dgraft.zstd.debug=true
    * (spec-side diagnosis). */
  private val Debug = java.lang.Boolean.getBoolean("graft.zstd.debug")
  private def invalidErr(): Nothing =
    if (Debug) throw new RuntimeException("zstd: malformed input")
    else throw Invalid

  private val Magic = 0xFD2FB528L
  private val SkippableBase = 0x184D2A50L
  private val MaxBlockSize = 128 * 1024
  private val MaxOutput = 1 << 28 // 256 MB sanity bound per input

  // ---------------------------------------------------------------
  // growable output buffer with random access (match copies read
  // back into recent output; a stream API would be quadratic)
  // ---------------------------------------------------------------

  private final class ZBuf {
    private var data = new Array[Byte](64 * 1024)
    var size: Int = 0
    private def ensure(extra: Int): Unit = {
      if (size + extra > data.length) {
        var cap = data.length
        while (cap < size + extra) cap <<= 1
        data = java.util.Arrays.copyOf(data, cap)
      }
    }
    def write(b: Byte): Unit = { ensure(1); data(size) = b; size += 1 }
    def write(src: Array[Byte], off: Int, len: Int): Unit = {
      ensure(len)
      System.arraycopy(src, off, data, size, len)
      size += len
    }
    /** overlapping LZ copy from `offset` back, len bytes. */
    def copyBack(offset: Int, len: Int): Unit = {
      if (offset < 1 || offset > size) invalidErr()
      ensure(len)
      var i = 0
      var src = size - offset
      while (i < len) { data(size + i) = data(src + i); i += 1 }
      size += len
    }
    def toByteArray: Array[Byte] = java.util.Arrays.copyOf(data, size)
  }

  // ---------------------------------------------------------------
  // predefined sequence code tables (RFC 8878 §3.1.1.3.2.2)
  // ---------------------------------------------------------------

  private val LLDefault: Array[Int] = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1)
  private val MLDefault: Array[Int] = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1)
  private val OFDefault: Array[Int] = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  /** (baseline, extra bits) for literals-length codes 16..35. */
  private val LLExtra: Array[(Int, Int)] = Array(
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
    (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
    (32768, 15), (65536, 16))

  /** (baseline, extra bits) for match-length codes 32..52. */
  private val MLExtra: Array[(Int, Int)] = Array(
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16))

  private def llValue(code: Int, bits: BackBits): Int =
    if (code < 16) code
    else if (code < 36) {
      val (base, eb) = LLExtra(code - 16); base + bits.read(eb)
    } else invalidErr()

  private def mlValue(code: Int, bits: BackBits): Int =
    if (code < 32) code + 3
    else if (code < 53) {
      val (base, eb) = MLExtra(code - 32); base + bits.read(eb)
    } else invalidErr()

  // ---------------------------------------------------------------
  // bit I/O
  // ---------------------------------------------------------------

  /** Forward LSB-first reader (FSE table descriptions). */
  private final class FwdBits(b: Array[Byte], start: Int, end: Int) {
    private var bytePos = start
    private var bitPos = 0
    def read(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        if (bytePos >= end) invalidErr()
        v |= ((b(bytePos) >> bitPos) & 1) << i
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    /** position advanced to the next byte boundary. */
    def byteAligned: Int = if (bitPos == 0) bytePos else bytePos + 1
  }

  /** Backward reader over [start, end): written front-to-back, READ
    * back-to-front, 1-bit sentinel at the top of the final byte
    * (RFC §3.1.1.7). */
  private final class BackBits(b: Array[Byte], start: Int, end: Int) {
    if (end <= start) invalidErr()
    private val lastByte = b(end - 1) & 0xff
    if (lastByte == 0) invalidErr() // missing sentinel
    var bitsLeft: Int = (end - start - 1) * 8 +
      (31 - Integer.numberOfLeadingZeros(lastByte))

    @inline private def bitAt(i: Int): Int =
      (b(start + (i >> 3)) >> (i & 7)) & 1

    def read(n: Int): Int = {
      if (n > bitsLeft) invalidErr()
      var v = 0
      var j = n - 1
      var i = bitsLeft - 1
      while (j >= 0) { v |= bitAt(i) << j; i -= 1; j -= 1 }
      bitsLeft -= n
      v
    }

    /** Huffman peek: top `n` bits, zero-padded when fewer remain
      * (codes at the stream tail may be shorter than table width). */
    def peekPad(n: Int): Int = {
      val m = math.min(n, bitsLeft)
      var v = 0
      var j = m - 1
      var i = bitsLeft - 1
      while (j >= 0) { v |= bitAt(i) << j; i -= 1; j -= 1 }
      v << (n - m)
    }

    def consume(n: Int): Unit = {
      if (n > bitsLeft) invalidErr()
      bitsLeft -= n
    }
  }

  // ---------------------------------------------------------------
  // FSE
  // ---------------------------------------------------------------

  private final class FseTable(
      val tableLog: Int,
      val symbol: Array[Int],
      val nbBits: Array[Int],
      val newStateBase: Array[Int])

  /** Decode table from normalized counts (RFC §4.1.1): low-prob (-1)
    * symbols take single cells at the table top; the rest spread with
    * the standard step, then per-cell (nbBits, baseline) from the
    * running per-symbol state counter. */
  private def fseBuild(counts: Array[Int], tableLog: Int): FseTable = {
    val size = 1 << tableLog
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val newStateBase = new Array[Int](size)
    var highThreshold = size - 1
    var s = 0
    while (s < counts.length) {
      if (counts(s) == -1) {
        if (highThreshold < 0) invalidErr()
        symbol(highThreshold) = s
        highThreshold -= 1
      }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var position = 0
    s = 0
    while (s < counts.length) {
      var i = 0
      while (i < counts(s)) {
        symbol(position) = s
        position = (position + step) & mask
        while (position > highThreshold) position = (position + step) & mask
        i += 1
      }
      s += 1
    }
    if (position != 0) invalidErr() // spread must land exactly
    val nextState = counts.map(c => math.max(c, 0))
    var cell = 0
    while (cell < size) {
      if (cell > highThreshold) { // low-prob cell
        nbBits(cell) = tableLog
        newStateBase(cell) = 0
      } else {
        val sym = symbol(cell)
        val ns = nextState(sym)
        nextState(sym) += 1
        val bits = tableLog - (31 - Integer.numberOfLeadingZeros(ns))
        nbBits(cell) = bits
        newStateBase(cell) = (ns << bits) - size
      }
      cell += 1
    }
    new FseTable(tableLog, symbol, nbBits, newStateBase)
  }

  /** Accuracy log + normalized counts, the variable-precision count
    * stream of RFC §4.1.1; leaves the reader byte-aligned. */
  private def fseReadTable(
      fw: FwdBits, maxLog: Int, maxSymbol: Int): FseTable = {
    val tableLog = fw.read(4) + 5
    if (tableLog > maxLog) invalidErr()
    val size = 1 << tableLog
    val counts = new Array[Int](maxSymbol + 1)
    var remaining = size + 1
    var threshold = size
    var nbBits = tableLog + 1
    var charnum = 0
    var previous0 = false
    while (remaining > 1) {
      if (charnum > maxSymbol) invalidErr()
      if (previous0) {
        var n0 = charnum
        var rep = fw.read(2)
        while (rep == 3) { n0 += 3; rep = fw.read(2) }
        n0 += rep
        if (n0 > maxSymbol + 1) invalidErr()
        while (charnum < n0) { counts(charnum) = 0; charnum += 1 }
        previous0 = false
      } else {
        val max = (2 * threshold - 1) - remaining
        var count = fw.read(nbBits - 1)
        if (count >= max) {
          count |= fw.read(1) << (nbBits - 1)
          if (count >= threshold) count -= max
        }
        count -= 1 // stored +1; 0 encodes the -1 "less than one"
        remaining -= math.abs(count)
        if (remaining < 1) invalidErr()
        counts(charnum) = count
        charnum += 1
        if (count == 0) previous0 = true
        while (remaining > 1 && remaining < threshold) {
          nbBits -= 1; threshold >>= 1
        }
      }
    }
    if (remaining != 1) invalidErr()
    fseBuild(counts, tableLog)
  }

  private def fseRle(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  private lazy val llDefaultTable = fseBuild(LLDefault, 6)
  private lazy val ofDefaultTable = fseBuild(OFDefault, 5)
  private lazy val mlDefaultTable = fseBuild(MLDefault, 6)

  // ---------------------------------------------------------------
  // Huffman
  // ---------------------------------------------------------------

  private final class HufTable(
      val tableLog: Int, val symbols: Array[Int], val lens: Array[Int])

  /** Weights → canonical prefix-code decode table (RFC §4.2.1): the
    * last symbol's weight is implied from the power-of-two remainder;
    * codes assign lowest weight (longest codes) first, value 0 up,
    * symbols ascending within a weight; stepping one weight up
    * shortens codes one bit (the running code value halves). */
  private def hufFromWeights(explicit: Array[Int]): HufTable = {
    var total = 0L
    explicit.foreach { w =>
      if (w < 0 || w > 11) invalidErr()
      if (w > 0) total += 1L << (w - 1)
    }
    if (total == 0) invalidErr()
    val tableLog = (64 - java.lang.Long.numberOfLeadingZeros(total)).toInt
    if (tableLog > 11) invalidErr()
    val rest = (1L << tableLog) - total
    if (rest <= 0 || java.lang.Long.bitCount(rest) != 1) invalidErr()
    val lastWeight = java.lang.Long.numberOfTrailingZeros(rest).toInt + 1
    val all = explicit :+ lastWeight
    if (all.length > 256) invalidErr()
    val entries = 1 << tableLog
    val symT = new Array[Int](entries)
    val lenT = new Array[Int](entries)
    var code = 0L // runs in units of the CURRENT weight's code length
    var w = 1
    while (w <= tableLog) {
      val len = tableLog + 1 - w
      var sym = 0
      while (sym < all.length) {
        if (all(sym) == w) {
          val span = 1 << (tableLog - len)
          val base = (code << (tableLog - len)).toInt
          if (base + span > entries) invalidErr()
          var k = 0
          while (k < span) {
            symT(base + k) = sym; lenT(base + k) = len; k += 1
          }
          code += 1
        }
        sym += 1
      }
      // next weight's codes are one bit shorter: halve the running
      // value (weights pack so this is always exact)
      if ((code & 1L) != 0L && w < tableLog) invalidErr()
      code >>= 1
      w += 1
    }
    new HufTable(tableLog, symT, lenT)
  }

  /** Huffman tree description: direct 4-bit weights, or
    * FSE-compressed weights decoded with two interleaved states.
    * Returns (table, bytes consumed). */
  private def hufReadTable(b: Array[Byte], off: Int, end: Int)
      : (HufTable, Int) = {
    if (off >= end) invalidErr()
    val h = b(off) & 0xff
    if (h >= 128) {
      val numSym = h - 127
      val bytes = (numSym + 1) / 2
      if (off + 1 + bytes > end) invalidErr()
      val weights = new Array[Int](numSym)
      var i = 0
      while (i < numSym) {
        val by = b(off + 1 + i / 2) & 0xff
        weights(i) = if (i % 2 == 0) by >> 4 else by & 0xf
        i += 1
      }
      (hufFromWeights(weights), 1 + bytes)
    } else {
      val compSize = h
      if (off + 1 + compSize > end) invalidErr()
      val fw = new FwdBits(b, off + 1, off + 1 + compSize)
      val table = fseReadTable(fw, maxLog = 6, maxSymbol = 15)
      val back = new BackBits(b, fw.byteAligned, off + 1 + compSize)
      var s1 = back.read(table.tableLog)
      var s2 = back.read(table.tableLog)
      val weights = scala.collection.mutable.ArrayBuffer.empty[Int]
      var done = false
      while (!done) {
        if (weights.length > 254) invalidErr()
        weights += table.symbol(s1)
        if (back.bitsLeft < table.nbBits(s1)) {
          weights += table.symbol(s2)
          done = true
        } else {
          s1 = table.newStateBase(s1) + back.read(table.nbBits(s1))
          weights += table.symbol(s2)
          if (back.bitsLeft < table.nbBits(s2)) {
            weights += table.symbol(s1)
            done = true
          } else {
            s2 = table.newStateBase(s2) + back.read(table.nbBits(s2))
          }
        }
      }
      (hufFromWeights(weights.toArray), 1 + compSize)
    }
  }

  private def hufDecodeStream(
      table: HufTable, b: Array[Byte], start: Int, end: Int,
      out: Array[Byte], outOff: Int, count: Int): Unit = {
    val back = new BackBits(b, start, end)
    var i = 0
    while (i < count) {
      val idx = back.peekPad(table.tableLog)
      val len = table.lens(idx)
      if (len == 0) invalidErr()
      back.consume(len)
      out(outOff + i) = table.symbols(idx).toByte
      i += 1
    }
    if (back.bitsLeft != 0) invalidErr() // exact consumption
  }

  // ---------------------------------------------------------------
  // literals section
  // ---------------------------------------------------------------

  /** (literals, bytes consumed, Huffman table to carry forward). */
  private def readLiterals(
      b: Array[Byte], off: Int, blockEnd: Int,
      prevHuf: Option[HufTable]): (Array[Byte], Int, Option[HufTable]) = {
    if (off >= blockEnd) invalidErr()
    val b0 = b(off) & 0xff
    val tpe = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    tpe match {
      case 0 | 1 => // Raw | RLE
        val (regen, hdr) =
          if ((sizeFormat & 1) == 0) (b0 >> 3, 1) // 5-bit size
          else if (sizeFormat == 1) {
            if (off + 2 > blockEnd) invalidErr()
            ((b0 >> 4) | ((b(off + 1) & 0xff) << 4), 2)
          } else {
            if (off + 3 > blockEnd) invalidErr()
            ((b0 >> 4) | ((b(off + 1) & 0xff) << 4) |
              ((b(off + 2) & 0xff) << 12), 3)
          }
        if (regen > MaxBlockSize) invalidErr()
        if (tpe == 0) {
          if (off + hdr + regen > blockEnd) invalidErr()
          (java.util.Arrays.copyOfRange(b, off + hdr, off + hdr + regen),
            hdr + regen, prevHuf)
        } else {
          if (off + hdr + 1 > blockEnd) invalidErr()
          (Array.fill[Byte](regen)(b(off + hdr)), hdr + 1, prevHuf)
        }
      case _ => // Compressed | Treeless
        var regen = 0; var comp = 0; var hdr = 0
        var fourStreams = true
        sizeFormat match {
          case 0 | 1 =>
            if (off + 3 > blockEnd) invalidErr()
            val h = b0 | ((b(off + 1) & 0xff) << 8) |
              ((b(off + 2) & 0xff) << 16)
            regen = (h >> 4) & 0x3ff
            comp = (h >> 14) & 0x3ff
            hdr = 3
            fourStreams = sizeFormat == 1
          case 2 =>
            if (off + 4 > blockEnd) invalidErr()
            val h = b0.toLong | ((b(off + 1) & 0xffL) << 8) |
              ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
            regen = ((h >> 4) & 0x3fff).toInt
            comp = ((h >> 18) & 0x3fff).toInt
            hdr = 4
          case _ =>
            if (off + 5 > blockEnd) invalidErr()
            val h = b0.toLong | ((b(off + 1) & 0xffL) << 8) |
              ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24) |
              ((b(off + 4) & 0xffL) << 32)
            regen = ((h >> 4) & 0x3ffff).toInt
            comp = ((h >> 22) & 0x3ffff).toInt
            hdr = 5
        }
        if (regen > MaxBlockSize || comp > MaxBlockSize) invalidErr()
        if (off + hdr + comp > blockEnd) invalidErr()
        var payload = off + hdr
        val payloadEnd = off + hdr + comp
        val table =
          if (tpe == 2) {
            val (t, consumed) = hufReadTable(b, payload, payloadEnd)
            payload += consumed
            t
          } else prevHuf.getOrElse(invalidErr()) // treeless needs one
        val lits = new Array[Byte](regen)
        if (!fourStreams)
          hufDecodeStream(table, b, payload, payloadEnd, lits, 0, regen)
        else {
          if (payload + 6 > payloadEnd) invalidErr()
          def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
          val sizes = Array(le16(payload), le16(payload + 2),
            le16(payload + 4), 0)
          val dataStart = payload + 6
          val total = payloadEnd - dataStart
          if (sizes(0) + sizes(1) + sizes(2) > total) invalidErr()
          sizes(3) = total - sizes(0) - sizes(1) - sizes(2)
          val per = (regen + 3) / 4
          val counts = Array(per, per, per, regen - 3 * per)
          if (counts(3) < 0) invalidErr()
          var start = dataStart
          var outOff = 0
          var k = 0
          while (k < 4) {
            hufDecodeStream(table, b, start, start + sizes(k),
              lits, outOff, counts(k))
            start += sizes(k)
            outOff += counts(k)
            k += 1
          }
        }
        (lits, hdr + comp, Some(table))
    }
  }

  // ---------------------------------------------------------------
  // frames
  // ---------------------------------------------------------------

  /** Decompress a full zstd input (concatenated + skippable frames).
    * None on malformed / dictionary / checksum-mismatch input. */
  def decompress(bytes: Array[Byte]): Option[Array[Byte]] = {
    try Some(decompress0(bytes))
    catch { case _: Exception => None }
  }

  /** Spec-side diagnosis entry: same decode, exceptions surface. */
  private[operators] def decompressOrThrow(bytes: Array[Byte]): Array[Byte] =
    decompress0(bytes)

  private def u32le(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) invalidErr()
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  private def decompress0(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 4) invalidErr()
    val out = new ZBuf
    var pos = 0
    var sawFrame = false
    while (pos < b.length) {
      val magic = u32le(b, pos)
      if ((magic & 0xFFFFFFF0L) == SkippableBase) {
        val size = u32le(b, pos + 4)
        if (pos + 8 + size > b.length) invalidErr()
        pos += 8 + size.toInt
      } else if (magic == Magic) {
        sawFrame = true
        pos = decodeFrame(b, pos + 4, out)
      } else invalidErr()
    }
    if (!sawFrame) invalidErr()
    out.toByteArray
  }

  /** One frame after its magic; returns the position after the frame
    * (including the checksum when present). Appends to `out`. */
  private def decodeFrame(b: Array[Byte], start: Int, out: ZBuf): Int = {
    var pos = start
    if (pos >= b.length) invalidErr()
    val desc = b(pos) & 0xff
    pos += 1
    if ((desc & 0x08) != 0) invalidErr() // reserved bit
    val fcsFlag = (desc >> 6) & 3
    val singleSegment = (desc & 0x20) != 0
    val hasChecksum = (desc & 0x04) != 0
    val dictFlag = desc & 3
    if (!singleSegment) {
      if (pos >= b.length) invalidErr()
      pos += 1 // window descriptor
    }
    val dictBytes = dictFlag match {
      case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
    }
    if (dictBytes > 0) {
      if (pos + dictBytes > b.length) invalidErr()
      var dId = 0L
      var i = 0
      while (i < dictBytes) { dId |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      if (dId != 0) invalidErr() // dictionaries: out of subset
      pos += dictBytes
    }
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2; case 2 => 4; case _ => 8
    }
    var declared = -1L
    if (fcsBytes > 0) {
      if (pos + fcsBytes > b.length) invalidErr()
      var v = 0L
      var i = 0
      while (i < fcsBytes) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      declared = if (fcsBytes == 2) v + 256 else v
      pos += fcsBytes
    }

    // frame content decodes into its own buffer: offsets reference
    // the current frame's window only (no dictionary)
    val frame = new ZBuf
    var prevHuf: Option[HufTable] = None
    var prevLL: Option[FseTable] = None
    var prevOF: Option[FseTable] = None
    var prevML: Option[FseTable] = None
    val reps = Array(1, 4, 8)
    var last = false
    while (!last) {
      if (pos + 3 > b.length) invalidErr()
      val hdr = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16)
      pos += 3
      last = (hdr & 1) == 1
      val btype = (hdr >> 1) & 3
      val bsize = hdr >> 3
      btype match {
        case 0 => // raw
          if (pos + bsize > b.length) invalidErr()
          frame.write(b, pos, bsize)
          pos += bsize
        case 1 => // RLE
          if (pos >= b.length || bsize > MaxBlockSize) invalidErr()
          val v = b(pos)
          pos += 1
          var i = 0
          while (i < bsize) { frame.write(v); i += 1 }
        case 2 => // compressed
          if (bsize > MaxBlockSize || pos + bsize > b.length) invalidErr()
          val blockEnd = pos + bsize
          val (lits, litBytes, huf) =
            readLiterals(b, pos, blockEnd, prevHuf)
          prevHuf = huf
          var sp = pos + litBytes
          if (sp >= blockEnd) invalidErr()
          val s0 = b(sp) & 0xff
          var seqCount = 0
          if (s0 < 128) { seqCount = s0; sp += 1 }
          else if (s0 < 255) {
            if (sp + 2 > blockEnd) invalidErr()
            seqCount = ((s0 - 128) << 8) + (b(sp + 1) & 0xff)
            sp += 2
          } else {
            if (sp + 3 > blockEnd) invalidErr()
            seqCount = (b(sp + 1) & 0xff) + ((b(sp + 2) & 0xff) << 8) +
              0x7f00
            sp += 3
          }
          if (seqCount == 0) {
            if (sp != blockEnd) invalidErr()
            frame.write(lits, 0, lits.length)
          } else {
            if (sp >= blockEnd) invalidErr()
            val modes = b(sp) & 0xff
            if ((modes & 3) != 0) invalidErr() // reserved bits
            sp += 1
            def seqTable(off: Int, mode: Int, default: FseTable,
                maxLog: Int, maxSymbol: Int, prev: Option[FseTable])
                : (FseTable, Int) = mode match {
              case 0 => (default, off)
              case 1 =>
                if (off >= blockEnd) invalidErr()
                val sym = b(off) & 0xff
                if (sym > maxSymbol) invalidErr()
                (fseRle(sym), off + 1)
              case 2 =>
                val fw = new FwdBits(b, off, blockEnd)
                val t = fseReadTable(fw, maxLog, maxSymbol)
                (t, fw.byteAligned)
              case _ => (prev.getOrElse(invalidErr()), off)
            }
            val (llT, p1) = seqTable(sp, (modes >> 6) & 3,
              llDefaultTable, 9, 35, prevLL)
            val (ofT, p2) = seqTable(p1, (modes >> 4) & 3,
              ofDefaultTable, 8, 31, prevOF)
            val (mlT, p3) = seqTable(p2, (modes >> 2) & 3,
              mlDefaultTable, 9, 52, prevML)
            prevLL = Some(llT); prevOF = Some(ofT); prevML = Some(mlT)
            val back = new BackBits(b, p3, blockEnd)
            // state init order: literals, offsets, match (RFC §3.1.1.4)
            var llS = back.read(llT.tableLog)
            var ofS = back.read(ofT.tableLog)
            var mlS = back.read(mlT.tableLog)
            var litPos = 0
            var i = 0
            while (i < seqCount) {
              // per-sequence bit order: offset, match, literals
              val ofCode = ofT.symbol(ofS)
              if (ofCode > 31) invalidErr()
              val offsetValue =
                (1L << ofCode) + (if (ofCode > 0) back.read(ofCode) else 0)
              val ml = mlValue(mlT.symbol(mlS), back)
              val ll = llValue(llT.symbol(llS), back)
              var offset = 0L
              if (offsetValue > 3) {
                offset = offsetValue - 3
                if (offset > Int.MaxValue) invalidErr()
                reps(2) = reps(1); reps(1) = reps(0)
                reps(0) = offset.toInt
              } else {
                // repeat offsets, with the literals-length-0 shift
                val idx = if (ll == 0) offsetValue.toInt
                  else offsetValue.toInt - 1
                if (idx == 0) offset = reps(0)
                else if (idx == 1) {
                  offset = reps(1)
                  val t = reps(0); reps(0) = reps(1); reps(1) = t
                } else if (idx == 2) {
                  offset = reps(2)
                  reps(2) = reps(1); reps(1) = reps(0)
                  reps(0) = offset.toInt
                } else { // ll == 0 && offsetValue == 3: rep1 - 1
                  offset = reps(0) - 1
                  if (offset < 1) invalidErr()
                  reps(2) = reps(1); reps(1) = reps(0)
                  reps(0) = offset.toInt
                }
              }
              if (litPos + ll > lits.length) invalidErr()
              frame.write(lits, litPos, ll)
              litPos += ll
              frame.copyBack(offset.toInt, ml)
              if (frame.size > MaxOutput) invalidErr()
              if (i < seqCount - 1) {
                // state update order: literals, match, offset
                llS = llT.newStateBase(llS) + back.read(llT.nbBits(llS))
                mlS = mlT.newStateBase(mlS) + back.read(mlT.nbBits(mlS))
                ofS = ofT.newStateBase(ofS) + back.read(ofT.nbBits(ofS))
              }
              i += 1
            }
            if (back.bitsLeft != 0) invalidErr()
            if (litPos < lits.length)
              frame.write(lits, litPos, lits.length - litPos)
          }
          pos = blockEnd
        case _ => invalidErr() // reserved block type
      }
      if (frame.size > MaxOutput) invalidErr()
    }
    val content = frame.toByteArray
    if (declared >= 0 && content.length != declared) invalidErr()
    if (hasChecksum) {
      if (pos + 4 > b.length) invalidErr()
      val want = u32le(b, pos)
      pos += 4
      val got = xxh64(content) & 0xffffffffL
      if (got != want) invalidErr()
    }
    out.write(content, 0, content.length)
    pos
  }

  /** XXH64 over a byte array, seed 0 — the content-checksum primitive
    * (Spark ships the reference implementation for its xxhash64).
    * Shared with the [[Zstd]] fixture writer so engine-written frames
    * carry real checksums. */
  private[operators] def xxh64(content: Array[Byte]): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      content, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      content.length, 0L)
}
