package graft.operators

/** Restricted-but-REAL baseline JPEG codec — the JPEG twin of
  * [[PngPixels]]'s subset approach. Full baseline JPEG needs AC
  * coefficient entropy decoding + 2-D IDCT; the DC-ONLY subset (every
  * 8×8 block flat) keeps all the *format* machinery real while the
  * pixel math stays exact:
  *
  *  - real marker structure (SOI, APP0/JFIF, DQT, SOF0, two DHTs,
  *    SOS, EOI) that any standards-compliant parser walks;
  *  - a real entropy bitstream: canonical Huffman codes (the Annex K
  *    standard DC luminance table), DC prediction with the spec's
  *    category + one's-complement value bits, MSB-first bit packing
  *    with 0xFF→0xFF00 byte stuffing and 1-padded flush;
  *  - real dequantization and the (exact, integer) flat-block IDCT:
  *    with q0=8 the DC round-trips bit-exactly, so decoded samples
  *    equal the writer's contract with no rounding slack.
  *
  * The writer emits one flat 8×8 block per (component, block-x,
  * block-y) with value [[blockVal]] — a pure function the SQL oracle
  * recomputes analytically. The reader decodes the DC coefficient per
  * block and rejects (None, never a throw) anything outside the
  * subset: AC coefficients present, subsampling, progressive frames,
  * restart markers, 16-bit quant tables, truncation, or a corrupt
  * stream. 3-component output is the raw Y/Cb/Cr component planes
  * interleaved (no color transform — what a baseline decoder holds
  * before color conversion). */
object JpegDc {

  /** Flat value of block (bx, by) in component c — the oracle
    * contract: `(3bx + 5by + 7id + 11c) mod 256`. */
  def blockVal(id: Long, bx: Int, by: Int, c: Int): Int =
    math.floorMod(bx * 3L + by * 5L + id * 7L + c * 11L, 256L).toInt

  // Annex K.3 standard DC luminance Huffman spec: codes/length 1..16,
  // then the 12 category symbols
  private val DcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)
  // minimal AC table: the single EOB symbol (0x00) as a 1-bit code —
  // legal DHT, and the only AC symbol a DC-only stream ever emits
  private val AcBits =
    Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Array(0)

  /** Canonical code assignment per Annex C: (code, length) per symbol. */
  private def canonical(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.toMap
  }

  private val q0 = 8 // quant[0]: 8 divides the flat-block DC exactly

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1) // pad with 1s
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** Full DC-only baseline JPEG; `w`/`h` multiples of 8, `nComp` 1
    * (grayscale) or 3 (4:4:4, no subsampling). */
  def jpegWithPixels(id: Long, w: Int, h: Int, nComp: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"dims must be positive multiples of 8, got ${w}x$h")
    require(nComp == 1 || nComp == 3, s"nComp $nComp")
    val bos = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = bos.write(x & 0xff)
    def b16(x: Int): Unit = { b(x >> 8); b(x) }
    def marker(m: Int): Unit = { b(0xff); b(m) }
    marker(0xd8) // SOI
    marker(0xe0); b16(16) // APP0/JFIF
    Seq('J', 'F', 'I', 'F', 0).foreach(c => b(c.toInt))
    b(1); b(1); b(0); b16(1); b16(1); b(0); b(0)
    marker(0xdb); b16(67); b(0x00) // DQT: Pq=0 (8-bit), Tq=0
    b(q0); (1 until 64).foreach(_ => b(16))
    marker(0xc0); b16(8 + 3 * nComp) // SOF0 baseline
    b(8); b16(h); b16(w); b(nComp)
    (0 until nComp).foreach { c => b(c + 1); b(0x11); b(0) }
    marker(0xc4); b16(2 + 1 + 16 + DcVals.length); b(0x00) // DHT DC 0
    DcBits.foreach(b); DcVals.foreach(b)
    marker(0xc4); b16(2 + 1 + 16 + AcVals.length); b(0x10) // DHT AC 0
    AcBits.foreach(b); AcVals.foreach(b)
    marker(0xda); b16(6 + 2 * nComp); b(nComp) // SOS
    (0 until nComp).foreach { c => b(c + 1); b(0x00) }
    b(0); b(63); b(0) // Ss, Se, Ah/Al

    val dcCodes = canonical(DcBits, DcVals)
    val acCodes = canonical(AcBits, AcVals)
    val bw = new BitWriter(bos)
    val pred = new Array[Int](nComp)
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        var c = 0
        while (c < nComp) {
          val dcq = blockVal(id, bx, by, c) - 128 // exact: DC/q0
          val diff = dcq - pred(c)
          pred(c) = dcq
          val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(
            math.abs(diff))
          val (code, len) = dcCodes(t)
          bw.put(code, len)
          if (t > 0) {
            val v = if (diff > 0) diff else diff + (1 << t) - 1
            bw.put(v, t)
          }
          val (eob, eobLen) = acCodes(0)
          bw.put(eob, eobLen)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    bos.toByteArray
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var bad = false
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { bad = true; return 1 }
        val x = b(pos) & 0xff
        pos += 1
        if (x == 0xff) {
          if (pos >= b.length || (b(pos) & 0xff) != 0x00) {
            // a real marker inside entropy data (e.g. RSTn) or
            // truncation — outside the supported subset
            bad = true; return 1
          }
          pos += 1 // skip stuffed 0x00
        }
        acc = x; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** Huffman decode via the canonical (code,len) map inverted to
    * len→code→symbol; max 16 bits. */
  private def decodeSym(br: BitReader,
      table: Map[(Int, Int), Int]): Int = {
    var code = 0
    var len = 0
    while (len < 16) {
      code = (code << 1) | br.bit()
      len += 1
      table.get((code, len)) match {
        case Some(s) => return s
        case None => ()
      }
    }
    br.bad = true
    -1
  }

  private def invert(m: Map[Int, (Int, Int)]): Map[(Int, Int), Int] =
    m.map { case (sym, (code, len)) => (code, len) -> sym }

  /** Real decode of the DC-only subset; None on anything else. */
  def decode(bytes: Array[Byte]): Option[PngPixels.Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def decode0(b: Array[Byte]): Option[PngPixels.Decoded] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    var w = 0; var h = 0; var nComp = 0
    var quant0 = -1
    var dcTable: Map[(Int, Int), Int] = null
    var acTable: Map[(Int, Int), Int] = null
    var sosAt = -1
    def be16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    while (sosAt < 0) {
      if (i + 3 >= b.length) return None
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) { i += 2 }
      else {
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        m match {
          case 0xdb =>
            // possibly several tables per segment
            var o = i + 4
            while (o < i + 2 + len) {
              val pq = (b(o) & 0xff) >> 4
              val tq = b(o) & 0x0f
              if (pq != 0) return None // 16-bit tables unsupported
              if (tq == 0) quant0 = b(o + 1) & 0xff
              o += 1 + 64
            }
          case 0xc0 =>
            h = be16(i + 5); w = be16(i + 7)
            nComp = b(i + 9) & 0xff
            if (w <= 0 || h <= 0 || w % 8 != 0 || h % 8 != 0) return None
            if (nComp != 1 && nComp != 3) return None
            var c = 0
            while (c < nComp) {
              if ((b(i + 11 + 3 * c) & 0xff) != 0x11) return None // 4:4:4 only
              c += 1
            }
          case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 &&
            x != 0xcc => return None // progressive/extended unsupported
          case 0xc4 =>
            var o = i + 4
            while (o < i + 2 + len) {
              val tc = (b(o) & 0xff) >> 4
              val bits = Array.tabulate(16)(j => b(o + 1 + j) & 0xff)
              val n = bits.sum
              val vals = Array.tabulate(n)(j => b(o + 17 + j) & 0xff)
              val tbl = invert(canonical(bits, vals))
              if (tc == 0) dcTable = tbl else acTable = tbl
              o += 17 + n
            }
          case 0xda => sosAt = i + 2 + len
          case _ => ()
        }
        i += 2 + len
      }
    }
    if (w == 0 || quant0 <= 0 || dcTable == null || acTable == null)
      return None
    val br = new BitReader(b, sosAt)
    val ch = nComp
    // untrusted dims: size the buffer in Long and cap BEFORE allocating
    // (same contract as PngPixels — dirty bytes → None, never an OOM)
    if (w.toLong * ch * h > PngPixels.MaxDecodedBytes) return None
    val stride = w * ch
    val pixels = new Array[Byte](stride * h)
    val pred = new Array[Int](ch)
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        var c = 0
        while (c < ch) {
          val t = decodeSym(br, dcTable)
          if (br.bad || t > 11) return None
          val diff =
            if (t == 0) 0
            else {
              val v = br.bits(t)
              if (v < (1 << (t - 1))) v - (1 << t) + 1 else v
            }
          pred(c) += diff
          // AC run: a DC-only stream EOBs immediately; anything else
          // needs the full IDCT machinery — outside the subset
          if (decodeSym(br, acTable) != 0x00 || br.bad) return None
          val dc = pred(c) * quant0
          val sample = math.max(0, math.min(255,
            math.round(dc / 8.0).toInt + 128))
          var yy = 0
          while (yy < 8) {
            val rowOff = ((by * 8 + yy) * w + bx * 8) * ch + c
            var xx = 0
            while (xx < 8) {
              pixels(rowOff + xx * ch) = sample.toByte
              xx += 1
            }
            yy += 1
          }
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    Some(PngPixels.Decoded(w, h, ch, pixels))
  }
}
