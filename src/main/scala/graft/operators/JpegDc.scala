package graft.operators

/** REAL baseline JPEG codec — the JPEG twin of [[PngPixels]].
  *
  * The READER is a general baseline (SOF0) decoder: marker walk, full
  * zigzag-ordered quantization tables (up to 4, per-component Tq),
  * canonical Huffman tables from DHT (up to 4 DC + 4 AC, per-component
  * Td/Ta from SOS), DC prediction with the spec's category +
  * one's-complement value bits, run-length AC coefficient decode
  * (ZRL/EOB), dequantization, dezigzag, a real separable 2-D IDCT
  * (spec A.3.3), level shift + clamp, and edge-block cropping for
  * non-multiple-of-8 dimensions. CHROMA SUBSAMPLING is real: sampling
  * factors h,v ∈ {1,2} per component (4:4:4, 4:2:2, 4:4:0, 4:2:0 —
  * what web crawls actually contain) decode through interleaved
  * multi-block MCUs (spec A.2.3) into per-component planes, then
  * nearest-neighbor (sample-replication) upsampling to the full grid.
  * Byte stuffing (0xFF→0xFF00) and 1-padded flush are handled in the
  * bit reader. RESTART MARKERS are real: a DRI interval makes the
  * decoder expect RST0..RST7 (cycling) every Ri MCUs — byte-aligned,
  * modulo-8 sequence checked, DC predictors reset (spec F.2.1.3.1) —
  * which is how real crawl JPEGs arrive (cameras emit DRI almost
  * universally for error resilience). Outside the subset —
  * progressive/extended frames, sampling factors > 2, 16-bit quant
  * tables, truncation, corrupt streams — the decoder returns None,
  * never throws. 3-component output is the raw Y/Cb/Cr planes interleaved
  * (no color transform — what a baseline decoder holds before color
  * conversion).
  *
  * Three WRITERS give the decoder analytic oracles:
  *
  *  - [[jpegWithPixels]] (DC-only): every 8×8 block flat at
  *    [[blockVal]] — one Huffman-coded DC diff + EOB per block.
  *  - [[jpegWithAcPixels]] (real AC): each block carries DC plus TWO
  *    AC coefficients, at zigzag 10 = (u=0,v=4) and zigzag 39 =
  *    (u=4,v=4). Those basis functions are EXACTLY ±1/8 at every
  *    sample — cos((2t+1)·4π/16) = ±√2/2, and the √2 factors cancel
  *    against C(u)C(v)/4 — so with quant step 8 at those slots the
  *    decoded sample is the exact integer
  *    `base + a·sgn(y) + b·sgn(x)·sgn(y)` ([[acPix]]): a SQL oracle
  *    re-derives every pixel with no DCT at all, while the engine ran
  *    the full entropy-decode → dequant → IDCT pipeline. A zigzag,
  *    dequant, run-length, or IDCT bug lands the energy on the wrong
  *    samples and breaks the per-pixel match.
  *  - [[jpegWithAcPixelsSampled]] (subsampled): the AC writer with Y
  *    at sampling (yH, yV) and 1×1 chroma, emitting real interleaved
  *    MCUs (yH·yV luma blocks + Cb + Cr per MCU). Decoded luma is
  *    [[acPix]] on the full grid; decoded chroma at (x, y) is
  *    [[acPix]] evaluated at the CHROMA-PLANE coordinate
  *    (x/yH, y/yV) — [[subPix]] — because upsampling is sample
  *    replication. An MCU-ordering, plane, or upsampling bug moves
  *    samples and breaks the positional match.
  */
object JpegDc {

  /** Flat value of block (bx, by) in component c — the DC-only oracle
    * contract: `(3bx + 5by + 7id + 11c) mod 256`. */
  def blockVal(id: Long, bx: Int, by: Int, c: Int): Int =
    math.floorMod(bx * 3L + by * 5L + id * 7L + c * 11L, 256L).toInt

  // ---- the AC pixel contract ---------------------------------------

  /** Sign of cos((2t+1)·4π/16): +1 for t ≡ 0,3,4,7 (mod 8), else −1. */
  def sgn(t: Int): Int = {
    val m = t % 8
    if (m == 0 || m == 3 || m == 4 || m == 7) 1 else -1
  }

  /** Per-block DC level of the AC writer, in [64, 191] so the ±30 AC
    * swing never clamps. */
  def acBase(id: Long, bx: Int, by: Int, c: Int): Int =
    64 + math.floorMod(bx * 3L + by * 5L + id * 7L + c * 11L, 128L).toInt

  /** Quantized (u=0, v=4) coefficient, in [−15, 15]. */
  def acA(id: Long, bx: Int, by: Int, c: Int): Int =
    math.floorMod(bx * 2L + by * 3L + id * 5L + c * 7L, 31L).toInt - 15

  /** Quantized (u=4, v=4) coefficient, in [−15, 15]. */
  def acB(id: Long, bx: Int, by: Int, c: Int): Int =
    math.floorMod(bx * 1L + by * 2L + id * 3L + c * 5L, 31L).toInt - 15

  /** The decoded sample [[jpegWithAcPixels]] produces at (x, y, c) —
    * exact integer math, no DCT: the two AC basis functions are ±1/8
    * everywhere and the quant step at their slots is 8. */
  def acPix(id: Long, x: Int, y: Int, c: Int): Int = {
    val bx = x / 8; val by = y / 8
    acBase(id, bx, by, c) + acA(id, bx, by, c) * sgn(y) +
      acB(id, bx, by, c) * sgn(x) * sgn(y)
  }

  /** The decoded sample [[jpegWithAcPixelsSampled]] produces at
    * (x, y, c): luma is [[acPix]] on the full grid; chroma (1×1
    * against luma (yH, yV)) lives on a ceil(w/yH)×ceil(h/yV) plane and
    * replicates, so the full-grid sample is [[acPix]] at the
    * floor-divided plane coordinate. */
  def subPix(id: Long, x: Int, y: Int, c: Int, yH: Int, yV: Int): Int =
    if (c == 0) acPix(id, x, y, 0)
    else acPix(id, x / yH, y / yV, c)

  // ---- tables ------------------------------------------------------

  /** Zigzag scan position → natural (v*8 + u) position, per spec
    * Figure A.6. DQT values and entropy-coded coefficients arrive in
    * this order. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3 standard DC luminance Huffman spec: codes/length 1..16,
  // then the 12 category symbols
  private val DcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)

  // Annex K.3 standard AC luminance table: 162 run/size symbols
  private val AcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // minimal AC table used by the DC-only writer: the single EOB symbol
  // (0x00) as a 1-bit code — legal DHT, and the only AC symbol a
  // DC-only stream ever emits
  private val AcBitsMin =
    Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcValsMin = Array(0)

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

  /** IDCT basis with normalization folded in:
    * `CosT(u)(x) = C(u)/2 · cos((2x+1)uπ/16)` — the separable halves
    * of spec A.3.3's `1/4·C(u)C(v)` 2-D kernel. */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---- writers -----------------------------------------------------

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

  /** Shared header emitter: SOI..SOS for a baseline frame. `samp` is
    * the packed (h<<4)|v sampling byte per component (null = all
    * 0x11, i.e. 4:4:4). The quant table arrives in NATURAL order and
    * is emitted in zigzag order as DQT requires. */
  private def writeHeaders(bos: java.io.ByteArrayOutputStream,
      w: Int, h: Int, nComp: Int, quantNat: Array[Int],
      acBits: Array[Int], acVals: Array[Int],
      samp: Array[Int] = null, ri: Int = 0): Unit = {
    def b(x: Int): Unit = bos.write(x & 0xff)
    def b16(x: Int): Unit = { b(x >> 8); b(x) }
    def marker(m: Int): Unit = { b(0xff); b(m) }
    marker(0xd8) // SOI
    marker(0xe0); b16(16) // APP0/JFIF
    Seq('J', 'F', 'I', 'F', 0).foreach(c => b(c.toInt))
    b(1); b(1); b(0); b16(1); b16(1); b(0); b(0)
    marker(0xdb); b16(67); b(0x00) // DQT: Pq=0 (8-bit), Tq=0
    (0 until 64).foreach(i => b(quantNat(Zigzag(i))))
    if (ri > 0) { marker(0xdd); b16(4); b16(ri) } // DRI
    marker(0xc0); b16(8 + 3 * nComp) // SOF0 baseline
    b(8); b16(h); b16(w); b(nComp)
    (0 until nComp).foreach { c =>
      b(c + 1); b(if (samp == null) 0x11 else samp(c)); b(0)
    }
    marker(0xc4); b16(2 + 1 + 16 + DcVals.length); b(0x00) // DHT DC 0
    DcBits.foreach(b); DcVals.foreach(b)
    marker(0xc4); b16(2 + 1 + 16 + acVals.length); b(0x10) // DHT AC 0
    acBits.foreach(b); acVals.foreach(b)
    marker(0xda); b16(6 + 2 * nComp); b(nComp) // SOS
    (0 until nComp).foreach { c => b(c + 1); b(0x00) }
    b(0); b(63); b(0) // Ss, Se, Ah/Al
  }

  private def emitDc(bw: BitWriter, dcCodes: Map[Int, (Int, Int)],
      diff: Int): Unit = {
    val t = if (diff == 0) 0
      else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val (code, len) = dcCodes(t)
    bw.put(code, len)
    if (t > 0) {
      val v = if (diff > 0) diff else diff + (1 << t) - 1
      bw.put(v, t)
    }
  }

  /** Full DC-only baseline JPEG; `w`/`h` multiples of 8, `nComp` 1
    * (grayscale) or 3 (4:4:4, no subsampling). */
  def jpegWithPixels(id: Long, w: Int, h: Int, nComp: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"dims must be positive multiples of 8, got ${w}x$h")
    require(nComp == 1 || nComp == 3, s"nComp $nComp")
    val bos = new java.io.ByteArrayOutputStream()
    val quantNat = Array.fill(64)(16); quantNat(0) = q0
    writeHeaders(bos, w, h, nComp, quantNat, AcBitsMin, AcValsMin)
    val dcCodes = canonical(DcBits, DcVals)
    val acCodes = canonical(AcBitsMin, AcValsMin)
    val bw = new BitWriter(bos)
    val pred = new Array[Int](nComp)
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        var c = 0
        while (c < nComp) {
          val dcq = blockVal(id, bx, by, c) - 128 // exact: DC/q0
          emitDc(bw, dcCodes, dcq - pred(c))
          pred(c) = dcq
          val (eob, eobLen) = acCodes(0)
          bw.put(eob, eobLen)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /** One AC-contract block for component `c` at block coords
    * (bx, by): DC = [[acBase]]−128 plus [[acA]] at zigzag 10 and
    * [[acB]] at zigzag 39, pushed through the generic spec F.1.2.2
    * run-length coder (a ZRL symbol per 16 zeros of run, EOB iff
    * zeros trail the last nonzero). Shared by the 4:4:4 and
    * subsampled writers so both exercise identical entropy coding. */
  private def emitAcBlock(bw: BitWriter, dcCodes: Map[Int, (Int, Int)],
      acCodes: Map[Int, (Int, Int)], pred: Array[Int],
      id: Long, bx: Int, by: Int, c: Int): Unit = {
    def emitAcCoef(run: Int, v: Int): Unit = {
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(v))
      val (code, len) = acCodes((run << 4) | s)
      bw.put(code, len)
      val bits = if (v > 0) v else v + (1 << s) - 1
      bw.put(bits, s)
    }
    val dcq = acBase(id, bx, by, c) - 128
    emitDc(bw, dcCodes, dcq - pred(c))
    pred(c) = dcq
    val a = acA(id, bx, by, c)
    val bq = acB(id, bx, by, c)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = if (k == 10) a else if (k == 39) bq else 0
      if (v == 0) run += 1
      else {
        while (run > 15) {
          val (z, zl) = acCodes(0xf0); bw.put(z, zl); run -= 16
        }
        emitAcCoef(run, v)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (e, el) = acCodes(0x00); bw.put(e, el) }
  }

  /** Baseline JPEG with REAL AC coefficients: per block, DC =
    * [[acBase]]−128 plus [[acA]] at zigzag 10 and [[acB]] at zigzag
    * 39, entropy-coded with the full Annex K AC table (run-length 9,
    * a ZRL for the 28-zero gap, EOB). Quant steps are 8 at the three
    * used slots, so decoded samples equal [[acPix]] exactly (see the
    * header note). Arbitrary positive dims — edge blocks crop. */
  def jpegWithAcPixels(id: Long, w: Int, h: Int, nComp: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"dims must be positive, got ${w}x$h")
    require(nComp == 1 || nComp == 3, s"nComp $nComp")
    val bos = new java.io.ByteArrayOutputStream()
    val quantNat = Array.fill(64)(16)
    quantNat(0) = q0
    quantNat(Zigzag(10)) = 8 // (u=0, v=4)
    quantNat(Zigzag(39)) = 8 // (u=4, v=4)
    writeHeaders(bos, w, h, nComp, quantNat, AcBits, AcVals)
    val dcCodes = canonical(DcBits, DcVals)
    val acCodes = canonical(AcBits, AcVals)
    val bw = new BitWriter(bos)
    val pred = new Array[Int](nComp)
    val blocksY = (h + 7) / 8
    val blocksX = (w + 7) / 8
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        var c = 0
        while (c < nComp) {
          emitAcBlock(bw, dcCodes, acCodes, pred, id, bx, by, c)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /** Baseline JPEG with real AC coefficients AND restart markers: the
    * [[jpegWithAcPixels]] stream cut into restart intervals of `ri`
    * MCUs — a DRI segment declares the interval, the entropy stream
    * byte-aligns (1-padded) before each RSTn, markers cycle
    * RST0..RST7, and DC prediction restarts at zero in every interval
    * (spec F.2.1.3.1). Same pixel contract ([[acPix]]) — a decoder
    * that misses the predictor reset shifts every post-restart DC and
    * fails positionally; one that doesn't byte-align desynchronizes
    * the Huffman stream entirely. */
  def jpegWithAcPixelsRestart(id: Long, w: Int, h: Int, nComp: Int,
      ri: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"dims must be positive, got ${w}x$h")
    require(nComp == 1 || nComp == 3, s"nComp $nComp")
    require(ri > 0, s"restart interval must be positive, got $ri")
    val bos = new java.io.ByteArrayOutputStream()
    val quantNat = Array.fill(64)(16)
    quantNat(0) = q0
    quantNat(Zigzag(10)) = 8 // (u=0, v=4)
    quantNat(Zigzag(39)) = 8 // (u=4, v=4)
    writeHeaders(bos, w, h, nComp, quantNat, AcBits, AcVals, ri = ri)
    val dcCodes = canonical(DcBits, DcVals)
    val acCodes = canonical(AcBits, AcVals)
    val bw = new BitWriter(bos)
    val pred = new Array[Int](nComp)
    val blocksY = (h + 7) / 8
    val blocksX = (w + 7) / 8
    val mcus = blocksY * blocksX
    var m = 0
    while (m < mcus) {
      val bx = m % blocksX
      val by = m / blocksX
      var c = 0
      while (c < nComp) {
        emitAcBlock(bw, dcCodes, acCodes, pred, id, bx, by, c)
        c += 1
      }
      m += 1
      if (m % ri == 0 && m < mcus) {
        bw.flush()
        bos.write(0xff); bos.write(0xd0 + ((m / ri - 1) % 8))
        java.util.Arrays.fill(pred, 0)
      }
    }
    bw.flush()
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /** CHROMA-SUBSAMPLED baseline JPEG with real AC coefficients: Y at
    * sampling (yH, yV) ∈ {1,2}², chroma 1×1 — (2,2) is 4:2:0 (the
    * dominant web-crawl layout), (2,1) is 4:2:2, (1,2) is 4:4:0. The
    * scan is genuinely interleaved per spec A.2.3: each MCU carries
    * yH·yV luma blocks (raster order) then one Cb and one Cr block,
    * with per-component DC prediction across the whole scan — so a
    * decoder that mis-orders blocks within the MCU, mixes up the
    * per-component predictors, or upsamples with the wrong phase
    * fails positionally. Decoded samples equal [[subPix]] exactly.
    * Arbitrary positive dims — luma edge blocks crop against (w, h),
    * chroma edge blocks against the ceil-divided plane. */
  def jpegWithAcPixelsSampled(id: Long, w: Int, h: Int,
      yH: Int, yV: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"dims must be positive, got ${w}x$h")
    require(yH >= 1 && yH <= 2 && yV >= 1 && yV <= 2,
      s"sampling factors must be 1 or 2, got ${yH}x$yV")
    val bos = new java.io.ByteArrayOutputStream()
    val quantNat = Array.fill(64)(16)
    quantNat(0) = q0
    quantNat(Zigzag(10)) = 8 // (u=0, v=4)
    quantNat(Zigzag(39)) = 8 // (u=4, v=4)
    writeHeaders(bos, w, h, 3, quantNat, AcBits, AcVals,
      samp = Array((yH << 4) | yV, 0x11, 0x11))
    val dcCodes = canonical(DcBits, DcVals)
    val acCodes = canonical(AcBits, AcVals)
    val bw = new BitWriter(bos)
    val pred = new Array[Int](3)
    val mcusX = (w + 8 * yH - 1) / (8 * yH)
    val mcusY = (h + 8 * yV - 1) / (8 * yV)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var j = 0
        while (j < yV) {
          var i = 0
          while (i < yH) {
            emitAcBlock(bw, dcCodes, acCodes, pred, id,
              mx * yH + i, my * yV + j, 0)
            i += 1
          }
          j += 1
        }
        emitAcBlock(bw, dcCodes, acCodes, pred, id, mx, my, 1)
        emitAcBlock(bw, dcCodes, acCodes, pred, id, mx, my, 2)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  // custom progressive AC table: EOBn (r = 0..14 — enough to emit any
  // end-of-band run ≤ 32767 as ONE symbol, which the refinement BE
  // correction-bit buffering requires), ZRL, and (r, s ≤ 3) — all at
  // code length 8 (canonical; 64 symbols, so the all-ones code is
  // never assigned). Annex K's baseline table lacks the EOBn symbols,
  // which is why progressive streams carry their own DHT.
  private val ProgAcVals: Array[Int] = {
    val eobs = (0 to 14).map(_ << 4)
    val rs = for { r <- 0 to 15; s <- 1 to 3 } yield (r << 4) | s
    (eobs ++ Seq(0xf0) ++ rs).toArray
  }
  private val ProgAcBits: Array[Int] = {
    val a = new Array[Int](16); a(7) = ProgAcVals.length; a
  }

  /** PROGRESSIVE (SOF2) JPEG with real successive approximation and
    * spectral selection — the libjpeg-style script every progressive
    * web JPEG follows:
    *
    *  1. DC first, all components interleaved, Al=1
    *  2. AC first, per component, band [1,10], Al=1
    *  3. AC first, per component, band [11,63], Al=1
    *  4. DC refinement, all components interleaved, Ah=1→Al=0
    *  5. AC refinement, per component, band [1,10], Ah=1→Al=0
    *  6. AC refinement, per component, band [11,63], Ah=1→Al=0
    *
    * Same coefficients as [[jpegWithAcPixels]] (DC [[acBase]]−128,
    * [[acA]] at zigzag 10, [[acB]] at zigzag 39), so decoded pixels
    * follow the exact [[acPix]] contract (or [[subPix]] when luma is
    * subsampled). The script exercises every progressive decode path
    * for real: coefficients with |v| ≤ 1 vanish at Al=1, so first
    * scans produce genuine multi-block EOB runs (EOBn with extension
    * bits); the 28-coefficient gap between zigzag 10 and 39 forces
    * ZRL in BOTH first and refinement scans; |v| ≥ 2 coefficients
    * need interleaved correction bits (G.1.2.3), and ±1 coefficients
    * are newly significant only in the refinement pass. */
  def jpegProgressive(id: Long, w: Int, h: Int, nComp: Int,
      yH: Int = 1, yV: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0, s"dims must be positive, got ${w}x$h")
    require(nComp == 1 || nComp == 3, s"nComp $nComp")
    require(yH >= 1 && yH <= 2 && yV >= 1 && yV <= 2,
      s"sampling factors must be 1 or 2, got ${yH}x$yV")
    val bos = new java.io.ByteArrayOutputStream()
    def bput(x: Int): Unit = bos.write(x & 0xff)
    def b16(x: Int): Unit = { bput(x >> 8); bput(x) }
    def marker(m: Int): Unit = { bput(0xff); bput(m) }
    val quantNat = Array.fill(64)(16)
    quantNat(0) = q0
    quantNat(Zigzag(10)) = 8
    quantNat(Zigzag(39)) = 8
    marker(0xd8) // SOI
    marker(0xe0); b16(16) // APP0/JFIF
    Seq('J', 'F', 'I', 'F', 0).foreach(c => bput(c.toInt))
    bput(1); bput(1); bput(0); b16(1); b16(1); bput(0); bput(0)
    marker(0xdb); b16(67); bput(0x00)
    (0 until 64).foreach(i => bput(quantNat(Zigzag(i))))
    marker(0xc2); b16(8 + 3 * nComp) // SOF2: progressive
    bput(8); b16(h); b16(w); bput(nComp)
    val effYH = if (nComp == 3) yH else 1
    val effYV = if (nComp == 3) yV else 1
    val samp =
      if (nComp == 3) Array((effYH << 4) | effYV, 0x11, 0x11)
      else Array(0x11)
    (0 until nComp).foreach { c => bput(c + 1); bput(samp(c)); bput(0) }
    marker(0xc4); b16(2 + 1 + 16 + DcVals.length); bput(0x00)
    DcBits.foreach(bput); DcVals.foreach(bput)
    marker(0xc4); b16(2 + 1 + 16 + ProgAcVals.length); bput(0x10)
    ProgAcBits.foreach(bput); ProgAcVals.foreach(bput)
    val dcCodes = canonical(DcBits, DcVals)
    val acCodes = canonical(ProgAcBits, ProgAcVals)

    val hMax = effYH; val vMax = effYV // chroma is 1×1
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val compHs = if (nComp == 3) Array(effYH, 1, 1) else Array(1)
    val compVs = if (nComp == 3) Array(effYV, 1, 1) else Array(1)
    val cwArr = Array.tabulate(nComp)(c => (w * compHs(c) + hMax - 1) / hMax)
    val chArr = Array.tabulate(nComp)(c => (h * compVs(c) + vMax - 1) / vMax)
    val rWB = Array.tabulate(nComp)(c => (cwArr(c) + 7) / 8)
    val rHB = Array.tabulate(nComp)(c => (chArr(c) + 7) / 8)

    def coefAt(c: Int, bx: Int, by: Int, k: Int): Int =
      if (k == 0) acBase(id, bx, by, c) - 128
      else if (k == 10) acA(id, bx, by, c)
      else if (k == 39) acB(id, bx, by, c)
      else 0

    def sosHeader(comps: Seq[Int], ss: Int, se: Int, ah: Int,
        al: Int): Unit = {
      marker(0xda); b16(6 + 2 * comps.length); bput(comps.length)
      comps.foreach { c => bput(c + 1); bput(0x00) } // Td=0, Ta=0
      bput(ss); bput(se); bput((ah << 4) | al)
    }

    // ---- scan 1: DC first, interleaved, Al=1 (arithmetic shift) ----
    sosHeader(0 until nComp, 0, 0, 0, 1)
    locally {
      val bw = new BitWriter(bos)
      val pred = new Array[Int](nComp)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var c = 0
          while (c < nComp) {
            var bj = 0
            while (bj < compVs(c)) {
              var bi = 0
              while (bi < compHs(c)) {
                val dc = coefAt(c, mx * compHs(c) + bi,
                  my * compVs(c) + bj, 0) >> 1
                emitDc(bw, dcCodes, dc - pred(c))
                pred(c) = dc
                bi += 1
              }
              bj += 1
            }
            c += 1
          }
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }

    val bands = Seq((1, 10), (11, 63))

    // ---- scans 2..: AC first, per component per band, Al=1 ----------
    for (band <- bands; c <- 0 until nComp) {
      sosHeader(Seq(c), band._1, band._2, 0, 1)
      val bw = new BitWriter(bos)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(eobrun)
        val (code, clen) = acCodes(n << 4)
        bw.put(code, clen)
        if (n > 0) bw.put(eobrun - (1 << n), n)
        eobrun = 0
      }
      var by = 0
      while (by < rHB(c)) {
        var bx = 0
        while (bx < rWB(c)) {
          var run = 0
          var k = band._1
          while (k <= band._2) {
            val t = coefAt(c, bx, by, k) / 2 // Al=1, rounded toward zero
            if (t == 0) run += 1
            else {
              flushEob()
              while (run > 15) {
                val (z, zl) = acCodes(0xf0); bw.put(z, zl); run -= 16
              }
              val s = 32 - Integer.numberOfLeadingZeros(math.abs(t))
              val (code, clen) = acCodes((run << 4) | s)
              bw.put(code, clen)
              bw.put(if (t > 0) t else t + (1 << s) - 1, s)
              run = 0
            }
            k += 1
          }
          if (run > 0) {
            eobrun += 1
            if (eobrun == 32767) flushEob()
          }
          bx += 1
        }
        by += 1
      }
      flushEob()
      bw.flush()
    }

    // ---- DC refinement: interleaved, Ah=1→Al=0 (raw bits) -----------
    sosHeader(0 until nComp, 0, 0, 1, 0)
    locally {
      val bw = new BitWriter(bos)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var c = 0
          while (c < nComp) {
            var bj = 0
            while (bj < compVs(c)) {
              var bi = 0
              while (bi < compHs(c)) {
                bw.put(coefAt(c, mx * compHs(c) + bi,
                  my * compVs(c) + bj, 0) & 1, 1)
                bi += 1
              }
              bj += 1
            }
            c += 1
          }
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }

    // ---- AC refinement scans: G.1.2.3 with interleaved correction
    // bits (the classic BR/BE double buffer) ---------------------------
    for (band <- bands; c <- 0 until nComp) {
      sosHeader(Seq(c), band._1, band._2, 1, 0)
      val bw = new BitWriter(bos)
      var eobrun = 0
      val beBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEob(): Unit = if (eobrun > 0 || beBuf.nonEmpty) {
        if (eobrun > 0) {
          val n = 31 - Integer.numberOfLeadingZeros(eobrun)
          val (code, clen) = acCodes(n << 4)
          bw.put(code, clen)
          if (n > 0) bw.put(eobrun - (1 << n), n)
          eobrun = 0
        }
        beBuf.foreach(bit => bw.put(bit, 1))
        beBuf.clear()
      }
      var by = 0
      while (by < rHB(c)) {
        var bx = 0
        while (bx < rWB(c)) {
          // last newly-significant position: |v| == 1 (Ah=1 history 0)
          var eobPos = band._1 - 1
          var k = band._1
          while (k <= band._2) {
            if (math.abs(coefAt(c, bx, by, k)) == 1) eobPos = k
            k += 1
          }
          var r = 0
          val brBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
          k = band._1
          while (k <= band._2) {
            val v = coefAt(c, bx, by, k)
            val t = math.abs(v)
            if (t == 0) r += 1
            else {
              while (r > 15 && k <= eobPos) {
                flushEob()
                val (z, zl) = acCodes(0xf0); bw.put(z, zl)
                r -= 16
                brBuf.foreach(bit => bw.put(bit, 1)); brBuf.clear()
              }
              if (t > 1) brBuf += (t & 1) // correction bit
              else {
                flushEob()
                val (code, clen) = acCodes((r << 4) | 1)
                bw.put(code, clen)
                bw.put(if (v > 0) 1 else 0, 1)
                brBuf.foreach(bit => bw.put(bit, 1)); brBuf.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || brBuf.nonEmpty) {
            eobrun += 1
            beBuf ++= brBuf
            if (eobrun == 32767) flushEob()
          }
          bx += 1
        }
        by += 1
      }
      flushEob()
      bw.flush()
    }

    marker(0xd9) // EOI
    bos.toByteArray
  }

  // ---- reader ------------------------------------------------------

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
            // a real marker where entropy bits were expected —
            // truncation, or an RSTn not at its declared boundary
            // (expected restarts are consumed by [[restart]], never
            // here) — damaged stream
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
    /** Discard in-flight pad bits so `pos` points at the next
      * byte-aligned marker (used at end-of-scan in progressive). */
    def align(): Unit = nbits = 0
    /** Consume an expected RSTn at a restart boundary: discard the
      * 1-padded tail bits of the interval (byte-align), then require
      * the exact 0xFF 0xD0+n marker. False = damaged stream. */
    def restart(expect: Int): Boolean = {
      nbits = 0 // drop pad bits — markers are byte-aligned
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 + expect)) return false
      pos += 2
      true
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

  /** Spec F.12 EXTEND: value bits → signed coefficient. */
  private def extend(v: Int, t: Int): Int =
    if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Reconstruct one data unit from its 64 ZIGZAG-ordered quantized
    * coefficients: dequant + dezigzag + separable 2-D IDCT (spec
    * A.3.3) + level shift/clamp into the component plane at block
    * (bx, by), cropping against the plane dims. `freq`/`tmp` are
    * caller-owned 64-double scratch (no per-block allocation). */
  private def reconstructBlock(zz: Array[Int], q: Array[Int],
      freq: Array[Double], tmp: Array[Double],
      plane: Array[Byte], pw: Int, ph: Int, bx: Int, by: Int): Unit = {
    java.util.Arrays.fill(freq, 0.0)
    var j = 0
    while (j < 64) {
      if (zz(j) != 0) freq(Zigzag(j)) = (zz(j) * q(Zigzag(j))).toDouble
      j += 1
    }
    // rows: for each v, 1-D over u → tmp(v*8 + x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosT(u)(x) * freq(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    // cols: for each x, 1-D over v → plane sample (py, px)
    var yy = 0
    while (yy < 8) {
      val py = by * 8 + yy
      if (py < ph) {
        var xx = 0
        while (xx < 8) {
          val px = bx * 8 + xx
          if (px < pw) {
            var s = 0.0
            var vv = 0
            while (vv < 8) { s += CosT(vv)(yy) * tmp(vv * 8 + xx); vv += 1 }
            val sample = math.max(0, math.min(255,
              math.round(s).toInt + 128))
            plane(py * pw + px) = sample.toByte
          }
          xx += 1
        }
      }
      yy += 1
    }
  }

  /** DQT segment (possibly several tables): values arrive in zigzag
    * order, stored natural. False = 16-bit precision or bad id. */
  private def parseDqtSeg(b: Array[Byte], i: Int, len: Int,
      quant: Array[Array[Int]]): Boolean = {
    var o = i + 4
    while (o < i + 2 + len) {
      val pq = (b(o) & 0xff) >> 4
      val tq = b(o) & 0x0f
      if (pq != 0 || tq > 3) return false // 16-bit unsupported
      if (o + 64 >= i + 2 + len) return false
      val nat = new Array[Int](64)
      var j = 0
      while (j < 64) { nat(Zigzag(j)) = b(o + 1 + j) & 0xff; j += 1 }
      quant(tq) = nat
      o += 1 + 64
    }
    true
  }

  /** DHT segment (possibly several tables), installing the inverted
    * canonical map per (class, id). False = malformed. */
  private def parseDhtSeg(b: Array[Byte], i: Int, len: Int,
      dcTables: Array[Map[(Int, Int), Int]],
      acTables: Array[Map[(Int, Int), Int]]): Boolean = {
    var o = i + 4
    while (o < i + 2 + len) {
      val tc = (b(o) & 0xff) >> 4
      val th = b(o) & 0x0f
      if (th > 3) return false
      if (o + 16 >= i + 2 + len) return false
      val bits = Array.tabulate(16)(j => b(o + 1 + j) & 0xff)
      val n = bits.sum
      if (o + 16 + n >= i + 2 + len) return false
      val vals = Array.tabulate(n)(j => b(o + 17 + j) & 0xff)
      val tbl = invert(canonical(bits, vals))
      if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
      o += 17 + n
    }
    true
  }

  /** Real decode of the baseline subset (sampling factors ≤ 2, so
    * 4:4:4/4:2:2/4:4:0/4:2:0); None on anything else. */
  def decode(bytes: Array[Byte]): Option[PngPixels.Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def decode0(b: Array[Byte]): Option[PngPixels.Decoded] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    var w = 0; var h = 0; var nComp = 0
    val quant = new Array[Array[Int]](4) // natural order, per Tq
    val dcTables = new Array[Map[(Int, Int), Int]](4)
    val acTables = new Array[Map[(Int, Int), Int]](4)
    val compQuant = new Array[Int](3) // per frame component: Tq
    val compH = new Array[Int](3) // per frame component: sampling h
    val compV = new Array[Int](3) // per frame component: sampling v
    val compDc = new Array[Int](3) // per scan component: Td
    val compAc = new Array[Int](3) // per scan component: Ta
    var restartRi = 0 // DRI interval in MCUs; 0 = no restarts
    var progressive = false // SOF2 frame → multi-scan coefficient path
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
            if (!parseDqtSeg(b, i, len, quant)) return None
          case 0xc0 | 0xc1 | 0xc2 =>
            progressive = m == 0xc2
            if (m == 0xc1) return None // extended sequential: unsupported
            h = be16(i + 5); w = be16(i + 7)
            nComp = b(i + 9) & 0xff
            if (w <= 0 || h <= 0) return None
            if (nComp != 1 && nComp != 3) return None
            var c = 0
            while (c < nComp) {
              val hv = b(i + 11 + 3 * c) & 0xff
              compH(c) = hv >> 4
              compV(c) = hv & 0x0f
              // h,v ∈ {1,2} covers 4:4:4/4:2:2/4:4:0/4:2:0 — factors
              // of 3 or 4 are outside the subset
              if (compH(c) < 1 || compH(c) > 2 ||
                compV(c) < 1 || compV(c) > 2) return None
              compQuant(c) = b(i + 12 + 3 * c) & 0x0f
              c += 1
            }
          case x if x >= 0xc3 && x <= 0xcf && x != 0xc4 && x != 0xc8 &&
            x != 0xcc => return None // lossless/arithmetic/hierarchical
          case 0xc4 =>
            if (!parseDhtSeg(b, i, len, dcTables, acTables)) return None
          case 0xdd =>
            if (len != 4) return None
            restartRi = be16(i + 4)
          case 0xda =>
            if (progressive) {
              // progressive scans (possibly partial-component) are
              // parsed inside the multi-scan loop; hand over at the
              // SOS marker itself
              sosAt = i
            } else {
              val ns = b(i + 4) & 0xff
              if (ns != nComp) return None // one full interleaved scan only
              var c = 0
              while (c < ns) {
                // writer emits components in frame order; require that
                // (general component re-mapping is outside the subset)
                if ((b(i + 5 + 2 * c) & 0xff) != c + 1) return None
                compDc(c) = (b(i + 6 + 2 * c) & 0xff) >> 4
                compAc(c) = b(i + 6 + 2 * c) & 0x0f
                c += 1
              }
              sosAt = i + 2 + len
            }
          case _ => ()
        }
        i += 2 + len
      }
    }
    if (w == 0) return None
    if (progressive)
      return decodeProgressive(b, sosAt, w, h, nComp, quant,
        dcTables, acTables, compQuant, compH, compV, restartRi)
    var c0 = 0
    while (c0 < nComp) {
      if (quant(compQuant(c0)) == null || dcTables(compDc(c0)) == null ||
        acTables(compAc(c0)) == null) return None
      c0 += 1
    }
    val br = new BitReader(b, sosAt)
    val ch = nComp
    // a single-component scan is NON-interleaved (spec A.2.2): one
    // data unit per MCU, whatever the declared sampling factors say
    if (ch == 1) { compH(0) = 1; compV(0) = 1 }
    var hMax = 1; var vMax = 1
    var cm = 0
    while (cm < ch) {
      if (compH(cm) > hMax) hMax = compH(cm)
      if (compV(cm) > vMax) vMax = compV(cm)
      cm += 1
    }
    // untrusted dims: size the buffers in Long and cap BEFORE
    // allocating (same contract as PngPixels — dirty bytes → None,
    // never an OOM); per-component planes total ≤ the output size
    if (w.toLong * ch * h > PngPixels.MaxDecodedBytes) return None
    // per-component plane dims, ceil-divided (spec A.1.1)
    val cw = Array.tabulate(ch)(c =>
      ((w.toLong * compH(c) + hMax - 1) / hMax).toInt)
    val chh = Array.tabulate(ch)(c =>
      ((h.toLong * compV(c) + vMax - 1) / vMax).toInt)
    val planes = Array.tabulate(ch)(c => new Array[Byte](cw(c) * chh(c)))
    val pred = new Array[Int](ch)
    val zz = new Array[Int](64)
    val freq = new Array[Double](64)
    val tmp = new Array[Double](64)

    // one data unit: entropy decode → dequant/dezigzag → IDCT →
    // clamp into component c's plane at block (bx, by); false = bad
    // stream (the caller turns that into None)
    def decodeBlock(c: Int, bx: Int, by: Int): Boolean = {
      // ---- entropy decode: 64 quantized coefficients ----
      java.util.Arrays.fill(zz, 0)
      val dcT = dcTables(compDc(c))
      val acT = acTables(compAc(c))
      val t = decodeSym(br, dcT)
      if (br.bad || t > 11) return false
      val diff = if (t == 0) 0 else extend(br.bits(t), t)
      pred(c) += diff
      zz(0) = pred(c)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = decodeSym(br, acT)
        if (br.bad) return false
        if (rs == 0x00) done = true // EOB
        else if (rs == 0xf0) k += 16 // ZRL: 16 zeros
        else {
          val r = rs >> 4
          val s = rs & 0x0f
          k += r
          if (s == 0 || s > 10 || k > 63) return false
          zz(k) = extend(br.bits(s), s)
          if (br.bad) return false
          k += 1
        }
      }
      if (k > 64) return false
      reconstructBlock(zz, quant(compQuant(c)), freq, tmp,
        planes(c), cw(c), chh(c), bx, by)
      true
    }

    // interleaved MCU walk (spec A.2.3): each MCU carries h_c×v_c
    // blocks per component in raster order — for 4:4:4 this is the
    // one-block-per-component degenerate case
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val mcus = mcusX * mcusY
    var mcuDone = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c = 0
        while (c < ch) {
          var bj = 0
          while (bj < compV(c)) {
            var bi = 0
            while (bi < compH(c)) {
              if (!decodeBlock(c, mx * compH(c) + bi, my * compV(c) + bj))
                return None
              bi += 1
            }
            bj += 1
          }
          c += 1
        }
        mcuDone += 1
        // restart boundary (spec F.2.1.3.1): byte-align, consume the
        // cycling RSTn, reset every DC predictor
        if (restartRi > 0 && mcuDone % restartRi == 0 && mcuDone < mcus) {
          if (!br.restart((mcuDone / restartRi - 1) % 8)) return None
          java.util.Arrays.fill(pred, 0)
        }
        mx += 1
      }
      my += 1
    }

    Some(PngPixels.Decoded(w, h, ch,
      interleavePlanes(planes, cw, compH, compV, hMax, vMax, w, h, ch)))
  }

  /** Nearest-neighbor (sample replication) upsample of per-component
    * planes to the full interleaved grid; for 4:4:4 this degenerates
    * to an interleaving copy. */
  private def interleavePlanes(planes: Array[Array[Byte]],
      cw: Array[Int], compH: Array[Int], compV: Array[Int],
      hMax: Int, vMax: Int, w: Int, h: Int, ch: Int): Array[Byte] = {
    val pixels = new Array[Byte](w * ch * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          pixels((y * w + x) * ch + c) =
            planes(c)((y * compV(c) / vMax) * cw(c) + x * compH(c) / hMax)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    pixels
  }

  // ---- progressive (SOF2) ------------------------------------------

  /** Multi-scan progressive decode (spec Annex G, Huffman): spectral
    * selection (per-scan [Ss, Se] coefficient bands; AC scans
    * non-interleaved per G.1.1.1.1), successive approximation (DC
    * first/refine with the point transform Al, AC first with EOBRUN
    * end-of-band runs, AC refinement with interleaved correction
    * bits — the G.2.2.3 algorithm), DHT/DQT/DRI redefinition between
    * scans, and restart markers inside any scan (predictors AND
    * EOBRUN reset). Coefficients accumulate per block across scans;
    * dequant + IDCT run once at EOI. Returns None on malformed or
    * out-of-subset streams, never throws. */
  private def decodeProgressive(b: Array[Byte], firstSos: Int,
      w: Int, h: Int, nComp: Int,
      quant: Array[Array[Int]],
      dcTables: Array[Map[(Int, Int), Int]],
      acTables: Array[Map[(Int, Int), Int]],
      compQuant: Array[Int], compH: Array[Int], compV: Array[Int],
      restartRi0: Int): Option[PngPixels.Decoded] = {
    var restartRi = restartRi0
    val ch = nComp
    if (ch == 1) { compH(0) = 1; compV(0) = 1 }
    var hMax = 1; var vMax = 1
    var cm = 0
    while (cm < ch) {
      if (compH(cm) > hMax) hMax = compH(cm)
      if (compV(cm) > vMax) vMax = compV(cm)
      cm += 1
    }
    // coefficient storage is ~4 bytes per pixel on top of the output —
    // cap BEFORE allocating (untrusted dims, same contract as baseline)
    if (w.toLong * ch * h > PngPixels.MaxDecodedBytes / 4) return None
    val cw = Array.tabulate(ch)(c =>
      ((w.toLong * compH(c) + hMax - 1) / hMax).toInt)
    val chh = Array.tabulate(ch)(c =>
      ((h.toLong * compV(c) + vMax - 1) / vMax).toInt)
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component block grid: interleaved scans cover the padded
    // MCU grid (dummy blocks beyond the image edge are coded there);
    // non-interleaved scans cover only the ceil-divided real grid,
    // addressed with the same row stride
    val wB = Array.tabulate(ch)(c => mcusX * compH(c))
    val hB = Array.tabulate(ch)(c => mcusY * compV(c))
    val realWB = Array.tabulate(ch)(c => (cw(c) + 7) / 8)
    val realHB = Array.tabulate(ch)(c => (chh(c) + 7) / 8)
    val coefs = Array.tabulate(ch)(c => new Array[Int](wB(c) * hB(c) * 64))

    val pred = new Array[Int](ch)
    var eobrun = 0
    var pos = firstSos
    var sawScan = false
    var eoi = false
    def be16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    // ---- one scan's entropy data; returns next marker pos or -1 ----
    def decodeScan(at: Int, len: Int): Int = {
      val ns = b(at + 4) & 0xff
      if (ns < 1 || ns > ch || len != 6 + 2 * ns) return -1
      val sc = new Array[Int](ns)
      val scDc = new Array[Int](ns)
      val scAc = new Array[Int](ns)
      var q = 0
      while (q < ns) {
        val cidx = (b(at + 5 + 2 * q) & 0xff) - 1
        if (cidx < 0 || cidx >= ch) return -1
        if (q > 0 && cidx <= sc(q - 1)) return -1 // frame order only
        sc(q) = cidx
        scDc(q) = (b(at + 6 + 2 * q) & 0xff) >> 4
        scAc(q) = b(at + 6 + 2 * q) & 0x0f
        q += 1
      }
      val ss = b(at + 5 + 2 * ns) & 0xff
      val se = b(at + 6 + 2 * ns) & 0xff
      val ah = (b(at + 7 + 2 * ns) & 0xff) >> 4
      val al = b(at + 7 + 2 * ns) & 0x0f
      if (ss > 63 || se > 63 || ss > se) return -1
      if (ss == 0 && se != 0) return -1 // DC scans carry only DC
      if (ss > 0 && ns != 1) return -1 // AC scans non-interleaved
      // a multi-component scan must cover the whole frame (partial
      // interleaves would change the MCU geometry — out of subset;
      // real progressive scripts emit DC all-components + AC singles)
      if (ns != 1 && ns != ch) return -1
      if (al > 13) return -1
      if (ah != 0 && ah != al + 1) return -1 // refine exactly one bit
      // required tables present?
      q = 0
      while (q < ns) {
        if (ss == 0 && ah == 0 && dcTables(scDc(q)) == null) return -1
        if (ss > 0 && acTables(scAc(q)) == null) return -1
        q += 1
      }
      val br = new BitReader(b, at + 2 + len)
      java.util.Arrays.fill(pred, 0)
      eobrun = 0
      val p1 = 1 << al

      def dcFirst(c: Int, off: Int, dcT: Map[(Int, Int), Int]): Boolean = {
        val t = decodeSym(br, dcT)
        if (br.bad || t > 11) return false
        val diff = if (t == 0) 0 else extend(br.bits(t), t)
        if (br.bad) return false
        pred(c) += diff
        coefs(c)(off) = pred(c) << al
        true
      }
      def dcRefine(c: Int, off: Int): Boolean = {
        if (br.bit() == 1) coefs(c)(off) |= p1
        !br.bad
      }
      def acFirst(c: Int, off: Int, acT: Map[(Int, Int), Int]): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = decodeSym(br, acT)
          if (br.bad) return false
          val r = rs >> 4
          val s = rs & 0x0f
          if (s != 0) {
            if (s > 13) return false
            k += r
            if (k > se) return false
            coefs(c)(off + k) = extend(br.bits(s), s) << al
            if (br.bad) return false
            k += 1
          } else if (r == 15) {
            k += 16 // ZRL
          } else {
            eobrun = (1 << r) - 1
            if (r > 0) { eobrun += br.bits(r); if (br.bad) return false }
            return true
          }
        }
        true
      }
      // G.2.2.3 / the classic refinement walk: advance over
      // zero-HISTORY positions, consuming a correction bit at every
      // nonzero-history position passed
      def acRefine(c: Int, off: Int, acT: Map[(Int, Int), Int]): Boolean = {
        var k = ss
        if (eobrun == 0) {
          var ended = false
          while (k <= se && !ended) {
            val rs = decodeSym(br, acT)
            if (br.bad) return false
            var r = rs >> 4
            val s = rs & 0x0f
            var newVal = 0
            if (s != 0) {
              if (s != 1) return false
              newVal = if (br.bit() == 1) p1 else -p1
              if (br.bad) return false
            } else if (r != 15) {
              eobrun = 1 << r
              if (r > 0) { eobrun += br.bits(r); if (br.bad) return false }
              ended = true // tail loop below corrects from current k
            }
            if (!ended) {
              var placed = false
              while (k <= se && !placed) {
                val cur = coefs(c)(off + k)
                if (cur != 0) {
                  if (br.bit() == 1 && (cur & p1) == 0)
                    coefs(c)(off + k) = if (cur >= 0) cur + p1 else cur - p1
                  if (br.bad) return false
                  k += 1
                } else if (r == 0) {
                  if (newVal != 0) coefs(c)(off + k) = newVal
                  k += 1
                  placed = true
                } else { r -= 1; k += 1 }
              }
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val cur = coefs(c)(off + k)
            if (cur != 0) {
              if (br.bit() == 1 && (cur & p1) == 0)
                coefs(c)(off + k) = if (cur >= 0) cur + p1 else cur - p1
              if (br.bad) return false
            }
            k += 1
          }
          eobrun -= 1
        }
        true
      }

      def decodeUnit(c: Int, qi: Int, bx: Int, by: Int): Boolean = {
        val off = (by * wB(c) + bx) * 64
        if (ss == 0) {
          if (ah == 0) dcFirst(c, off, dcTables(scDc(qi)))
          else dcRefine(c, off)
        } else {
          val acT = acTables(scAc(qi))
          if (ah == 0) acFirst(c, off, acT) else acRefine(c, off, acT)
        }
      }

      def restartBoundary(done: Int, total: Int): Boolean = {
        if (restartRi == 0 || done % restartRi != 0 || done >= total)
          return true
        if (!br.restart((done / restartRi - 1) % 8)) return false
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
        true
      }

      if (ns > 1) {
        // interleaved (DC) scan: the padded MCU grid, dummies included
        val mcus = mcusX * mcusY
        var done = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            var qi = 0
            while (qi < ns) {
              val c = sc(qi)
              var bj = 0
              while (bj < compV(c)) {
                var bi = 0
                while (bi < compH(c)) {
                  if (!decodeUnit(c, qi, mx * compH(c) + bi,
                    my * compV(c) + bj)) return -1
                  bi += 1
                }
                bj += 1
              }
              qi += 1
            }
            done += 1
            if (!restartBoundary(done, mcus)) return -1
            mx += 1
          }
          my += 1
        }
      } else {
        // non-interleaved scan: the component's REAL block grid
        val c = sc(0)
        val bxMax = realWB(c)
        val byMax = realHB(c)
        val total = bxMax * byMax
        var done = 0
        var by = 0
        while (by < byMax) {
          var bx = 0
          while (bx < bxMax) {
            if (!decodeUnit(c, 0, bx, by)) return -1
            done += 1
            if (!restartBoundary(done, total)) return -1
            bx += 1
          }
          by += 1
        }
      }
      br.align()
      br.pos
    }

    // ---- the multi-scan marker loop ----------------------------------
    while (!eoi) {
      if (pos + 1 >= b.length) return None
      if ((b(pos) & 0xff) != 0xff) return None
      val m = b(pos + 1) & 0xff
      if (m == 0xd9) eoi = true
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else {
        if (pos + 3 >= b.length) return None
        val len = be16(pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return None
        m match {
          case 0xdb =>
            if (!parseDqtSeg(b, pos, len, quant)) return None
            pos += 2 + len
          case 0xc4 =>
            if (!parseDhtSeg(b, pos, len, dcTables, acTables)) return None
            pos += 2 + len
          case 0xdd =>
            if (len != 4) return None
            restartRi = be16(pos + 4)
            pos += 2 + len
          case 0xda =>
            val nxt = decodeScan(pos, len)
            if (nxt < 0) return None
            sawScan = true
            pos = nxt
          case x if x >= 0xc0 && x <= 0xcf && x != 0xc4 =>
            return None // a second frame is malformed
          case _ => pos += 2 + len // APPn / COM
        }
      }
    }
    if (!sawScan) return None
    var c1 = 0
    while (c1 < ch) {
      if (quant(compQuant(c1)) == null) return None
      c1 += 1
    }

    // ---- one reconstruction pass over the REAL blocks ----------------
    val planes = Array.tabulate(ch)(c => new Array[Byte](cw(c) * chh(c)))
    val zz = new Array[Int](64)
    val freq = new Array[Double](64)
    val tmp = new Array[Double](64)
    var c = 0
    while (c < ch) {
      val q = quant(compQuant(c))
      var by = 0
      while (by < realHB(c)) {
        var bx = 0
        while (bx < realWB(c)) {
          System.arraycopy(coefs(c), (by * wB(c) + bx) * 64, zz, 0, 64)
          reconstructBlock(zz, q, freq, tmp, planes(c), cw(c), chh(c), bx, by)
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    Some(PngPixels.Decoded(w, h, ch,
      interleavePlanes(planes, cw, compH, compV, hMax, vMax, w, h, ch)))
  }
}
