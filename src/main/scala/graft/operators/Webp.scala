package graft.operators

/** Lossless WebP (VP8L) pixel codec — decoder plus a fixture encoder.
  *
  * Extends the real-pixel-decoder family (PNG/JPEG/GIF/BMP) to the
  * last major lib-free web image format: VP8L is a self-contained
  * public spec (the "WebP Lossless Bitstream Specification", also
  * RFC 9649 §3) needing no external codec — canonical prefix codes,
  * LZ77 over pixels, a color cache, and four reversible transforms.
  * VP8 LOSSY stays with the h264/vp9 seam (full DCT + boolean
  * arithmetic coder), as COVERAGE.md documents.
  *
  * Implemented (the full lossless feature set):
  *  - LSB-first bit stream; prefix codes packed MSB-first (the
  *    DEFLATE convention the spec adopts)
  *  - both prefix-code forms: simple (1-2 listed symbols) and normal
  *    (code-length code in `kCodeLengthCodeOrder`, 16/17/18 repeats,
  *    optional max_symbol cap, completeness enforced)
  *  - the five-tree groups (green+length+cache, red, blue, alpha,
  *    distance) with optional meta-prefix image selecting a group per
  *    pixel block
  *  - LZ77 backward references: length/distance prefix-value coding
  *    (14 bits extra max) and the 120-entry 2D distance map for
  *    near-neighborhood references
  *  - color cache (`(0x1e35a7bd * argb) >>> (32 - bits)`, 1..11 bits)
  *  - all four transforms, inverted in reverse stream order:
  *    predictor (14 modes, flat-index top-right wrap), cross-color
  *    (signed `(t*c)>>5` deltas), subtract-green, color indexing
  *    (delta-coded palette, sub-byte pixel packing for ≤16 colors)
  *
  * Validator stance like the sibling codecs: any malformed stream —
  * bad signature, over-long code, incomplete prefix code, reference
  * before start, palette index out of range, truncated stream —
  * decodes to None, never throws, never guesses.
  *
  * The encoder exists for fixtures and round-trip specs (no webp
  * library ships in this sandbox, so conformance is
  * spec-transcription + self round-trip; the decoder's table/formula
  * constants are transcribed from the spec text and cross-checked by
  * value in WebpSpec). Reference capability: binary media objects
  * (01_simple.ipynb cell 29) — decoded natively here instead of
  * delegated.
  */
object Webp {

  // ---------------------------------------------------------------
  // bit I/O — LSB-first within bytes
  // ---------------------------------------------------------------

  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var bytePos = start
    private var bitPos = 0
    def readBit(): Int = {
      if (bytePos >= end) throw Invalid
      val v = (b(bytePos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(v: Int): Unit = {
      cur |= (v & 1) << nBits
      nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
    }
    /** n regular bits, LSB first (the ReadBits twin). */
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit((v >> i) & 1); i += 1 }
    }
    /** prefix-code bits, MSB first (the convention for code words). */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBit((code >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { buf.write(cur); cur = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  private object Invalid extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---------------------------------------------------------------
  // spec constants
  // ---------------------------------------------------------------

  private val CodeLengthCodeOrder = Array(
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The 2D distance map: prefix-decoded codes 1..120 address a pixel
    * in the 8-wide near neighborhood, (dx, dy) with
    * dist = dy * xsize + dx (clamped to ≥ 1); codes > 120 are plain
    * 1D distances minus 120. Transcribed from the spec's table. */
  private[operators] val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def divRoundUp(a: Int, b: Int): Int = (a + b - 1) / b

  /** prefix-value coding shared by lengths and distances: codes 0..3
    * are the values 1..4; higher codes carry extra bits. */
  private def readPrefixValue(code: Int, br: BitReader): Int = {
    if (code < 0 || code >= 24) throw Invalid
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.readBits(extraBits) + 1
    }
  }

  /** (code, extraBits, extraVal) for a value ≥ 1 — the writer twin. */
  private def prefixCodeOf(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while (code < 24) {
        val extraBits = (code - 2) >> 1
        val offset = (2 + (code & 1)) << extraBits
        if (v >= offset + 1 && v <= offset + (1 << extraBits))
          return (code, extraBits, v - offset - 1)
        code += 1
      }
      throw new IllegalArgumentException(s"prefix value out of range: $v")
    }
  }

  private def cacheHash(argb: Int, bits: Int): Int =
    ((0x1e35a7bd * argb) >>> (32 - bits))

  // ---------------------------------------------------------------
  // prefix-code decode structure
  // ---------------------------------------------------------------

  /** Decode table from explicit (symbol, len) pairs with canonical
    * code assignment already resolved to (len, code) → symbol. */
  private final class Prefix(
      val map: java.util.HashMap[Integer, Integer], val zeroBitSym: Int) {
    def read(br: BitReader): Int = {
      if (zeroBitSym >= 0) return zeroBitSym
      var code = 0
      var len = 0
      while (len < 15) {
        code = (code << 1) | br.readBit()
        len += 1
        val s = map.get(Integer.valueOf((len << 16) | code))
        if (s != null) return s.intValue()
      }
      throw Invalid
    }
  }

  /** Canonical code from lengths (DEFLATE next-code rule); enforces
    * completeness (Kraft equality) for multi-symbol codes. */
  private def canonical(lengths: Array[Int]): Prefix = {
    var used = 0
    var single = -1
    var maxLen = 0
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l < 0 || l > 15) throw Invalid
      if (l > 0) { used += 1; single = i; if (l > maxLen) maxLen = l }
      i += 1
    }
    if (used == 0) throw Invalid
    if (used == 1) return new Prefix(new java.util.HashMap(), single)
    // Kraft completeness
    var kraft = 0L
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) kraft += 1L << (maxLen - lengths(i))
      i += 1
    }
    if (kraft != (1L << maxLen)) throw Invalid
    val blCount = new Array[Int](16)
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) blCount(lengths(i)) += 1
      i += 1
    }
    val nextCode = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= 15) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    val m = new java.util.HashMap[Integer, Integer]()
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        m.put(Integer.valueOf((len << 16) | nextCode(len)),
          Integer.valueOf(i))
        nextCode(len) += 1
      }
      i += 1
    }
    new Prefix(m, -1)
  }

  /** Simple-form code with the LISTED symbol order (symbol 0 ↔ code
    * 0) — the spec stores them as a list, not canonically. */
  private def simplePrefix(symbols: Array[Int]): Prefix = {
    if (symbols.length == 1)
      new Prefix(new java.util.HashMap(), symbols(0))
    else {
      val m = new java.util.HashMap[Integer, Integer]()
      m.put(Integer.valueOf((1 << 16) | 0), Integer.valueOf(symbols(0)))
      m.put(Integer.valueOf((1 << 16) | 1), Integer.valueOf(symbols(1)))
      new Prefix(m, -1)
    }
  }

  private def readPrefixCode(alphabetSize: Int, br: BitReader): Prefix = {
    val simple = br.readBit()
    if (simple == 1) {
      val numSymbols = br.readBit() + 1
      val first8 = br.readBit()
      val s0 = br.readBits(if (first8 == 1) 8 else 1)
      if (s0 >= alphabetSize) throw Invalid
      if (numSymbols == 1) simplePrefix(Array(s0))
      else {
        val s1 = br.readBits(8)
        if (s1 >= alphabetSize || s1 == s0) throw Invalid
        simplePrefix(Array(s0, s1))
      }
    } else {
      val clLengths = new Array[Int](19)
      val numCodes = 4 + br.readBits(4)
      if (numCodes > 19) throw Invalid
      var i = 0
      while (i < numCodes) {
        clLengths(CodeLengthCodeOrder(i)) = br.readBits(3)
        i += 1
      }
      val clCode = canonical(clLengths)
      val lengths = new Array[Int](alphabetSize)
      var maxSymbol =
        if (br.readBit() == 1) {
          val lengthNBits = 2 + 2 * br.readBits(3)
          2 + br.readBits(lengthNBits)
        } else alphabetSize
      var symbol = 0
      var prevCodeLen = 8
      while (symbol < alphabetSize) {
        if (maxSymbol == 0) {
          symbol = alphabetSize // implicit zeros to the end
        } else {
          maxSymbol -= 1
          val cl = clCode.read(br)
          if (cl < 16) {
            lengths(symbol) = cl
            symbol += 1
            if (cl != 0) prevCodeLen = cl
          } else {
            val (repeat, fill) = cl match {
              case 16 => (3 + br.readBits(2), prevCodeLen)
              case 17 => (3 + br.readBits(3), 0)
              case 18 => (11 + br.readBits(7), 0)
              case _ => throw Invalid
            }
            if (symbol + repeat > alphabetSize) throw Invalid
            var r = 0
            while (r < repeat) { lengths(symbol) = fill; symbol += 1; r += 1 }
          }
        }
      }
      canonical(lengths)
    }
  }

  // ---------------------------------------------------------------
  // image-data decode (shared by the main image and subimages)
  // ---------------------------------------------------------------

  private final case class Group(
      green: Prefix, red: Prefix, blue: Prefix, alpha: Prefix,
      dist: Prefix)

  private def readGroup(cacheSize: Int, br: BitReader): Group =
    Group(
      readPrefixCode(256 + 24 + cacheSize, br),
      readPrefixCode(256, br),
      readPrefixCode(256, br),
      readPrefixCode(256, br),
      readPrefixCode(40, br))

  /** `<color-cache-info><meta-prefix?><data>` → ARGB pixels. Spatial
    * images may carry a meta-prefix image; entropy-coded subimages
    * never do. */
  private def readImageData(
      w: Int, h: Int, spatial: Boolean, br: BitReader): Array[Int] = {
    val cacheBits = if (br.readBit() == 1) br.readBits(4) else 0
    if (cacheBits > 11) throw Invalid
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    var huffBits = 0
    var huffW = 0
    var huffImage: Array[Int] = null
    var numGroups = 1
    if (spatial && br.readBit() == 1) {
      huffBits = br.readBits(3) + 2
      huffW = divRoundUp(w, 1 << huffBits)
      val huffH = divRoundUp(h, 1 << huffBits)
      huffImage = readImageData(huffW, huffH, spatial = false, br)
      var mx = 0
      var i = 0
      while (i < huffImage.length) {
        val mc = ((huffImage(i) >> 8) & 0xffff)
        if (mc > mx) mx = mc
        i += 1
      }
      numGroups = mx + 1
      // bound: a valid stream can't reference more groups than the
      // entropy image has cells, and each group allocates five prefix
      // trees (~KBs) — 64k groups ≈ tens of MB, the same
      // adversarial-allocation ceiling as MaxDecodedBytes. Real
      // encoders emit far fewer (libwebp: dozens); the old 1024
      // fixture bound could reject valid very-large images.
      if (numGroups > math.min(huffImage.length, 65536)) throw Invalid
    }
    val groups = Array.fill(numGroups)(readGroup(cacheSize, br))
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val total = w * h
    val out = new Array[Int](total)
    var pos = 0
    var x = 0
    var y = 0
    @inline def insert(px: Int): Unit =
      if (cache != null) cache(cacheHash(px, cacheBits)) = px
    while (pos < total) {
      val g =
        if (huffImage == null) groups(0)
        else {
          val mc = (huffImage((y >> huffBits) * huffW + (x >> huffBits))
            >> 8) & 0xffff
          if (mc >= numGroups) throw Invalid
          groups(mc)
        }
      val s = g.green.read(br)
      if (s < 256) {
        val r = g.red.read(br)
        val b = g.blue.read(br)
        val a = g.alpha.read(br)
        val px = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = px
        insert(px)
        pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
      } else if (s < 256 + 24) {
        val len = readPrefixValue(s - 256, br)
        val dcode = readPrefixValue(g.dist.read(br), br)
        val dist =
          if (dcode > 120) dcode - 120
          else {
            val (dx, dy) = DistanceMap(dcode - 1)
            math.max(1, dy * w + dx)
          }
        if (dist > pos || pos + len > total) throw Invalid
        var k = 0
        while (k < len) {
          val px = out(pos - dist)
          out(pos) = px
          insert(px)
          pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
          k += 1
        }
      } else {
        val idx = s - 280
        if (cache == null || idx >= cacheSize) throw Invalid
        val px = cache(idx)
        out(pos) = px
        pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
      }
    }
    out
  }

  // ---------------------------------------------------------------
  // transforms (inverse = decode direction)
  // ---------------------------------------------------------------

  private sealed trait Transform
  private final case class PredictorT(bits: Int, img: Array[Int], tw: Int)
      extends Transform
  private final case class ColorT(bits: Int, img: Array[Int], tw: Int)
      extends Transform
  private case object SubtractGreenT extends Transform
  private final case class PaletteT(colors: Array[Int], widthBits: Int)
      extends Transform

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2
    (((a >>> 24) + (b >>> 24)) / 2) << 24 |
      ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2) << 16 |
      ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2) << 8 |
      (((a & 0xff) + (b & 0xff)) / 2)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int = clamp255(
      ((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    def ch(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      clamp255(a + (a - b) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int): Int = (p >>> sh) & 0xff
    val pa = ch(l, 24) + ch(t, 24) - ch(tl, 24)
    val pr = ch(l, 16) + ch(t, 16) - ch(tl, 16)
    val pg = ch(l, 8) + ch(t, 8) - ch(tl, 8)
    val pb = ch(l, 0) + ch(t, 0) - ch(tl, 0)
    val pL = math.abs(pa - ch(l, 24)) + math.abs(pr - ch(l, 16)) +
      math.abs(pg - ch(l, 8)) + math.abs(pb - ch(l, 0))
    val pT = math.abs(pa - ch(t, 24)) + math.abs(pr - ch(t, 16)) +
      math.abs(pg - ch(t, 8)) + math.abs(pb - ch(t, 0))
    if (pL < pT) l else t
  }

  private def addPixels(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) & 0xff) << 24) |
      ((((a >> 16) + (b >> 16)) & 0xff) << 16) |
      ((((a >> 8) + (b >> 8)) & 0xff) << 8) |
      (((a + b) & 0xff))

  /** The prediction for pixel `pos` given already-final pixels before
    * it (flat indexing gives the spec's top-right wrap for the last
    * column for free). Shared verbatim by the fixture encoder. */
  private[operators] def predict(
      data: Array[Int], pos: Int, w: Int, mode: Int): Int = {
    val x = pos % w
    val y = pos / w
    if (x == 0 && y == 0) return 0xff000000
    if (y == 0) return data(pos - 1) // forced L on the top row
    if (x == 0) return data(pos - w) // forced T on the left column
    val l = data(pos - 1)
    val t = data(pos - w)
    val tl = data(pos - w - 1)
    val tr = data(pos - w + 1)
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(avg2(l, t), tl)
      case _ => throw Invalid
    }
  }

  /** signed (t * c) >> 5 with both args as int8 — the spec's
    * ColorTransformDelta. */
  private[operators] def colorDelta(t: Int, c: Int): Int =
    ((t.toByte.toInt * c.toByte.toInt) >> 5)

  private def applyInverse(
      t: Transform, pixels: Array[Int], w: Int, h: Int)
      : (Array[Int], Int) = t match {
    case SubtractGreenT =>
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) + g) & 0xff
        val b = ((p & 0xff) + g) & 0xff
        pixels(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
      (pixels, w)
    case PredictorT(bits, img, tw) =>
      var pos = 0
      while (pos < pixels.length) {
        val x = pos % w
        val y = pos / w
        val mode = (img((y >> bits) * tw + (x >> bits)) >> 8) & 0xff
        if (mode > 13) throw Invalid
        pixels(pos) = addPixels(pixels(pos), predict(pixels, pos, w, mode))
        pos += 1
      }
      (pixels, w)
    case ColorT(bits, img, tw) =>
      var pos = 0
      while (pos < pixels.length) {
        val x = pos % w
        val y = pos / w
        val cte = img((y >> bits) * tw + (x >> bits))
        val g2r = cte & 0xff          // blue byte
        val g2b = (cte >> 8) & 0xff   // green byte
        val r2b = (cte >> 16) & 0xff  // red byte
        val p = pixels(pos)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) + colorDelta(g2r, g)) & 0xff
        var b = ((p & 0xff) + colorDelta(g2b, g)) & 0xff
        b = (b + colorDelta(r2b, r)) & 0xff
        pixels(pos) = (p & 0xff00ff00) | (r << 16) | b
        pos += 1
      }
      (pixels, w)
    case PaletteT(colors, widthBits) =>
      val bitsPerPixel = 8 >> widthBits
      val packedW = divRoundUp(w, 1 << widthBits)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val packed = pixels(y * packedW + (x >> widthBits))
          val shift = (x & ((1 << widthBits) - 1)) * bitsPerPixel
          val idx = ((packed >> 8) >> shift) & ((1 << bitsPerPixel) - 1)
          if (idx >= colors.length) throw Invalid
          out(y * w + x) = colors(idx)
          x += 1
        }
        y += 1
      }
      (out, w)
  }

  // ---------------------------------------------------------------
  // top-level decode
  // ---------------------------------------------------------------

  /** widthBits for the color-indexing packing rule. */
  private def paletteWidthBits(nColors: Int): Int =
    if (nColors <= 2) 3 else if (nColors <= 4) 2
    else if (nColors <= 16) 1 else 0

  /** Decode a RIFF/WEBP file whose image chunk is VP8L. None for
    * lossy VP8 (the documented codec seam) and malformed input. */
  def decode(bytes: Array[Byte]): Option[PngPixels.Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def decode0(b: Array[Byte]): Option[PngPixels.Decoded] = {
    if (b == null || b.length < 12 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return None
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    // chunk walk to the VP8L payload (tolerates a leading VP8X)
    var off = 12
    var payload = -1
    var payloadLen = 0
    while (off + 8 <= b.length && payload < 0) {
      val tag = new String(
        Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")
      val size = le32(off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      if (tag == "VP8L") { payload = off + 8; payloadLen = size.toInt }
      off += 8 + size.toInt + (size.toInt & 1) // chunks are 2-aligned
    }
    if (payload < 0 || payloadLen < 5) return None
    if ((b(payload) & 0xff) != 0x2f) return None
    val br = new BitReader(b, payload + 1, payload + payloadLen)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    val alphaHint = br.readBits(1) == 1
    if (br.readBits(3) != 0) return None // version must be 0
    if (w.toLong * h > (1L << 24)) return None

    val pixels = decodeArgbStream(br, w, h)
    // ARGB → interleaved bytes (RGBA when the alpha hint is set)
    val channels = if (alphaHint) 4 else 3
    val out = new Array[Byte](w * h * channels)
    var i = 0
    var o = 0
    while (i < pixels.length) {
      val p = pixels(i)
      out(o) = ((p >> 16) & 0xff).toByte
      out(o + 1) = ((p >> 8) & 0xff).toByte
      out(o + 2) = (p & 0xff).toByte
      if (channels == 4) out(o + 3) = ((p >>> 24) & 0xff).toByte
      o += channels
      i += 1
    }
    Some(PngPixels.Decoded(w, h, channels, out))
  }

  /** The VP8L bitstream BODY (transform loop → entropy-coded image →
    * inverse transforms) for a w×h image — the part shared by the
    * standalone VP8L chunk (after its 5-byte header) and the ALPH
    * chunk's compressed alpha (which has NO header: dimensions come
    * from the container, RFC 9649 §Alpha). Returns full-size ARGB. */
  private def decodeArgbStream(
      br: BitReader, w: Int, h: Int): Array[Int] = {
    // transforms (each type at most once); color-indexing shrinks the
    // coded width for everything read after it
    var curW = w
    var transforms = List.empty[Transform]
    var seen = Set.empty[Int]
    while (br.readBit() == 1) {
      val tt = br.readBits(2)
      if (seen(tt)) throw Invalid
      seen += tt
      tt match {
        case 0 =>
          val bits = br.readBits(3) + 2
          val tw = divRoundUp(curW, 1 << bits)
          val th = divRoundUp(h, 1 << bits)
          transforms ::= PredictorT(bits,
            readImageData(tw, th, spatial = false, br), tw)
        case 1 =>
          val bits = br.readBits(3) + 2
          val tw = divRoundUp(curW, 1 << bits)
          val th = divRoundUp(h, 1 << bits)
          transforms ::= ColorT(bits,
            readImageData(tw, th, spatial = false, br), tw)
        case 2 =>
          transforms ::= SubtractGreenT
        case 3 =>
          val n = br.readBits(8) + 1
          val deltas = readImageData(n, 1, spatial = false, br)
          val colors = new Array[Int](n)
          var prev = 0
          var i = 0
          while (i < n) {
            prev = addPixels(prev, deltas(i))
            colors(i) = prev
            i += 1
          }
          val wb = paletteWidthBits(n)
          transforms ::= PaletteT(colors, wb)
          curW = divRoundUp(w, 1 << wb)
      }
    }
    var pixels = readImageData(curW, h, spatial = true, br)
    // inverse transforms in reverse read order = list order (we
    // prepended); width returns to full size at the palette inverse
    var width = curW
    transforms.foreach { t =>
      val (p2, w2) = applyInverse(t, pixels, if (t.isInstanceOf[PaletteT]) w
        else width, h)
      pixels = p2
      width = w2
    }
    if (width != w) throw Invalid
    pixels
  }

  /** Decode an ALPH chunk payload (RFC 9649): 1 header byte —
    * 2 reserved, 2 preprocessing (record-only), 2 filtering, 2
    * compression — then either raw w×h bytes (compression 0) or a
    * header-less VP8L stream whose GREEN channel carries the alpha
    * (compression 1). The prediction filter (none/horizontal/
    * vertical/gradient) is undone per pixel with the spec's edge
    * rules. Returns the w×h alpha plane, or None on dirty bytes. */
  private[operators] def decodeAlphaPayload(
      b: Array[Byte], start: Int, end: Int, w: Int, h: Int)
      : Option[Array[Byte]] = {
    try {
      if (end - start < 1 || w <= 0 || h <= 0 ||
        w.toLong * h > (1L << 24)) return None
      val head = b(start) & 0xff
      if ((head >> 6) != 0) return None // reserved bits
      val filter = (head >> 2) & 3
      val compression = head & 3
      if (compression > 1) return None
      val raw = new Array[Byte](w * h)
      if (compression == 0) {
        if (end - start - 1 < w * h) return None
        System.arraycopy(b, start + 1, raw, 0, w * h)
      } else {
        val br = new BitReader(b, start + 1, end)
        val argb = decodeArgbStream(br, w, h)
        var i = 0
        while (i < w * h) { raw(i) = ((argb(i) >> 8) & 0xff).toByte; i += 1 }
      }
      if (filter == 0) return Some(raw)
      // in-place unfilter (libwebp utils/filters.c semantics)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = raw(y * w + x) & 0xff
          val left = if (x > 0) out(y * w + x - 1) & 0xff else 0
          val above = if (y > 0) out((y - 1) * w + x) & 0xff else 0
          val pred = filter match {
            case 1 => // horizontal: first px of a row predicts from above
              if (x > 0) left else if (y > 0) above else 0
            case 2 => // vertical: first row predicts from the left
              if (y > 0) above else left
            case _ => // gradient
              if (x == 0 && y == 0) 0
              else if (x == 0) above
              else if (y == 0) left
              else {
                val al = out((y - 1) * w + x - 1) & 0xff
                val g = left + above - al
                if (g < 0) 0 else if (g > 255) 255 else g
              }
          }
          out(y * w + x) = ((d + pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** Decoded VP8 planes of a lossy WebP: (planeId, bytes) with
    * 0=Y (w×h), 1=U, 2=V (both ceil(w/2)×ceil(h/2)), and 3=alpha
    * (w×h, only when an ALPH chunk is present). This is the spec-level
    * output surface — RFC 6386 ends at the YUV planes, so plane-exact
    * conformance (and the webp_lossy_pixels oracle) lives here, before
    * any RGB policy. None for VP8L-only or malformed files. */
  def decodePlanes(bytes: Array[Byte])
      : Option[(Int, Int, Seq[(Int, Array[Byte])])] = {
    try {
      val c = walkContainer(bytes).getOrElse(return None)
      if (c.vp8At < 0) return None
      val yuv = Vp8.decodeFrame(bytes, c.vp8At, c.vp8Len)
        .getOrElse(return None)
      val base = Seq(0 -> yuv.y, 1 -> yuv.u, 2 -> yuv.v)
      if (c.alphAt < 0) Some((yuv.width, yuv.height, base))
      else decodeAlphaPayload(bytes, c.alphAt, c.alphAt + c.alphLen,
          yuv.width, yuv.height) match {
        case Some(a) => Some((yuv.width, yuv.height, base :+ (3 -> a)))
        case None => None
      }
    } catch { case _: Exception => None }
  }

  private final case class Chunks(
      vp8At: Int, vp8Len: Int, alphAt: Int, alphLen: Int, hasVp8l: Boolean)

  private def walkContainer(b: Array[Byte]): Option[Chunks] = {
    if (b == null || b.length < 12 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return None
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var off = 12
    var vp8At = -1; var vp8Len = 0
    var alphAt = -1; var alphLen = 0
    var hasVp8l = false
    while (off + 8 <= b.length) {
      val tag = new String(
        Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")
      val size = le32(off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      tag match {
        case "VP8 " => if (vp8At < 0) { vp8At = off + 8; vp8Len = size.toInt }
        case "VP8L" => hasVp8l = true
        case "ALPH" => if (alphAt < 0) { alphAt = off + 8; alphLen = size.toInt }
        case "ANIM" | "ANMF" => return None // animation out of subset
        case _ => ()
      }
      off += 8 + size.toInt + (size.toInt & 1)
    }
    Some(Chunks(vp8At, vp8Len, alphAt, alphLen, hasVp8l))
  }

  /** One composited animation frame: a full-canvas RGBA snapshot
    * (the [[Gif.decodeComposited]] contract). */
  final case class AnimFrame(durationMs: Int, pixels: Array[Byte])

  /** Animated WebP (RFC 9649 ANIM/ANMF) decode to COMPOSITED canvas
    * snapshots: every ANMF frame's image chunks (ALPH? + VP8|VP8L —
    * each decoded by the same real codecs as stills) are painted onto
    * the canvas at the frame rectangle, honoring the BLEND flag
    * (alpha-blend vs overwrite) and DISPOSE flag (fill the rect with
    * the ANIM background color after snapshotting). The alpha-blend
    * is the container spec's formula fixed to exact integer
    * arithmetic so an external oracle replays every pixel:
    *
    * {{{
    * wS = Sa·255; wD = Da·(255−Sa); denom = wS + wD
    * outA  = (denom + 127) / 255
    * out.c = (Sc·wS + Dc·wD + denom/2) / denom   (0 when denom == 0)
    * }}}
    *
    * Returns (canvasW, canvasH, frames); None for stills or malformed
    * bytes (frame rect outside the canvas, odd offsets, bad payloads
    * — all fail the FILE, the dirty-crawl-bytes contract). */
  def decodeAnimation(bytes: Array[Byte])
      : Option[(Int, Int, Vector[AnimFrame])] = {
    try decodeAnimation0(bytes)
    catch { case _: Exception => None }
  }

  private def decodeAnimation0(b: Array[Byte])
      : Option[(Int, Int, Vector[AnimFrame])] = {
    if (b == null || b.length < 30 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return None
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def le24(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
    var off = 12
    var canvasW = -1; var canvasH = -1
    var bg = 0L // BGRA from ANIM
    var sawAnim = false
    var canvas: Array[Byte] = null
    val frames = Vector.newBuilder[AnimFrame]
    var nFrames = 0
    while (off + 8 <= b.length) {
      val tag = new String(
        Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")
      val size = le32(off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      val p = off + 8
      tag match {
        case "VP8X" =>
          if (size < 10) return None
          canvasW = le24(p + 4) + 1
          canvasH = le24(p + 7) + 1
          if (canvasW.toLong * canvasH * 4 > PngPixels.MaxDecodedBytes)
            return None
          canvas = new Array[Byte](canvasW * canvasH * 4)
        case "ANIM" =>
          if (size < 6) return None
          bg = le32(p) // background color, byte order B,G,R,A
          sawAnim = true
        case "ANMF" =>
          if (!sawAnim || canvas == null || size < 16) return None
          nFrames += 1
          if (nFrames.toLong * canvasW * canvasH * 4 >
            PngPixels.MaxDecodedBytes) return None
          val x0 = le24(p) * 2
          val y0 = le24(p + 3) * 2
          val fw = le24(p + 6) + 1
          val fh = le24(p + 9) + 1
          val dur = le24(p + 12)
          val flags = b(p + 15) & 0xff
          val blend = (flags & 2) == 0 // bit 1: 0 = alpha-blend
          val dispose = (flags & 1) == 1 // bit 0: dispose to background
          if (x0 + fw > canvasW || y0 + fh > canvasH) return None
          // frame payload: image chunks after the 16-byte header —
          // rewrap them as a standalone file for the still decoders
          val sub = new java.io.ByteArrayOutputStream()
          sub.write("RIFF????WEBP".getBytes("US-ASCII"))
          sub.write(b, p + 16, (size - 16).toInt)
          val fileBytes = sub.toByteArray
          val riffLen = fileBytes.length - 8
          fileBytes(4) = (riffLen & 0xff).toByte
          fileBytes(5) = ((riffLen >> 8) & 0xff).toByte
          fileBytes(6) = ((riffLen >> 16) & 0xff).toByte
          fileBytes(7) = ((riffLen >> 24) & 0xff).toByte
          val dec = decodeRgba(fileBytes).getOrElse(return None)
          if (dec.width != fw || dec.height != fh) return None
          // paint
          var yy = 0
          while (yy < fh) {
            var xx = 0
            while (xx < fw) {
              val di = ((y0 + yy) * canvasW + (x0 + xx)) * 4
              val si = (yy * fw + xx) * dec.channels
              val sr = dec.pixels(si) & 0xff
              val sg = dec.pixels(si + 1) & 0xff
              val sb = dec.pixels(si + 2) & 0xff
              val sa = if (dec.channels == 4) dec.pixels(si + 3) & 0xff
                else 255
              if (!blend || sa == 255) {
                canvas(di) = sr.toByte
                canvas(di + 1) = sg.toByte
                canvas(di + 2) = sb.toByte
                canvas(di + 3) = sa.toByte
              } else {
                val da = canvas(di + 3) & 0xff
                val wS = sa * 255
                val wD = da * (255 - sa)
                val denom = wS + wD
                if (denom == 0) {
                  canvas(di) = 0; canvas(di + 1) = 0
                  canvas(di + 2) = 0; canvas(di + 3) = 0
                } else {
                  canvas(di) = (((sr * wS + (canvas(di) & 0xff) * wD +
                    denom / 2) / denom) & 0xff).toByte
                  canvas(di + 1) = (((sg * wS + (canvas(di + 1) & 0xff) * wD +
                    denom / 2) / denom) & 0xff).toByte
                  canvas(di + 2) = (((sb * wS + (canvas(di + 2) & 0xff) * wD +
                    denom / 2) / denom) & 0xff).toByte
                  canvas(di + 3) = ((denom + 127) / 255).toByte
                }
              }
              xx += 1
            }
            yy += 1
          }
          frames += AnimFrame(dur, canvas.clone())
          if (dispose) {
            val br = ((bg >> 16) & 0xff).toInt
            val bgc = ((bg >> 8) & 0xff).toInt
            val bb = (bg & 0xff).toInt
            val ba = ((bg >> 24) & 0xff).toInt
            var y2 = y0
            while (y2 < y0 + fh) {
              var x2 = x0
              while (x2 < x0 + fw) {
                val di = (y2 * canvasW + x2) * 4
                canvas(di) = br.toByte; canvas(di + 1) = bgc.toByte
                canvas(di + 2) = bb.toByte; canvas(di + 3) = ba.toByte
                x2 += 1
              }
              y2 += 1
            }
          }
        case _ => ()
      }
      off += 8 + size.toInt + (size.toInt & 1)
    }
    val out = frames.result()
    if (!sawAnim || out.isEmpty) None
    else Some((canvasW, canvasH, out))
  }

  /** Full WebP container decode to interleaved pixels: VP8L chunks
    * through the lossless path ([[decode]]), VP8 chunks through the
    * [[Vp8]] keyframe decoder with an optional ALPH alpha plane.
    * YUV 4:2:0 → RGB policy (documented, ours — the spec ends at the
    * YUV planes): nearest-neighbor chroma upsample + the integer JFIF
    * transform (×65536 fixed point, round-half-up) shared with the
    * JPEG consumers. Returns RGBA when alpha is present, RGB
    * otherwise; None for malformed or animated (ANIM) files. */
  def decodeRgba(bytes: Array[Byte]): Option[PngPixels.Decoded] = {
    try decodeRgba0(bytes)
    catch { case _: Exception => None }
  }

  private def decodeRgba0(b: Array[Byte]): Option[PngPixels.Decoded] = {
    val c = walkContainer(b).getOrElse(return None)
    if (c.hasVp8l) return decode(b)
    if (c.vp8At < 0) return None
    val yuv = Vp8.decodeFrame(b, c.vp8At, c.vp8Len).getOrElse(return None)
    val w = yuv.width; val h = yuv.height
    val alpha = if (c.alphAt < 0) None else {
      val a = decodeAlphaPayload(b, c.alphAt, c.alphAt + c.alphLen, w, h)
      if (a.isEmpty) return None // a present-but-dirty ALPH fails the file
      a
    }
    val ch = if (alpha.isDefined) 4 else 3
    val cw = (w + 1) / 2
    val out = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yy = yuv.y(y * w + x) & 0xff
        val cb = (yuv.u((y >> 1) * cw + (x >> 1)) & 0xff) - 128
        val cr = (yuv.v((y >> 1) * cw + (x >> 1)) & 0xff) - 128
        @inline def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
        val o = (y * w + x) * ch
        out(o) = cl(yy + ((91881 * cr + 32768) >> 16)).toByte
        out(o + 1) = cl(yy - ((22554 * cb + 46802 * cr + 32768) >> 16)).toByte
        out(o + 2) = cl(yy + ((116130 * cb + 32768) >> 16)).toByte
        if (ch == 4) out(o + 3) = alpha.get(y * w + x)
        x += 1
      }
      y += 1
    }
    Some(PngPixels.Decoded(w, h, ch, out))
  }

  // ---------------------------------------------------------------
  // fixture encoder
  // ---------------------------------------------------------------

  /** Encoder options — each field exercises one decoder feature. */
  final case class EncodeOptions(
      subtractGreen: Boolean = false,
      predictorBits: Int = 0,
      predictorModeOf: (Int, Int) => Int = (_, _) => 2,
      colorBits: Int = 0,
      cteOf: (Int, Int) => (Int, Int, Int) = (_, _) => (0, 0, 0),
      palette: Option[Array[Int]] = None,
      cacheBits: Int = 0,
      lzRowPeriod: Int = 0,
      metaSplit: Boolean = false,
      alphaHint: Boolean = false)

  private sealed trait Op
  private final case class Lit(px: Int) extends Op
  private final case class CacheRef(idx: Int) extends Op
  /** `distCode` is the POST-2D-mapping code (1..120 = neighborhood
    * entry, >120 = plain distance + 120) — what the prefix coder
    * carries on the wire. */
  private final case class Copy(len: Int, distCode: Int) extends Op

  private def huffmanLengths(freq: Array[Long]): Array[Int] = {
    // deterministic two-least merge (O(n^2), alphabets ≤ 2072)
    val n = freq.length
    val parent = new Array[Int](2 * n) // 0 = "never merged"
    val weight = new Array[Long](2 * n)
    val alive = new Array[Boolean](2 * n)
    var count = 0
    var i = 0
    while (i < n) {
      if (freq(i) > 0) { weight(i) = freq(i); alive(i) = true; count += 1 }
      i += 1
    }
    require(count >= 2, "huffmanLengths needs >= 2 used symbols")
    var next = n
    var remaining = count
    while (remaining > 1) {
      var a = -1; var b = -1
      i = 0
      while (i < next) {
        if (alive(i)) {
          if (a < 0 || weight(i) < weight(a)) { b = a; a = i }
          else if (b < 0 || weight(i) < weight(b)) b = i
        }
        i += 1
      }
      alive(a) = false; alive(b) = false
      weight(next) = weight(a) + weight(b)
      parent(a) = next; parent(b) = next
      alive(next) = true
      next += 1
      remaining -= 1
    }
    // depths top-down: the root (next-1) is 0; every merged node's
    // parent index is ≥ n ≥ 40 > 0, so parent==0 identifies unused
    // leaves
    val depth = new Array[Int](2 * n)
    i = next - 2
    while (i >= 0) {
      if (parent(i) > 0) depth(i) = depth(parent(i)) + 1
      i -= 1
    }
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      if (freq(i) > 0) {
        out(i) = depth(i)
        require(out(i) >= 1 && out(i) <= 15,
          s"code length ${out(i)} out of [1,15] — fixture too large")
      }
      i += 1
    }
    out
  }

  private def canonicalCodesOf(lengths: Array[Int]): Array[Int] = {
    val blCount = new Array[Int](16)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= 15) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    val codes = new Array[Int](lengths.length)
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { codes(i) = nextCode(lengths(i))
        nextCode(lengths(i)) += 1 }
      i += 1
    }
    codes
  }

  /** One tree: simple form when ≤2 used symbols all ≤255, else the
    * normal form with a fixed uniform 4-bit code-length code (all 16
    * length symbols at length 4 — complete by construction). */
  private final class TreeWriter(freq: Array[Long]) {
    private val used = freq.zipWithIndex.filter(_._1 > 0).map(_._2)
    require(used.nonEmpty, "tree with no used symbols")
    private val simple = used.length <= 2 && used.forall(_ <= 255)
    private val lengths =
      if (simple) null else huffmanLengths(freq)
    private val codes = if (simple) null else canonicalCodesOf(lengths)

    def writeSymbol(bw: BitWriter, s: Int): Unit = {
      if (simple) {
        if (used.length == 2) bw.writeBit(if (s == used(0)) 0 else 1)
        // single symbol: zero bits
      } else {
        require(lengths(s) > 0, s"unexpected symbol $s")
        bw.writeCode(codes(s), lengths(s))
      }
    }

    def writeHeader(bw: BitWriter): Unit = {
      if (simple) {
        bw.writeBit(1)
        bw.writeBit(if (used.length == 2) 1 else 0)
        bw.writeBit(1)
        bw.writeBits(used(0), 8)
        if (used.length == 2) bw.writeBits(used(1), 8)
      } else {
        bw.writeBit(0) // normal code
        bw.writeBits(19 - 4, 4)
        // uniform 4-bit code over length symbols 0..15 (complete:
        // 16 * 2^-4 = 1); repeats 16/17/18 unused (length 0)
        CodeLengthCodeOrder.foreach { s =>
          bw.writeBits(if (s <= 15) 4 else 0, 3)
        }
        bw.writeBit(0) // no max_symbol cap
        // canonical over 16 symbols of equal length: code(s) = s
        lengths.foreach { l => bw.writeCode(l, 4) }
      }
    }
  }

  private def treeFor(freq: Array[Long]): TreeWriter = new TreeWriter(freq)

  /** Ops → symbol frequency tables (green/red/blue/alpha/dist). */
  private def histogram(
      ops: Seq[Op], cacheSize: Int)
      : (Array[Long], Array[Long], Array[Long], Array[Long], Array[Long]) = {
    val g = new Array[Long](256 + 24 + cacheSize)
    val r = new Array[Long](256)
    val bl = new Array[Long](256)
    val a = new Array[Long](256)
    val d = new Array[Long](40)
    ops.foreach {
      case Lit(px) =>
        g((px >> 8) & 0xff) += 1
        r((px >> 16) & 0xff) += 1
        bl(px & 0xff) += 1
        a((px >>> 24) & 0xff) += 1
      case CacheRef(idx) => g(280 + idx) += 1
      case Copy(len, distCode) =>
        g(256 + prefixCodeOf(len)._1) += 1
        d(prefixCodeOf(distCode)._1) += 1
    }
    // the spec requires all five trees; give never-used trees a
    // trivial single symbol
    if (r.forall(_ == 0)) r(0) = 1
    if (bl.forall(_ == 0)) bl(0) = 1
    if (a.forall(_ == 0)) a(0) = 1
    if (d.forall(_ == 0)) d(0) = 1
    (g, r, bl, a, d)
  }

  private final case class TreeSet(
      g: TreeWriter, r: TreeWriter, b: TreeWriter, a: TreeWriter,
      d: TreeWriter) {
    def writeHeaders(bw: BitWriter): Unit = {
      g.writeHeader(bw); r.writeHeader(bw); b.writeHeader(bw)
      a.writeHeader(bw); d.writeHeader(bw)
    }
  }

  private def writeOps(
      bw: BitWriter, ops: Seq[Op], groupOf: Int => TreeSet,
      w: Int): Unit = {
    var pos = 0
    ops.foreach { op =>
      val ts = groupOf(pos)
      op match {
        case Lit(px) =>
          ts.g.writeSymbol(bw, (px >> 8) & 0xff)
          ts.r.writeSymbol(bw, (px >> 16) & 0xff)
          ts.b.writeSymbol(bw, px & 0xff)
          ts.a.writeSymbol(bw, (px >>> 24) & 0xff)
          pos += 1
        case CacheRef(idx) =>
          ts.g.writeSymbol(bw, 280 + idx)
          pos += 1
        case Copy(len, distCode) =>
          val (lc, leb, lev) = prefixCodeOf(len)
          ts.g.writeSymbol(bw, 256 + lc)
          if (leb > 0) bw.writeBits(lev, leb)
          val (dc, deb, dev) = prefixCodeOf(distCode)
          ts.d.writeSymbol(bw, dc)
          if (deb > 0) bw.writeBits(dev, deb)
          pos += len
      }
    }
  }

  /** All-literal entropy-coded subimage (transform data, palettes,
    * meta images). */
  private def writeEntropyImage(bw: BitWriter, pixels: Array[Int]): Unit = {
    bw.writeBit(0) // no color cache
    val ops = pixels.map(Lit(_)).toSeq
    val (g, r, b, a, d) = histogram(ops, 0)
    val ts = TreeSet(treeFor(g), treeFor(r), treeFor(b), treeFor(a),
      treeFor(d))
    ts.writeHeaders(bw)
    writeOps(bw, ops, _ => ts, pixels.length)
  }

  /** Reverse lookup into [[DistanceMap]] — lets fixtures exercise the
    * 2D distance branch. */
  private def distCodeFor(dist: Int, w: Int): Int = {
    var i = 0
    while (i < DistanceMap.length) {
      val (dx, dy) = DistanceMap(i)
      if (math.max(1, dy * w + dx) == dist) return i + 1
      i += 1
    }
    dist + 120
  }

  /** Encode `argb` (w×h, row-major ARGB ints) as a RIFF/WEBP/VP8L
    * file that [[decode]] (and any conformant decoder) restores
    * bit-exactly. */
  def encode(
      argb: Array[Int], w: Int, h: Int,
      opts: EncodeOptions = EncodeOptions()): Array[Byte] = {
    require(argb.length == w * h)
    val bw = new BitWriter()
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBit(if (opts.alphaHint) 1 else 0)
    bw.writeBits(0, 3) // version

    var cur = argb.clone()
    var curW = w

    // transforms in read order; forward-apply in the same order (the
    // decoder inverts in reverse, recovering the original)
    opts.palette.foreach { colors =>
      bw.writeBit(1); bw.writeBits(3, 2)
      bw.writeBits(colors.length - 1, 8)
      val deltas = new Array[Int](colors.length)
      var prev = 0
      var i = 0
      while (i < colors.length) {
        // per-channel byte subtraction (the delta the decoder re-sums)
        val c = colors(i)
        deltas(i) =
          ((((c >>> 24) - (prev >>> 24)) & 0xff) << 24) |
          ((((c >> 16) - (prev >> 16)) & 0xff) << 16) |
          ((((c >> 8) - (prev >> 8)) & 0xff) << 8) |
          (((c - prev) & 0xff))
        prev = c
        i += 1
      }
      writeEntropyImage(bw, deltas)
      val wb = paletteWidthBits(colors.length)
      val bitsPerPixel = 8 >> wb
      val packedW = divRoundUp(w, 1 << wb)
      val packed = new Array[Int](packedW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = cur(y * w + x)
          val idx = colors.indexOf(px)
          require(idx >= 0, "pixel not in palette")
          val slot = y * packedW + (x >> wb)
          val shift = (x & ((1 << wb) - 1)) * bitsPerPixel
          packed(slot) |= (idx << shift) << 8 // green channel
          x += 1
        }
        y += 1
      }
      // alpha 0xff on packed pixels (green carries the indices)
      var i2 = 0
      while (i2 < packed.length) {
        packed(i2) |= 0xff000000; i2 += 1
      }
      cur = packed
      curW = packedW
    }

    if (opts.colorBits > 0) {
      bw.writeBit(1); bw.writeBits(1, 2)
      bw.writeBits(opts.colorBits - 2, 3)
      val tw = divRoundUp(curW, 1 << opts.colorBits)
      val th = divRoundUp(h, 1 << opts.colorBits)
      val img = new Array[Int](tw * th)
      var by = 0
      while (by < th) {
        var bx = 0
        while (bx < tw) {
          val (g2r, g2b, r2b) = opts.cteOf(bx, by)
          img(by * tw + bx) = 0xff000000 | ((r2b & 0xff) << 16) |
            ((g2b & 0xff) << 8) | (g2r & 0xff)
          bx += 1
        }
        by += 1
      }
      writeEntropyImage(bw, img)
      // forward: subtract the deltas the decoder will add back
      var pos = 0
      while (pos < cur.length) {
        val x = pos % curW
        val y = pos / curW
        val cte = img((y >> opts.colorBits) * tw + (x >> opts.colorBits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val p = cur(pos)
        val g = (p >> 8) & 0xff
        val origR = (p >> 16) & 0xff
        val origB = p & 0xff
        val encR = (origR - colorDelta(g2r, g)) & 0xff
        val encB = (origB - colorDelta(g2b, g) - colorDelta(r2b, origR)) & 0xff
        cur(pos) = (p & 0xff00ff00) | (encR << 16) | encB
        pos += 1
      }
    }

    if (opts.subtractGreen) {
      bw.writeBit(1); bw.writeBits(2, 2)
      var i = 0
      while (i < cur.length) {
        val p = cur(i)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        cur(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
    }

    if (opts.predictorBits > 0) {
      bw.writeBit(1); bw.writeBits(0, 2)
      bw.writeBits(opts.predictorBits - 2, 3)
      val tw = divRoundUp(curW, 1 << opts.predictorBits)
      val th = divRoundUp(h, 1 << opts.predictorBits)
      val img = new Array[Int](tw * th)
      var by = 0
      while (by < th) {
        var bx = 0
        while (bx < tw) {
          img(by * tw + bx) =
            0xff000000 | ((opts.predictorModeOf(bx, by) % 14) << 8)
          bx += 1
        }
        by += 1
      }
      writeEntropyImage(bw, img)
      // residuals against the ORIGINAL context (what the decoder has
      // reconstructed by each position)
      val orig = cur.clone()
      var pos = 0
      while (pos < cur.length) {
        val x = pos % curW
        val y = pos / curW
        val mode = (img((y >> opts.predictorBits) * tw +
          (x >> opts.predictorBits)) >> 8) & 0xff
        val pred = predict(orig, pos, curW, mode)
        val p = orig(pos)
        cur(pos) =
          ((((p >>> 24) - (pred >>> 24)) & 0xff) << 24) |
          ((((p >> 16) - (pred >> 16)) & 0xff) << 16) |
          ((((p >> 8) - (pred >> 8)) & 0xff) << 8) |
          (((p - pred) & 0xff))
        pos += 1
      }
    }

    bw.writeBit(0) // no more transforms

    // ---- spatially-coded image ----
    val cacheSize = if (opts.cacheBits > 0) 1 << opts.cacheBits else 0
    if (opts.cacheBits > 0) {
      bw.writeBit(1); bw.writeBits(opts.cacheBits, 4)
    } else bw.writeBit(0)

    // ops per the options
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val filled = if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    val ops = scala.collection.mutable.ArrayBuffer.empty[Op]
    if (opts.lzRowPeriod > 0 && h > opts.lzRowPeriod) {
      val head = opts.lzRowPeriod * curW
      var i = 0
      while (i < head) { ops += Lit(cur(i)); i += 1 }
      // row copies from `period` rows above: the (0, period) entry of
      // the 2D map when period ≤ 7 (exercising that branch), else 1D
      val dCode = distCodeFor(opts.lzRowPeriod * curW, curW)
      var y = opts.lzRowPeriod
      while (y < h) {
        ops += Copy(curW, dCode)
        y += 1
      }
    } else {
      var i = 0
      while (i < cur.length) {
        val px = cur(i)
        if (cache != null) {
          val hsh = cacheHash(px, opts.cacheBits)
          if (filled(hsh) && cache(hsh) == px) ops += CacheRef(hsh)
          else { ops += Lit(px); cache(hsh) = px; filled(hsh) = true }
        } else ops += Lit(px)
        i += 1
      }
    }

    // meta split: two groups by block row (only when ≥ 2 block rows)
    val metaBits = 2
    val useMeta = opts.metaSplit && divRoundUp(h, 1 << metaBits) >= 2
    if (useMeta) {
      bw.writeBit(1)
      bw.writeBits(metaBits - 2, 3)
      val hw = divRoundUp(curW, 1 << metaBits)
      val hh = divRoundUp(h, 1 << metaBits)
      val img = new Array[Int](hw * hh)
      var i = 0
      while (i < img.length) {
        val by = i / hw
        img(i) = 0xff000000 | ((if (by < hh / 2) 0 else 1) << 8)
        i += 1
      }
      writeEntropyImage(bw, img)
      def groupIdOf(pos: Int): Int = {
        val y = pos / curW
        if ((y >> metaBits) < hh / 2) 0 else 1
      }
      // per-group histograms
      val (ops0, ops1) = {
        val b0 = scala.collection.mutable.ArrayBuffer.empty[Op]
        val b1 = scala.collection.mutable.ArrayBuffer.empty[Op]
        var pos = 0
        ops.foreach { op =>
          (if (groupIdOf(pos) == 0) b0 else b1) += op
          pos += (op match { case Copy(l, _) => l; case _ => 1 })
        }
        (b0.toSeq, b1.toSeq)
      }
      def setOf(o: Seq[Op]): TreeSet = {
        val (g, r, b2, a, d) = histogram(
          if (o.nonEmpty) o else Seq(Lit(0xff000000)), cacheSize)
        TreeSet(treeFor(g), treeFor(r), treeFor(b2), treeFor(a), treeFor(d))
      }
      val t0 = setOf(ops0)
      val t1 = setOf(ops1)
      t0.writeHeaders(bw)
      t1.writeHeaders(bw)
      writeOps(bw, ops.toSeq,
        pos => if (groupIdOf(pos) == 0) t0 else t1, curW)
    } else {
      bw.writeBit(0) // no meta-prefix image
      val (g, r, b2, a, d) = histogram(ops.toSeq, cacheSize)
      val ts = TreeSet(treeFor(g), treeFor(r), treeFor(b2), treeFor(a),
        treeFor(d))
      ts.writeHeaders(bw)
      writeOps(bw, ops.toSeq, _ => ts, curW)
    }

    // ---- RIFF wrap ----
    val vp8l = {
      val body = bw.toBytes
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x2f)
      out.write(body, 0, body.length)
      out.toByteArray
    }
    val riff = new java.io.ByteArrayOutputStream()
    def le32w(v: Int): Unit = {
      riff.write(v & 0xff); riff.write((v >> 8) & 0xff)
      riff.write((v >> 16) & 0xff); riff.write((v >> 24) & 0xff)
    }
    riff.write('R'); riff.write('I'); riff.write('F'); riff.write('F')
    val chunkLen = vp8l.length
    le32w(4 + 8 + chunkLen + (chunkLen & 1))
    riff.write('W'); riff.write('E'); riff.write('B'); riff.write('P')
    riff.write('V'); riff.write('P'); riff.write('8'); riff.write('L')
    le32w(chunkLen)
    riff.write(vp8l, 0, chunkLen)
    if ((chunkLen & 1) == 1) riff.write(0)
    riff.toByteArray
  }
}
