package graft.operators

/** REAL PNG pixel codec — the PNG half of the pixel-level multimodal
  * story (PNG's whole compression stack — zlib — ships in the JDK;
  * the JPEG half is [[JpegDc]]'s baseline Huffman entropy decoder).
  *
  * Writer: full PNG with a genuine zlib-compressed IDAT; scanline `y`
  * uses filter `(y + id) % 5`, so every fixture image exercises ALL
  * FIVE spec filters (None/Sub/Up/Average/Paeth) and a decoder bug in
  * any unfilter path breaks the oracle match. Reader: chunk walk with
  * CRC verification, IDAT concat, `java.util.zip.Inflater`, per-line
  * unfiltering per the PNG spec (RFC 2083 §6).
  *
  * Subset (r8 — the WEB subset, mirroring the JPEG chroma work): 8-bit
  * depth, color types 0 (grayscale), 2 (truecolor), 3 (palette — PLTE
  * expansion to RGB, or RGBA when a tRNS chunk carries per-entry
  * alpha; r10, pinned by the CPython external fixture), 4
  * (gray+alpha), 6 (RGBA), and BOTH interlace methods (none / Adam7
  * seven-pass). That is the whole color-type
  * grammar at depth 8 — a typical web PNG decodes. Anything else
  * (other depths, missing/short PLTE, out-of-range palette index,
  * truncated deflate) → None, never an exception.
  *
  * Pixels follow the deterministic contract [[pix]] — a pure function
  * of (id, x, y, channel) — so a SQL oracle can re-derive exact pixel
  * statistics with no image library: the declared query proves
  * write→deflate→inflate→unfilter(→palette-expand) ends at the
  * analytic form. For palette images the stored sample is
  * `pix(id,x,y,0)` and the palette itself follows [[pal]], so the
  * decoded RGB is the composition of two affine-mod contracts. */
object PngPixels {

  /** The pixel contract the oracle recomputes:
    * `(x*3 + y*5 + id*7 + c*11) mod 256`. */
  def pix(id: Long, x: Int, y: Int, c: Int): Int =
    math.floorMod(x * 3L + y * 5L + id * 7L + c * 11L, 256L).toInt

  /** The palette contract (color type 3): entry `j`, channel `c` is
    * `(j*7 + c*31 + 5) mod 256` — affine in (j, c) so the oracle
    * composes it with [[pix]] analytically. */
  def pal(j: Int, c: Int): Int =
    math.floorMod(j * 7L + c * 31L + 5L, 256L).toInt

  /** Decoded-buffer allocation cap shared by both pixel codecs (PNG
    * here, [[JpegDc]]): header dims are UNTRUSTED on crawled media, so
    * sizes are computed in Long and anything above this bound decodes
    * to None — without the cap, adversarial w×h overflows Int math
    * (wrong geometry / NegativeArraySizeException) or allocates
    * multi-GB buffers whose OutOfMemoryError is an Error the
    * `catch Exception` contract never sees. 256 MiB comfortably covers
    * any sane image while keeping one row's failure mode "null",
    * never an executor kill. */
  private[operators] val MaxDecodedBytes: Long = 1L << 28

  /** Adam7 pass geometry (PNG spec §8.2): x/y origins and steps for
    * the seven progressive passes. */
  private val A7X0 = Array(0, 4, 0, 2, 0, 1, 0)
  private val A7Y0 = Array(0, 0, 4, 0, 2, 0, 1)
  private val A7DX = Array(8, 8, 4, 4, 2, 2, 1)
  private val A7DY = Array(8, 8, 8, 4, 4, 2, 2)

  /** Samples per pixel as STORED (palette stores 1 index byte). */
  private def storageChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Full PNG (signature, IHDR, [PLTE,] IDAT, IEND — all real CRCs)
    * whose decoded pixels equal [[pix]]`(id, x, y, c)` (for color
    * type 3: `pal(pix(id,x,y,0), c)` after expansion). `interlaced`
    * stores the rows in the Adam7 seven-pass layout — the decoder
    * permutes them back, so every pixel-level oracle is
    * layout-independent. Non-interlaced byte output is identical to
    * the pre-r8 writer for types 0/2. */
  def pngWithPixels(id: Long, w: Int, h: Int, colorType: Int,
      interlaced: Boolean = false): Array[Byte] = {
    require(colorType == 0 || colorType == 2 || colorType == 3 ||
      colorType == 4 || colorType == 6, s"colorType $colorType")
    val ch = storageChannels(colorType)
    val stride = w * ch
    // full-resolution stored samples (palette: the index plane)
    val samp = new Array[Int](stride * h)
    var y = 0
    while (y < h) {
      var i = 0
      while (i < stride) {
        samp(y * stride + i) = pix(id, i / ch, y, i % ch)
        i += 1
      }
      y += 1
    }
    val raw = new java.io.ByteArrayOutputStream()
    // one filtered sub-image: rows (ys + j*dy), pixels (xs + i*dx);
    // filter type cycles (j + id + passIdx) % 5 so every pass still
    // exercises all five filters (passIdx = 0 on the sequential path
    // keeps pre-r8 fixtures byte-identical)
    def writePass(xs: Int, ys: Int, dx: Int, dy: Int, passIdx: Int): Unit = {
      val pw = if (w > xs) (w - xs + dx - 1) / dx else 0
      val ph = if (h > ys) (h - ys + dy - 1) / dy else 0
      if (pw == 0 || ph == 0) return
      val ps = pw * ch
      val prior = new Array[Int](ps)
      val cur = new Array[Int](ps)
      var j = 0
      while (j < ph) {
        var i = 0
        while (i < ps) {
          cur(i) = samp((ys + j * dy) * stride + (xs + (i / ch) * dx) * ch +
            i % ch)
          i += 1
        }
        val f = math.floorMod(j + id + passIdx, 5).toInt
        raw.write(f)
        i = 0
        while (i < ps) {
          val a = if (i >= ch) cur(i - ch) else 0
          val b = if (j > 0) prior(i) else 0
          val c = if (j > 0 && i >= ch) prior(i - ch) else 0
          val v = f match {
            case 0 => cur(i)
            case 1 => cur(i) - a
            case 2 => cur(i) - b
            case 3 => cur(i) - (a + b) / 2
            case 4 => cur(i) - paeth(a, b, c)
          }
          raw.write(v & 0xff)
          i += 1
        }
        System.arraycopy(cur, 0, prior, 0, ps)
        j += 1
      }
    }
    if (!interlaced) writePass(0, 0, 1, 1, 0)
    else {
      var p = 0
      while (p < 7) { writePass(A7X0(p), A7Y0(p), A7DX(p), A7DY(p), p); p += 1 }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.writeInt(body.length)
      val tagged = tag.getBytes("US-ASCII") ++ body
      out.write(tagged)
      val crc = new java.util.zip.CRC32(); crc.update(tagged)
      out.writeInt(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(ihdr)
    d.writeInt(w); d.writeInt(h)
    d.write(8); d.write(colorType); d.write(0); d.write(0)
    d.write(if (interlaced) 1 else 0)
    chunk("IHDR", ihdr.toByteArray)
    if (colorType == 3) {
      // full 256-entry palette per the pal contract (stored indices
      // span 0..255, and PLTE's max is exactly 256 entries)
      val plte = new Array[Byte](256 * 3)
      var j = 0
      while (j < 256) {
        var c = 0
        while (c < 3) { plte(j * 3 + c) = pal(j, c).toByte; c += 1 }
        j += 1
      }
      chunk("PLTE", plte)
    }
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Encode an ARBITRARY 8-bit raster as a real PNG (filter-0 rows,
    * genuine zlib IDAT, correct CRCs) — the output half of the image
    * bridge pattern: transforms like resize emit a canonical PNG so
    * every existing kernel (`pixel_stats`, `image_dhash`,
    * `png_histogram`) consumes the result unchanged. Channels 1..4
    * map to color types 0/4/2/6. */
  def encodeRaster(w: Int, h: Int, channels: Int, pixels: Array[Byte])
      : Array[Byte] = {
    require(w > 0 && h > 0 && channels >= 1 && channels <= 4,
      s"w=$w h=$h channels=$channels")
    require(pixels.length == w * h * channels,
      s"${pixels.length} bytes do not tile ${w}x$h x$channels")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    }
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      // filter byte 0 already zeroed by allocation
      System.arraycopy(pixels, y * stride, raw, (stride + 1) * y + 1, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.writeInt(body.length)
      val tagged = tag.getBytes("US-ASCII") ++ body
      out.write(tagged)
      val crc = new java.util.zip.CRC32(); crc.update(tagged)
      out.writeInt(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(ihdr)
    d.writeInt(w); d.writeInt(h)
    d.write(8); d.write(colorType); d.write(0); d.write(0); d.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Decoded 8-bit pixels, scanline-major, `channels` bytes per pixel
    * (palette images arrive EXPANDED: channels = 3). */
  final case class Decoded(
      width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Real decode of the supported subset; None on anything dirty:
    * wrong signature, CRC mismatch, unsupported depth/type, missing or
    * short PLTE, out-of-range palette index, truncated or corrupt
    * deflate stream, short pixel data. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def decode0(bytes: Array[Byte]): Option[Decoded] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    if (bytes.length < 8 || !bytes.take(8).sameElements(sig)) return None
    var pos = 8
    var w = 0; var h = 0; var colorType = -1; var interlace = 0
    var palette: Array[Byte] = null
    var trns: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    def beInt(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    var sawEnd = false
    while (!sawEnd) {
      if (pos + 8 > bytes.length) return None
      val len = beInt(pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != beInt(pos + 8 + len)) return None
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          w = beInt(pos + 8); h = beInt(pos + 12)
          val depth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          interlace = bytes(pos + 20) & 0xff
          if (depth != 8 ||
            (colorType != 0 && colorType != 2 && colorType != 3 &&
              colorType != 4 && colorType != 6) ||
            (interlace != 0 && interlace != 1) || w <= 0 || h <= 0)
            return None
        case "PLTE" =>
          // spec: length a multiple of 3, 1..256 entries, before IDAT
          if (len % 3 != 0 || len == 0 || len > 256 * 3 ||
            idat.size > 0) return None
          palette = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "tRNS" if colorType == 3 =>
          // palette alpha (spec §11.3.2): after PLTE, before IDAT, at
          // most one entry per palette color; missing tail = opaque
          if (palette == null || len > palette.length / 3 ||
            idat.size > 0) return None
          trns = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    if (colorType < 0 || idat.size == 0) return None
    if (colorType == 3 && palette == null) return None
    val ch = storageChannels(colorType)
    val outCh = if (colorType == 3) 3 else ch
    // untrusted dims: size the buffers in Long and cap BEFORE allocating
    if ((w.toLong * outCh + 1L) * h > MaxDecodedBytes ||
      (w.toLong * ch + 1L) * h > MaxDecodedBytes) return None
    val stride = w * ch
    // filtered stream length: one filter byte per stored scanline —
    // sequential = h rows of `stride`; Adam7 = each non-empty pass's
    // own sub-image rows
    var expected = 0L
    if (interlace == 0) expected = (stride + 1).toLong * h
    else {
      var p = 0
      while (p < 7) {
        val pw = if (w > A7X0(p)) (w - A7X0(p) + A7DX(p) - 1) / A7DX(p) else 0
        val ph = if (h > A7Y0(p)) (h - A7Y0(p) + A7DY(p) - 1) / A7DY(p) else 0
        if (pw > 0 && ph > 0) expected += (pw.toLong * ch + 1L) * ph
        p += 1
      }
    }
    if (expected > MaxDecodedBytes) return None
    val expectedI = expected.toInt
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val filtered = new Array[Byte](expectedI)
    var off = 0
    while (off < expectedI && !inflater.finished()) {
      val got = inflater.inflate(filtered, off, expectedI - off)
      if (got == 0 && inflater.needsInput()) return None // truncated
      off += got
    }
    inflater.end()
    if (off != expectedI) return None
    val stored = new Array[Byte](stride * h)
    // unfilter one pass's sub-image (neighbors are WITHIN the pass,
    // PNG spec §8.2) and scatter it onto the full-resolution grid
    var fpos = 0
    def runPass(xs: Int, ys: Int, dx: Int, dy: Int): Boolean = {
      val pw = if (w > xs) (w - xs + dx - 1) / dx else 0
      val ph = if (h > ys) (h - ys + dy - 1) / dy else 0
      if (pw == 0 || ph == 0) return true
      val ps = pw * ch
      val sub = new Array[Byte](ps * ph)
      var j = 0
      while (j < ph) {
        val f = filtered(fpos) & 0xff
        if (f > 4) return false
        fpos += 1
        val outOff = ps * j
        var i = 0
        while (i < ps) {
          val x = filtered(fpos + i) & 0xff
          val a = if (i >= ch) sub(outOff + i - ch) & 0xff else 0
          val b = if (j > 0) sub(outOff - ps + i) & 0xff else 0
          val c = if (j > 0 && i >= ch) sub(outOff - ps + i - ch) & 0xff
            else 0
          val v = f match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 => x + paeth(a, b, c)
          }
          sub(outOff + i) = (v & 0xff).toByte
          i += 1
        }
        fpos += ps
        j += 1
      }
      j = 0
      while (j < ph) {
        var px = 0
        while (px < pw) {
          var c = 0
          while (c < ch) {
            stored(((ys + j * dy) * w + (xs + px * dx)) * ch + c) =
              sub(j * ps + px * ch + c)
            c += 1
          }
          px += 1
        }
        j += 1
      }
      true
    }
    if (interlace == 0) { if (!runPass(0, 0, 1, 1)) return None }
    else {
      var p = 0
      while (p < 7) {
        if (!runPass(A7X0(p), A7Y0(p), A7DX(p), A7DY(p))) return None
        p += 1
      }
    }
    if (colorType != 3) return Some(Decoded(w, h, ch, stored))
    // palette expansion: index sample -> PLTE RGB triple (+ tRNS alpha
    // when present -> RGBA); an index past the palette end is a spec
    // violation -> dirty, not a clamp
    val nEntries = palette.length / 3
    val pch = if (trns != null) 4 else 3
    val out = new Array[Byte](w * h * pch)
    var i = 0
    while (i < stored.length) {
      val idx = stored(i) & 0xff
      if (idx >= nEntries) return None
      out(i * pch) = palette(idx * 3)
      out(i * pch + 1) = palette(idx * 3 + 1)
      out(i * pch + 2) = palette(idx * 3 + 2)
      if (pch == 4)
        out(i * pch + 3) = if (idx < trns.length) trns(idx) else 0xff.toByte
      i += 1
    }
    Some(Decoded(w, h, pch, out))
  }
}
