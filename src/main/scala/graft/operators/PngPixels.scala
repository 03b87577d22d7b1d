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
  * unfiltering per the PNG spec (RFC 2083 §6). 8-bit depth, color
  * types 0 (grayscale) and 2 (truecolor), no interlace — the subset
  * the fixtures write; anything else → None, never an exception.
  *
  * Pixels follow the deterministic contract [[pix]] — a pure function
  * of (id, x, y, channel) — so a SQL oracle can re-derive exact pixel
  * statistics with no image library: the declared query proves
  * write→deflate→inflate→unfilter ends at the analytic form. */
object PngPixels {

  /** The pixel contract the oracle recomputes:
    * `(x*3 + y*5 + id*7 + c*11) mod 256`. */
  def pix(id: Long, x: Int, y: Int, c: Int): Int =
    math.floorMod(x * 3L + y * 5L + id * 7L + c * 11L, 256L).toInt

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

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Full PNG (signature, IHDR, IDAT, IEND — all real CRCs) whose
    * decoded pixels equal [[pix]]`(id, x, y, c)`. colorType 0 = 1
    * channel, 2 = 3 channels. */
  def pngWithPixels(id: Long, w: Int, h: Int, colorType: Int): Array[Byte] = {
    require(colorType == 0 || colorType == 2, s"colorType $colorType")
    val ch = if (colorType == 2) 3 else 1
    val stride = w * ch
    val raw = new java.io.ByteArrayOutputStream()
    val prior = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < h) {
      var i = 0
      while (i < stride) {
        cur(i) = pix(id, i / ch, y, i % ch)
        i += 1
      }
      val f = ((y + id) % 5).toInt
      raw.write(f)
      i = 0
      while (i < stride) {
        val a = if (i >= ch) cur(i - ch) else 0
        val b = prior(i)
        val c = if (i >= ch) prior(i - ch) else 0
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
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
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
    d.write(8); d.write(colorType); d.write(0); d.write(0); d.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Decoded 8-bit pixels, scanline-major, `channels` bytes per pixel. */
  final case class Decoded(
      width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Real decode of the supported subset; None on anything dirty:
    * wrong signature, CRC mismatch, unsupported depth/type/interlace,
    * truncated or corrupt deflate stream, short pixel data. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def decode0(bytes: Array[Byte]): Option[Decoded] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    if (bytes.length < 8 || !bytes.take(8).sameElements(sig)) return None
    var pos = 8
    var w = 0; var h = 0; var colorType = -1
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
          val interlace = bytes(pos + 20) & 0xff
          if (depth != 8 || (colorType != 0 && colorType != 2) ||
            interlace != 0 || w <= 0 || h <= 0) return None
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    if (colorType < 0 || idat.size == 0) return None
    val ch = if (colorType == 2) 3 else 1
    // untrusted dims: size the buffers in Long and cap BEFORE allocating
    if ((w.toLong * ch + 1L) * h > MaxDecodedBytes) return None
    val stride = w * ch
    val expected = (stride + 1) * h
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val filtered = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inflater.finished()) {
      val got = inflater.inflate(filtered, off, expected - off)
      if (got == 0 && inflater.needsInput()) return None // truncated
      off += got
    }
    inflater.end()
    if (off != expected) return None
    val pixels = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = filtered((stride + 1) * y) & 0xff
      if (f > 4) return None
      val rowOff = (stride + 1) * y + 1
      val outOff = stride * y
      var i = 0
      while (i < stride) {
        val x = filtered(rowOff + i) & 0xff
        val a = if (i >= ch) pixels(outOff + i - ch) & 0xff else 0
        val b = if (y > 0) pixels(outOff - stride + i) & 0xff else 0
        val c = if (y > 0 && i >= ch) pixels(outOff - stride + i - ch) & 0xff
          else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
        }
        pixels(outOff + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(Decoded(w, h, ch, pixels))
  }
}
