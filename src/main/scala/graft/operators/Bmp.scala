package graft.operators

/** REAL BMP codec — the uncompressed member of the image-codec family
  * (format per the public Windows BITMAPINFOHEADER layout). No entropy
  * coding, but the layout quirks are real and each one is a decoder
  * bug waiting to happen: rows stored BOTTOM-UP (unless height is
  * negative: top-down), samples in BGR order, every row padded to a
  * 4-byte boundary, and the pixel array reached through an explicit
  * data-offset field (which may skip color tables or gap bytes).
  *
  * Subset: 24-bit uncompressed (BI_RGB) with a 40-byte info header —
  * the overwhelmingly common crawl BMP — plus (r10, pinned by the
  * CPython external fixture) 32-bit BI_BITFIELDS with contiguous
  * 8-bit channel masks (the RGBA form real encoders emit under
  * V4/V5 headers; a zero alpha mask decodes opaque RGB). Anything
  * else (other depths, RLE compression, non-byte masks, truncated
  * pixel data) → None, never a throw: the shared dirty-crawl-bytes
  * contract.
  *
  * Writer emits the shared pixel contract [[PngPixels.pix]] (3
  * channels), so BMP rows join the same analytic oracles as PNG/JPEG;
  * odd ids store TOP-DOWN (negative height) so both row orders are
  * always exercised. */
object Bmp {

  /** Full BMP whose decoded RGB pixels equal
    * [[PngPixels.pix]]`(id, x, y, c)`; `topDown` stores a negative
    * height with rows in raster order. */
  def bmpWithPixels(id: Long, w: Int, h: Int,
      topDown: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h < (1L << 24), s"w=$w h=$h")
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    bos.write('B'); bos.write('M')
    le32(14 + 40 + dataSize) // file size
    le32(0)                  // reserved
    le32(14 + 40)            // pixel-array offset
    le32(40)                 // BITMAPINFOHEADER
    le32(w)
    le32(if (topDown) -h else h)
    le16(1)                  // planes
    le16(24)                 // bits per pixel
    le32(0)                  // BI_RGB
    le32(dataSize)
    le32(2835); le32(2835)   // 72 dpi
    le32(0); le32(0)         // palette counts
    val pad = rowBytes - w * 3
    var r = 0
    while (r < h) {
      val y = if (topDown) r else h - 1 - r // storage row r = raster y
      var x = 0
      while (x < w) {
        // BGR on disk
        bos.write(PngPixels.pix(id, x, y, 2))
        bos.write(PngPixels.pix(id, x, y, 1))
        bos.write(PngPixels.pix(id, x, y, 0))
        x += 1
      }
      var p = 0
      while (p < pad) { bos.write(0); p += 1 }
      r += 1
    }
    bos.toByteArray
  }

  /** Full BMP around an arbitrary raster-order RGB buffer (length
    * w*h*3) — the general-purpose writer for tests and round trips;
    * [[bmpWithPixels]] stays the closed-contract fixture form. */
  def bmpFromRaster(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3, s"w=$w h=$h")
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    bos.write('B'); bos.write('M')
    le32(14 + 40 + dataSize)
    le32(0)
    le32(14 + 40)
    le32(40)
    le32(w)
    le32(h)
    le16(1)
    le16(24)
    le32(0)
    le32(dataSize)
    le32(2835); le32(2835)
    le32(0); le32(0)
    val pad = rowBytes - w * 3
    var r = 0
    while (r < h) {
      val y = h - 1 - r
      var x = 0
      while (x < w) {
        bos.write(rgb((y * w + x) * 3 + 2))
        bos.write(rgb((y * w + x) * 3 + 1))
        bos.write(rgb((y * w + x) * 3))
        x += 1
      }
      var p = 0
      while (p < pad) { bos.write(0); p += 1 }
      r += 1
    }
    bos.toByteArray
  }

  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  /** Real decode of the 24bpp subset; None on anything dirty. Output
    * is raster-order RGB (channels = 3), matching the other codecs. */
  def decode(bytes: Array[Byte]): Option[PngPixels.Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def decode0(b: Array[Byte]): Option[PngPixels.Decoded] = {
    if (!isBmp(b) || b.length < 54) return None
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val dataOffset = le32(10)
    val headerSize = le32(14)
    // 40-byte info header, or later versions sharing its prefix
    if (headerSize < 40) return None
    val w = le32(18)
    val rawH = le32(22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    if (w <= 0 || h <= 0) return None
    if (le16(26) != 1) return None
    val bpp = le16(28)
    val comp = le32(30)
    // untrusted dims: Long math + the shared decode cap
    if (w.toLong * h * 4 > PngPixels.MaxDecodedBytes) return None
    (bpp, comp) match {
      case (24, 0) => // classic BI_RGB 24bpp, BGR rows
        val rowBytes = (w * 3 + 3) / 4 * 4
        if (dataOffset < 14 + headerSize ||
          dataOffset.toLong + rowBytes.toLong * h > b.length) return None
        val out = new Array[Byte](w * h * 3)
        var r = 0
        while (r < h) {
          val y = if (topDown) r else h - 1 - r
          val src = dataOffset + r * rowBytes
          var x = 0
          while (x < w) {
            out((y * w + x) * 3) = b(src + x * 3 + 2)     // R
            out((y * w + x) * 3 + 1) = b(src + x * 3 + 1) // G
            out((y * w + x) * 3 + 2) = b(src + x * 3)     // B
            x += 1
          }
          r += 1
        }
        Some(PngPixels.Decoded(w, h, 3, out))
      case (32, 3) =>
        // 32bpp BI_BITFIELDS (the form real encoders emit for RGBA):
        // four LE32 channel masks follow the info header (or sit at
        // the V4 header's fixed offsets — same place, byte 54). Each
        // mask must be a contiguous 8-bit run for byte samples; the
        // alpha mask may be 0 (opaque). No row padding at 32bpp.
        // A 52-byte BITMAPV2INFOHEADER carries only the three color
        // masks — reading byte 66 there would land past the header
        // into gap/pixel data, so alpha is only read when the header
        // actually contains it (V3+, >= 56 bytes).
        val hasAlphaMask = headerSize >= 56
        if (headerSize < 52 ||
          b.length < (if (hasAlphaMask) 70 else 66)) return None
        val masks = Array(le32(54), le32(58), le32(62),
          if (hasAlphaMask) le32(66) else 0)
        def shiftOf(m: Int): Int = {
          if (m == 0) return -1
          val sh = java.lang.Integer.numberOfTrailingZeros(m)
          if ((m >>> sh) != 0xff) return -2 // not an 8-bit run
          sh
        }
        val sh = masks.map(shiftOf)
        if (sh.take(3).exists(_ < 0) || sh(3) == -2) return None
        val hasAlpha = sh(3) >= 0
        val ch = if (hasAlpha) 4 else 3
        if (dataOffset < 14 + headerSize ||
          dataOffset.toLong + 4L * w * h > b.length) return None
        val out = new Array[Byte](w * h * ch)
        var r = 0
        while (r < h) {
          val y = if (topDown) r else h - 1 - r
          val src = dataOffset + r * w * 4
          var x = 0
          while (x < w) {
            val v = le32(src + x * 4)
            out((y * w + x) * ch) = ((v >>> sh(0)) & 0xff).toByte
            out((y * w + x) * ch + 1) = ((v >>> sh(1)) & 0xff).toByte
            out((y * w + x) * ch + 2) = ((v >>> sh(2)) & 0xff).toByte
            if (hasAlpha)
              out((y * w + x) * ch + 3) = ((v >>> sh(3)) & 0xff).toByte
            x += 1
          }
          r += 1
        }
        Some(PngPixels.Decoded(w, h, ch, out))
      case _ => None
    }
  }
}
