package graft.operators

/** TIFF 6.0 IFD machinery — one real directory walk serving two crawl
  * surfaces:
  *
  *  - standalone TIFF files (scans, archival imagery): width/height/
  *    channels metadata from IFD0, plus REAL pixel decode of the
  *    8-bit baseline subset ([[decodePixels]]: none/PackBits/LZW/
  *    deflate strips + the horizontal predictor; JPEG-in-TIFF stays
  *    the codec seam);
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

    /** SHORT/LONG value list: inline when it fits the 4-byte value
      * field, else at the pointed-to offset. */
    def values(entry: (Int, Long, Int)): Option[Array[Long]] =
      entry match {
        case (typ, count, v) if (typ == 3 || typ == 4) &&
            count >= 1 && count <= 65536 =>
          val sz = if (typ == 3) 2 else 4
          val off =
            if (count * sz <= 4) v.toLong else base + u32(v)
          if (off < 0 || off + count * sz > b.length) None
          else Some(Array.tabulate(count.toInt) { i =>
            if (typ == 3) u16((off + 2L * i).toInt).toLong
            else u32((off + 4L * i).toInt)
          })
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

  /** REAL pixel decode of the lib-free TIFF 6.0 subset: 8-bit
    * grayscale (PhotometricInterpretation 0 — WhiteIsZero, inverted
    * on decode — and 1) and 8-bit chunky RGB (photometric 2,
    * PlanarConfiguration 1); Compression 1 (none), 32773 (PackBits),
    * 5 (LZW with the spec's early-change widths), 8/32946 (zlib
    * deflate via the JDK Inflater); Predictor 2 (horizontal
    * differencing) undone per row/channel; multi-strip via
    * StripOffsets/StripByteCounts/RowsPerStrip, both byte orders.
    * Out of subset (JPEG-in-TIFF payloads, planar, palette, sub-byte
    * depths) → None — the remaining seam. Validator stance: any
    * bound violation (strip overrun, short LZW/PackBits/deflate
    * stream, trailing garbage, count mismatch) fails the FILE. */
  def decodePixels(b: Array[Byte]): Option[PngPixels.Decoded] = {
    try {
      if (b == null) return None
      val le = order(b, 0).getOrElse(return None)
      val r = new Reader(b, 0, le)
      if (r.u16(2) != 42) return None
      val entries = r.ifdEntries(r.u32(4))
      def num(tag: Int): Option[Long] = entries.get(tag).flatMap(r.numeric)
      def arr(tag: Int): Option[Array[Long]] =
        entries.get(tag).flatMap(r.values)
      val w = num(256).getOrElse(return None)
      val h = num(257).getOrElse(return None)
      if (w <= 0 || h <= 0 || w > (1L << 20) || h > (1L << 20) ||
        w * h > (1L << 26)) return None
      val spp = num(277).getOrElse(1L).toInt
      val photometric = num(262).getOrElse(return None)
      val compression = num(259).getOrElse(1L)
      val okSpp = photometric match {
        case 0 | 1 => spp == 1
        case 2 =>
          // RGB, or (r10, pinned by the CPython external fixture)
          // RGBA when an ExtraSamples tag declares the 4th channel
          // (8-bit chunky; alpha under JPEG strips stays out of
          // subset — baseline JPEG has no 4th component to carry it)
          spp == 3 || (spp == 4 && compression != 7L &&
            arr(338).exists(_.length == 1))
        case 6 => // YCbCr: only as the color space of JPEG strips
          compression == 7L && spp == 3
        case _ => false // palette/other: out of subset
      }
      if (!okSpp) return None
      val bits = arr(258).getOrElse(Array.fill(spp)(1L))
      // the r10 EXTENDED layouts — tiled organization (tags 322-325),
      // planar configuration 2, 16-bit samples — take the segmented
      // path; the classic chunky 8-bit strip path below is untouched
      if (entries.contains(322) || num(284).getOrElse(1L) == 2L ||
        (bits.nonEmpty && bits.forall(_ == 16L)) || compression == 4L)
        return decodeSegmented(b, r, entries)
      if (bits.length != spp || bits.exists(_ != 8L)) return None
      if (num(284).getOrElse(1L) != 1L) return None // chunky only
      if (compression != 1L && compression != 32773L &&
        compression != 5L && compression != 7L && compression != 8L &&
        compression != 32946L) return None
      val predictor = num(317).getOrElse(1L)
      if (predictor != 1L && predictor != 2L) return None
      if (compression == 7L && predictor != 1L) return None
      val offsets = arr(273).getOrElse(return None)
      val counts = arr(279).getOrElse(return None)
      if (offsets.length != counts.length || offsets.isEmpty) return None
      val rowsPerStrip = num(278).getOrElse(h) min h
      if (rowsPerStrip <= 0) return None
      val nStrips = ((h + rowsPerStrip - 1) / rowsPerStrip).toInt
      if (offsets.length != nStrips) return None
      val rowBytes = (w * spp).toInt
      val out = new Array[Byte]((w * h).toInt * spp)
      var strip = 0
      var outPos = 0
      while (strip < nStrips) {
        val rowsHere = (math.min(rowsPerStrip * (strip + 1), h) -
          rowsPerStrip * strip).toInt
        val want = rowsHere * rowBytes
        val so = offsets(strip)
        val sc = counts(strip)
        if (so < 0 || sc < 0 || so + sc > b.length) return None
        if (compression == 1L) {
          if (sc != want) return None
          System.arraycopy(b, so.toInt, out, outPos, want)
        } else if (compression == 7L) {
          // new-style JPEG-in-TIFF: each strip is a standalone
          // interchange JPEG stream — the full baseline decoder runs
          // per strip (the JPEGTables abbreviated form is out of
          // subset and fails the geometry check below)
          val slice = java.util.Arrays.copyOfRange(
            b, so.toInt, (so + sc).toInt)
          val d = JpegDc.decode(slice).getOrElse(return None)
          if (d.width != w.toInt || d.height != rowsHere ||
            d.channels != spp) return None
          System.arraycopy(d.pixels, 0, out, outPos, want)
        } else if (compression == 5L) { // LZW
          val d = lzwDecode(b, so.toInt, (so + sc).toInt, want)
            .getOrElse(return None)
          System.arraycopy(d, 0, out, outPos, want)
        } else if (compression == 8L || compression == 32946L) {
          // (Adobe) deflate: a zlib stream per strip
          val inf = new java.util.zip.Inflater()
          try {
            inf.setInput(b, so.toInt, sc.toInt)
            var produced = 0
            while (produced < want && !inf.finished()) {
              val n = inf.inflate(out, outPos + produced, want - produced)
              if (n == 0 && inf.needsInput()) return None // short stream
              produced += n
            }
            if (produced != want) return None
            // trailing data after the declared bytes fails the file
            if (!inf.finished() &&
              inf.inflate(new Array[Byte](1)) > 0) return None
          } finally inf.end()
        } else {
          // PackBits: n in [0,127] copies n+1 literals, n in
          // [-127,-1] repeats the next byte 1-n times, -128 is a noop
          var ip = so.toInt
          val end = (so + sc).toInt
          var produced = 0
          while (produced < want) {
            if (ip >= end) return None
            val n = b(ip); ip += 1
            if (n >= 0) {
              val len = n + 1
              if (ip + len > end || produced + len > want) return None
              System.arraycopy(b, ip, out, outPos + produced, len)
              ip += len; produced += len
            } else if (n != -128) {
              val len = 1 - n
              if (ip >= end || produced + len > want) return None
              java.util.Arrays.fill(out, outPos + produced,
                outPos + produced + len, b(ip))
              ip += 1; produced += len
            }
          }
          if (ip != end) return None // trailing garbage fails the file
        }
        if (predictor == 2L) {
          // horizontal differencing: undo per row, per channel
          var row = 0
          while (row < rowsHere) {
            val base = outPos + row * rowBytes
            var x = spp
            while (x < rowBytes) {
              out(base + x) = (out(base + x) + out(base + x - spp)).toByte
              x += 1
            }
            row += 1
          }
        }
        outPos += want
        strip += 1
      }
      if (photometric == 0L) { // WhiteIsZero: invert to intensity
        var i = 0
        while (i < out.length) { out(i) = (~out(i)).toByte; i += 1 }
      }
      Some(PngPixels.Decoded(w.toInt, h.toInt, spp, out))
    } catch { case _: Exception => None }
  }

  /** (r10) CCITT Group 4 (ITU-T T.6 MMR) decode — the scanned-document
    * compression (TIFF Compression 4): pure two-dimensional coding
    * against a reference line that starts all-white per segment, with
    * Vertical(±3)/Horizontal/Pass modes and the T.4 run-length codes
    * ([[graft.functions.T4Tables]], extracted from libtiff so the
    * arbitrary Huffman assignments are transcription-error-proofed).
    * Returns one byte per pixel (0 = white bit, 1 = black bit) for
    * `h` rows, or None on any desync/overrun — MMR has no per-row
    * resync, so the validator stance is all-or-nothing. */
  private object G4 {
    private def trie(codes: Seq[(String, Int)]): Map[(Int, Int), Int] =
      codes.map { case (bits, run) =>
        (bits.length, Integer.parseInt(bits, 2)) -> run
      }.toMap
    private val white = trie(graft.functions.T4Tables.White)
    private val black = trie(graft.functions.T4Tables.Black)
    // mode codes (T.6 §2.2.4): value by tree — V0, VR/VL 1-3, H, P
    private val modes: Map[(Int, Int), Int] = Map(
      (1, 1) -> 0, // V0
      (3, 3) -> 1, (3, 2) -> -1, // VR1 / VL1
      (3, 1) -> 9, // H
      (4, 1) -> 8, // P
      (6, 3) -> 2, (6, 2) -> -2, // VR2 / VL2
      (7, 3) -> 3, (7, 2) -> -3) // VR3 / VL3

    def decode(b: Array[Byte], off: Int, end: Int, w: Int, h: Int)
        : Option[Array[Byte]] = {
      val out = new Array[Byte](w * h)
      var bitPos = off.toLong * 8
      val bitEnd = end.toLong * 8
      def readBit(): Int = {
        if (bitPos >= bitEnd) return -1
        val v = (b((bitPos >> 3).toInt) >> (7 - (bitPos & 7).toInt)) & 1
        bitPos += 1
        v
      }
      def readCode(tab: Map[(Int, Int), Int], maxLen: Int): Int = {
        var acc = 0; var len = 0
        while (len < maxLen) {
          val bit = readBit()
          if (bit < 0) return Int.MinValue
          acc = (acc << 1) | bit; len += 1
          tab.get((len, acc)) match {
            case Some(v) => return v
            case None => ()
          }
        }
        Int.MinValue
      }
      def readRun(isWhite: Boolean): Int = {
        var total = 0
        while (true) {
          val r = readCode(if (isWhite) white else black, 13)
          if (r == Int.MinValue) return -1
          total += r
          if (r < 64) return total // terminating code ends the run
        }
        -1
      }
      val ref = new Array[Byte](w) // previous row (all-white start)
      val cur = new Array[Byte](w)
      var row = 0
      while (row < h) {
        java.util.Arrays.fill(cur, 0.toByte)
        var a0 = -1
        var color = 0 // 0 white, 1 black
        while (a0 < w) {
          // b1: first changing element on ref right of a0 with colour
          // opposite the coding colour; b2: the next one after b1
          var b1 = a0 + 1
          if (b1 < 0) b1 = 0
          while (b1 < w && !(refChanges(ref, b1) &&
            (ref(b1) & 1) != color)) b1 += 1
          var b2 = b1 + 1
          while (b2 < w && !refChanges(ref, b2)) b2 += 1
          val m = readCode(modes, 7)
          if (m == Int.MinValue) return None
          val s = math.max(a0, 0)
          if (m == 8) { // pass: current colour extends past b2
            if (b2 > w) return None
            java.util.Arrays.fill(cur, s, b2, color.toByte)
            a0 = b2
          } else if (m == 9) { // horizontal: two explicit runs
            val r1 = readRun(color == 0)
            if (r1 < 0) return None
            val r2 = readRun(color == 1)
            if (r2 < 0) return None
            if (s + r1 + r2 > w) return None
            java.util.Arrays.fill(cur, s, s + r1, color.toByte)
            java.util.Arrays.fill(cur, s + r1, s + r1 + r2,
              (1 - color).toByte)
            a0 = s + r1 + r2
          } else { // vertical: a1 = b1 + m, colour flips
            val a1 = b1 + m
            if (a1 < s || a1 > w) return None
            java.util.Arrays.fill(cur, s, a1, color.toByte)
            color = 1 - color
            a0 = a1
          }
        }
        if (a0 != w) return None
        System.arraycopy(cur, 0, out, row * w, w)
        System.arraycopy(cur, 0, ref, 0, w)
        row += 1
      }
      Some(out)
    }

    /** Is `i` a changing element of `row` (differs from its left
      * neighbor; position 0 changes iff non-white — the imaginary
      * left pixel is white)? */
    @inline private def refChanges(row: Array[Byte], i: Int): Boolean =
      if (i == 0) row(0) != 0 else row(i) != row(i - 1)
  }

  /** (r10) The SEGMENTED layout grammar — the archival variants the
    * classic strip path leaves out, decoded through one segment
    * abstraction: TILED organization (tags 322–325, tiles padded to
    * the tile grid and cropped on placement; tile dims must be
    * multiples of 16 per TIFF 6.0 §15), PlanarConfiguration 2 (one
    * plane per segment run, segments ordered plane-major), and 16-bit
    * samples (file byte order; exposed exactly via [[decodePixels16]],
    * reduced to the high byte for the 8-bit [[PngPixels.Decoded]]
    * view — the standard display reduction, documented). Compressions
    * none/PackBits/LZW/deflate; Predictor 2 differences SAMPLES (not
    * bytes) per row per channel at either depth. Same validator
    * stance as the strip path: any bound violation fails the file. */
  private def decodeSegmented(
      b: Array[Byte], r: Reader, entries: Map[Int, (Int, Long, Int)])
      : Option[PngPixels.Decoded] = {
    decodeSamples(b, r, entries).map { case (w, h, spp, bps, samples) =>
      val out = new Array[Byte](w * h * spp)
      var i = 0
      while (i < out.length) {
        out(i) = (if (bps == 16) samples(i) >> 8 else samples(i)).toByte
        i += 1
      }
      PngPixels.Decoded(w, h, spp, out)
    }
  }

  /** Exact sample decode of the segmented grammar:
    * (w, h, spp, bitsPerSample, samples chunky row-major). */
  def decodePixels16(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Array[Int])] = {
    try {
      if (bytes == null) return None
      val le = order(bytes, 0).getOrElse(return None)
      val r = new Reader(bytes, 0, le)
      if (r.u16(2) != 42) return None
      decodeSamples(bytes, r, r.ifdEntries(r.u32(4)))
    } catch { case _: Exception => None }
  }

  private def decodeSamples(
      b: Array[Byte], r: Reader, entries: Map[Int, (Int, Long, Int)])
      : Option[(Int, Int, Int, Int, Array[Int])] = {
    try {
      def num(tag: Int): Option[Long] = entries.get(tag).flatMap(r.numeric)
      def arr(tag: Int): Option[Array[Long]] =
        entries.get(tag).flatMap(r.values)
      val w = num(256).getOrElse(return None).toInt
      val h = num(257).getOrElse(return None).toInt
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
        w.toLong * h > (1L << 26)) return None
      val spp = num(277).getOrElse(1L).toInt
      val photometric = num(262).getOrElse(return None)
      val okSpp = photometric match {
        case 0 | 1 => spp == 1
        case 2 => spp == 3 || (spp == 4 && arr(338).exists(_.length == 1))
        case _ => false
      }
      if (!okSpp) return None
      val compression = num(259).getOrElse(1L)
      val bits = arr(258).getOrElse(Array.fill(spp)(8L))
      val g4 = compression == 4L
      // G4 is the bilevel fax codec: 1 bit/sample, one component
      if (g4 && !(spp == 1 && bits.forall(_ == 1L) &&
        (photometric == 0L || photometric == 1L))) return None
      if (!g4 && (bits.length != spp ||
        !(bits.forall(_ == 8L) || bits.forall(_ == 16L)))) return None
      val bps = if (g4) 8 else bits.head.toInt // bilevel expands to 0/255
      if (compression != 1L && compression != 32773L &&
        compression != 4L && compression != 5L && compression != 8L &&
        compression != 32946L) return None
      val predictor = num(317).getOrElse(1L)
      if (predictor != 1L && predictor != 2L) return None
      if (g4 && predictor != 1L) return None
      val planar = num(284).getOrElse(1L)
      if (planar != 1L && planar != 2L) return None
      val tiled = entries.contains(322)
      // strips and tiles must not coexist (TIFF 6.0)
      if (tiled && entries.contains(273)) return None

      val nPlanes = if (planar == 2L) spp else 1
      val sppSeg = if (planar == 2L) 1 else spp
      // segment grid
      val (segW, segH, across, down) = if (tiled) {
        val tw = num(322).getOrElse(return None).toInt
        val th = num(323).getOrElse(return None).toInt
        if (tw <= 0 || th <= 0 || tw % 16 != 0 || th % 16 != 0) return None
        (tw, th, (w + tw - 1) / tw, (h + th - 1) / th)
      } else {
        val rps = math.min(num(278).getOrElse(h.toLong), h.toLong).toInt
        if (rps <= 0) return None
        (w, rps, 1, (h + rps - 1) / rps)
      }
      val segsPerPlane = across * down
      val offsets = arr(if (tiled) 324 else 273).getOrElse(return None)
      val counts = arr(if (tiled) 325 else 279).getOrElse(return None)
      if (offsets.length != counts.length ||
        offsets.length != segsPerPlane * nPlanes) return None

      val out = new Array[Int](w * h * spp)
      val bytesPerSample = bps / 8
      var seg = 0
      while (seg < offsets.length) {
        val plane = seg / segsPerPlane
        val gi = seg % segsPerPlane
        val tx = gi % across
        val ty = gi / across
        // tiles are PADDED to the grid; strips carry exact rows
        val rowsHere =
          if (tiled) segH
          else (math.min(segH.toLong * (ty + 1), h.toLong) -
            segH.toLong * ty).toInt
        val rowSamples = segW * sppSeg
        val want = rowsHere * rowSamples * bytesPerSample
        val so = offsets(seg); val sc = counts(seg)
        if (so < 0 || sc < 0 || so + sc > b.length) return None
        if (g4) {
          // T.6 MMR: decodes straight to one BIT per pixel; expand to
          // the 0/255 sample convention (photometric handling below)
          val bitsOut = G4.decode(b, so.toInt, (so + sc).toInt,
            segW, rowsHere).getOrElse(return None)
          val x0 = tx * segW; val y0 = ty * segH
          var row0 = 0
          while (row0 < rowsHere) {
            val y = y0 + row0
            if (y < h) {
              var sx = 0
              while (sx < segW) {
                if (x0 + sx < w)
                  out((y * w + x0 + sx) * spp) =
                    (bitsOut(row0 * segW + sx) & 1) * 255
                sx += 1
              }
            }
            row0 += 1
          }
          seg += 1
        } else {
        val raw = new Array[Byte](want)
        if (compression == 1L) {
          if (sc != want) return None
          System.arraycopy(b, so.toInt, raw, 0, want)
        } else if (compression == 5L) {
          val d = lzwDecode(b, so.toInt, (so + sc).toInt, want)
            .getOrElse(return None)
          System.arraycopy(d, 0, raw, 0, want)
        } else if (compression == 8L || compression == 32946L) {
          val inf = new java.util.zip.Inflater()
          try {
            inf.setInput(b, so.toInt, sc.toInt)
            var produced = 0
            while (produced < want && !inf.finished()) {
              val n = inf.inflate(raw, produced, want - produced)
              if (n == 0 && inf.needsInput()) return None
              produced += n
            }
            if (produced != want) return None
            if (!inf.finished() &&
              inf.inflate(new Array[Byte](1)) > 0) return None
          } finally inf.end()
        } else { // PackBits
          var ip = so.toInt
          val end = (so + sc).toInt
          var produced = 0
          while (produced < want) {
            if (ip >= end) return None
            val n = b(ip); ip += 1
            if (n >= 0) {
              val len = n + 1
              if (ip + len > end || produced + len > want) return None
              System.arraycopy(b, ip, raw, produced, len)
              ip += len; produced += len
            } else if (n != -128) {
              val len = 1 - n
              if (ip >= end || produced + len > want) return None
              java.util.Arrays.fill(raw, produced, produced + len, b(ip))
              ip += 1; produced += len
            }
          }
          if (ip != end) return None
        }
        // bytes -> samples (file byte order at 16-bit)
        val le = b(0) == 'I'
        val samples = new Array[Int](rowsHere * rowSamples)
        var i = 0
        while (i < samples.length) {
          samples(i) =
            if (bps == 8) raw(i) & 0xff
            else if (le) (raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)
            else ((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)
          i += 1
        }
        if (predictor == 2L) {
          val mask = if (bps == 8) 0xff else 0xffff
          var row = 0
          while (row < rowsHere) {
            val base = row * rowSamples
            var x = sppSeg
            while (x < rowSamples) {
              samples(base + x) =
                (samples(base + x) + samples(base + x - sppSeg)) & mask
              x += 1
            }
            row += 1
          }
        }
        // place (cropping padded tile edges)
        val x0 = tx * segW
        val y0 = ty * segH
        var row = 0
        while (row < rowsHere) {
          val y = y0 + row
          if (y < h) {
            var sx = 0
            while (sx < segW) {
              val x = x0 + sx
              if (x < w) {
                var c = 0
                while (c < sppSeg) {
                  val ch = if (planar == 2L) plane else c
                  out((y * w + x) * spp + ch) =
                    samples(row * rowSamples + sx * sppSeg + c)
                  c += 1
                }
              }
              sx += 1
            }
          }
          row += 1
        }
        seg += 1
        }
      }
      if (photometric == 0L) { // WhiteIsZero: invert to intensity
        val maxV = if (bps == 8) 255 else 65535
        var i = 0
        while (i < out.length) { out(i) = maxV - out(i); i += 1 }
      }
      Some((w, h, spp, bps, out))
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

  /** TIFF-LZW decode (TIFF 6.0 §13): MSB-first codes, ClearCode 256,
    * EOI 257, 9→12-bit widths with the spec's EARLY CHANGE (the width
    * bumps one code sooner than generic LZW: at table sizes 510/1022/
    * 2046). `want` bounds the output; any violation fails the strip. */
  private def lzwDecode(b: Array[Byte], off: Int, end: Int,
      want: Int): Option[Array[Byte]] = {
    val Clear = 256
    val Eoi = 257
    val out = new Array[Byte](want)
    var produced = 0
    // string table as (prefix code, suffix byte); 258.. are dynamic
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = off.toLong * 8
    val bitEnd = end.toLong * 8
    def read(): Int = {
      if (bitPos + width > bitEnd) return -1
      var v = 0
      var i = 0
      while (i < width) {
        val bp = bitPos + i
        v = (v << 1) | ((b((bp >> 3).toInt) >> (7 - (bp & 7).toInt)) & 1)
        i += 1
      }
      bitPos += width
      v
    }
    def emit(code: Int): Boolean = { // writes the code's string; false = bad
      var c = code
      var len = 0
      while (c >= 258) { c = prefix(c); len += 1; if (len > 4096) return false }
      len += 1
      if (produced + len > want) return false
      var pos = produced + len - 1
      c = code
      while (c >= 258) { out(pos) = suffix(c); pos -= 1; c = prefix(c) }
      out(pos) = c.toByte
      produced += len
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None // ran out before EOI
      if (code == Clear) {
        next = 258; width = 9; prev = -1
      } else if (code == Eoi) {
        done = true
      } else if (prev == -1) {
        if (code > 255) return None // first code after clear must be literal
        if (produced >= want) return None
        out(produced) = code.toByte; produced += 1
        prev = code
      } else {
        if (code > next) return None
        if (code == next) { // the KwK case
          if (next >= 4096) return None
          prefix(next) = prev; suffix(next) = firstByte(prev)
          next += 1
          if (!emit(code)) return None
        } else {
          if (next >= 4096) return None
          prefix(next) = prev; suffix(next) = firstByte(code)
          next += 1
          if (!emit(code)) return None
        }
        prev = code
        // EARLY CHANGE: bump when the NEXT code to assign is one
        // short of the width's ceiling
        if (next == 510 && width == 9) width = 10
        else if (next == 1022 && width == 10) width = 11
        else if (next == 2046 && width == 11) width = 12
      }
    }
    if (produced != want) None else Some(out)
  }

  /** TIFF-LZW encode — the writer side of [[lzwDecode]], emitting the
    * spec's early-change widths so a conformant reader round-trips. */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var curBits = 0
    var width = 9
    def put(code: Int): Unit = {
      cur = (cur << width) | code
      curBits += width
      while (curBits >= 8) {
        out.write((cur >> (curBits - 8)) & 0xff)
        curBits -= 8
      }
      cur &= (1 << curBits) - 1
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var next = 258
    put(Clear)
    var i = 0
    var prev = -1
    while (i < data.length) {
      val byte = data(i) & 0xff
      if (prev == -1) prev = byte
      else {
        val key = (prev.toLong << 8) | byte
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          dict.put(key, Integer.valueOf(next))
          next += 1
          // encoder's early change: width grows when the next code to
          // ASSIGN reaches the width ceiling minus one
          if (next == 511 && width == 9) width = 10
          else if (next == 1023 && width == 10) width = 11
          else if (next == 2047 && width == 11) width = 12
          else if (next == 4095) { // table nearly full: reset
            put(Clear)
            dict.clear()
            next = 258
            width = 9
          }
          prev = byte
        }
      }
      i += 1
    }
    if (prev != -1) put(prev)
    put(Eoi)
    if (curBits > 0) out.write((cur << (8 - curBits)) & 0xff)
    out.toByteArray
  }

  /** PackBits-encode one row (real run detection: runs >= 3 become
    * repeat packets, the rest literal packets, both capped at 128). */
  def packBits(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < row.length) {
      var run = 1
      while (i + run < row.length && run < 128 &&
        row(i + run) == row(i)) run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(row(i))
        i += run
      } else {
        var j = i
        while (j < row.length && j - i < 128 &&
          !(j + 2 < row.length && row(j) == row(j + 1) &&
            row(j) == row(j + 2))) j += 1
        out.write(j - i - 1)
        out.write(row, i, j - i)
        i = j
      }
    }
    out.toByteArray
  }

  /** A FULLY decodable TIFF with closed-form pixels
    * `(7x + 13y + 29c + 31·seed) % 256` — gray (photometric 1),
    * inverted-storage gray (photometric 0: the file stores 255−v so
    * decode must invert back to the same closed form), or chunky RGB
    * (photometric 2, spp 3); `compression` 1 / 32773 (PackBits per
    * row) / 5 (LZW) / 8 (deflate), optional horizontal-differencing
    * `predictor`; strips of `rowsPerStrip` rows; both byte orders.
    * Every variant is byte-exact, so ONE analytic oracle replays the
    * pixel sum with no TIFF machinery. */
  def tiffWithPixels(seed: Long, w: Int, h: Int, photometric: Int,
      compression: Int, rowsPerStrip: Int, littleEndian: Boolean,
      predictor: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0 && rowsPerStrip > 0)
    require(Seq(1, 32773, 5, 8).contains(compression))
    require(predictor == 1 || predictor == 2)
    val spp = if (photometric == 2) 3 else 1
    def px(x: Int, y: Int, c: Int): Int =
      (((7L * x + 13L * y + 29L * c + 31L * seed) % 256L) + 256L)
        .toInt % 256
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val raw = new java.io.ByteArrayOutputStream()
      val y0 = s * rowsPerStrip
      val y1 = math.min(y0 + rowsPerStrip, h)
      val perRow = new java.io.ByteArrayOutputStream() // PackBits form
      for (y <- y0 until y1) {
        val row = new Array[Byte](w * spp)
        for (x <- 0 until w; c <- 0 until spp) {
          val v = px(x, y, c)
          row(x * spp + c) =
            (if (photometric == 0) 255 - v else v).toByte
        }
        if (predictor == 2) { // difference right-to-left
          var x = row.length - 1
          while (x >= spp) {
            row(x) = (row(x) - row(x - spp)).toByte
            x -= 1
          }
        }
        raw.write(row, 0, row.length)
        if (compression == 32773) perRow.write(packBits(row))
      }
      compression match {
        case 1 => raw.toByteArray
        case 32773 => perRow.toByteArray
        case 5 => lzwEncode(raw.toByteArray)
        case _ => // zlib deflate
          val defl = new java.util.zip.Deflater()
          try {
            defl.setInput(raw.toByteArray); defl.finish()
            val bb = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](4096)
            while (!defl.finished())
              bb.write(buf, 0, defl.deflate(buf))
            bb.toByteArray
          } finally defl.end()
      }
    }
    tiffContainer(w, h, spp, photometric, compression, rowsPerStrip,
      littleEndian, predictor, strips)
  }

  /** (r10) Fixture writer for the SEGMENTED grammar: tiled and/or
    * planar and/or 16-bit variants of the same [[tiffWithPixels]]
    * pixel contract — decoded sample `(x,y,c)` equals
    * `px(x,y,c) * (bps==16 ? 257 : 1)` where `px` is the affine-mod
    * contract, so the 8-bit high-byte view equals the classic
    * contract EXACTLY and one analytic oracle family covers every
    * variant. Tile dims must be multiples of 16 (spec); tile padding
    * bytes are zero (decoder crops them). */
  def tiffWithPixelsExt(seed: Long, w: Int, h: Int, photometric: Int,
      compression: Int, littleEndian: Boolean, predictor: Int,
      bps: Int, planar: Int, tile: Option[(Int, Int)],
      rowsPerStrip: Int): Array[Byte] = {
    require(w > 0 && h > 0 && (bps == 8 || bps == 16))
    require(Seq(1, 32773, 5, 8).contains(compression))
    require(planar == 1 || planar == 2)
    require(predictor == 1 || predictor == 2)
    val spp = if (photometric == 2) 3 else 1
    def px(x: Int, y: Int, c: Int): Int =
      (((7L * x + 13L * y + 29L * c + 31L * seed) % 256L) + 256L)
        .toInt % 256
    def sample(x: Int, y: Int, c: Int): Int = {
      val v = px(x, y, c)
      val s = if (photometric == 0) 255 - v else v
      if (bps == 16) s * 257 else s
    }
    val (segW, segH, across, down) = tile match {
      case Some((tw, th)) =>
        require(tw % 16 == 0 && th % 16 == 0)
        (tw, th, (w + tw - 1) / tw, (h + th - 1) / th)
      case None =>
        (w, rowsPerStrip, 1, (h + rowsPerStrip - 1) / rowsPerStrip)
    }
    val nPlanes = if (planar == 2) spp else 1
    val sppSeg = if (planar == 2) 1 else spp
    val segs = for {
      plane <- 0 until nPlanes
      ty <- 0 until down
      tx <- 0 until across
    } yield {
      val rowsHere = if (tile.isDefined) segH
        else math.min(segH * (ty + 1), h) - segH * ty
      val rowSamples = segW * sppSeg
      val samples = new Array[Int](rowsHere * rowSamples)
      for (row <- 0 until rowsHere; sx <- 0 until segW; c <- 0 until sppSeg) {
        val x = tx * segW + sx
        val y = ty * segH + row
        val ch = if (planar == 2) plane else c
        samples(row * rowSamples + sx * sppSeg + c) =
          if (x < w && y < h) sample(x, y, ch) else 0
      }
      if (predictor == 2) {
        val mask = if (bps == 8) 0xff else 0xffff
        for (row <- 0 until rowsHere) {
          val base = row * rowSamples
          var x = rowSamples - 1
          while (x >= sppSeg) {
            samples(base + x) =
              (samples(base + x) - samples(base + x - sppSeg)) & mask
            x -= 1
          }
        }
      }
      val raw = new Array[Byte](samples.length * (bps / 8))
      var i = 0
      while (i < samples.length) {
        if (bps == 8) raw(i) = samples(i).toByte
        else if (littleEndian) {
          raw(2 * i) = (samples(i) & 0xff).toByte
          raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        } else {
          raw(2 * i) = ((samples(i) >> 8) & 0xff).toByte
          raw(2 * i + 1) = (samples(i) & 0xff).toByte
        }
        i += 1
      }
      compression match {
        case 1 => raw
        case 32773 =>
          // PackBits per ROW (byte rows) like the strip writer
          val bb = new java.io.ByteArrayOutputStream()
          val rowBytes = segW * sppSeg * (bps / 8)
          for (row <- 0 until rowsHere)
            bb.write(packBits(
              java.util.Arrays.copyOfRange(raw, row * rowBytes,
                (row + 1) * rowBytes)))
          bb.toByteArray
        case 5 => lzwEncode(raw)
        case _ =>
          val defl = new java.util.zip.Deflater()
          try {
            defl.setInput(raw); defl.finish()
            val bb = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](4096)
            while (!defl.finished()) bb.write(buf, 0, defl.deflate(buf))
            bb.toByteArray
          } finally defl.end()
      }
    }
    // ---- container with the extended tags --------------------------
    val nSegs = segs.length
    val bos = new java.io.ByteArrayOutputStream()
    def w16v(v: Int): Unit =
      if (littleEndian) { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      else { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def w32v(v: Long): Unit =
      if (littleEndian) {
        bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
        bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
      } else {
        bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
        bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
      }
    val tiled = tile.isDefined
    var nTags = 9 // 256,257,258,259,262,277,284 + loc(2 tags)
    if (tiled) nTags += 2 // 322,323 (324/325 counted in loc)
    else nTags += 1 // 278
    if (predictor == 2) nTags += 1
    val ifdBytes = 2 + 12 * nTags + 4
    var cursor = 8L + ifdBytes
    val bitsOff = cursor
    if (spp > 1) cursor += 2L * spp
    val needArrays = nSegs > 1
    val offsetsOff = cursor
    if (needArrays) cursor += 4L * nSegs
    val countsOff = cursor
    if (needArrays) cursor += 4L * nSegs
    val segOffs = segs.scanLeft(cursor)((acc, st) => acc + st.length)
    bos.write(if (littleEndian) 'I' else 'M')
    bos.write(if (littleEndian) 'I' else 'M')
    w16v(42); w32v(8)
    def tagE(t: Int, typ: Int, count: Long, value: Long): Unit = {
      w16v(t); w16v(typ); w32v(count)
      if (typ == 3 && count == 1) { w16v(value.toInt); w16v(0) }
      else w32v(value)
    }
    w16v(nTags)
    tagE(256, 4, 1, w.toLong)
    tagE(257, 4, 1, h.toLong)
    if (spp > 1) tagE(258, 3, spp.toLong, bitsOff)
    else tagE(258, 3, 1, bps.toLong)
    tagE(259, 3, 1, compression.toLong)
    tagE(262, 3, 1, photometric.toLong)
    if (!tiled) tagE(273, 4, nSegs.toLong,
      if (needArrays) offsetsOff else segOffs(0))
    tagE(277, 3, 1, spp.toLong)
    if (!tiled) {
      tagE(278, 4, 1, segH.toLong)
      tagE(279, 4, nSegs.toLong,
        if (needArrays) countsOff else segs(0).length.toLong)
    }
    tagE(284, 3, 1, planar.toLong)
    if (predictor == 2) tagE(317, 3, 1, 2)
    if (tiled) {
      tagE(322, 4, 1, segW.toLong)
      tagE(323, 4, 1, segH.toLong)
      tagE(324, 4, nSegs.toLong,
        if (needArrays) offsetsOff else segOffs(0))
      tagE(325, 4, nSegs.toLong,
        if (needArrays) countsOff else segs(0).length.toLong)
    }
    w32v(0)
    if (spp > 1) (0 until spp).foreach(_ => w16v(bps))
    if (needArrays) {
      segOffs.init.foreach(w32v)
      segs.foreach(st => w32v(st.length.toLong))
    }
    segs.foreach(st => bos.write(st, 0, st.length))
    bos.toByteArray
  }

  /** Assemble a single-IFD TIFF around already-encoded strips —
    * shared by the pixel fixtures (closed-form strips) and the
    * JPEG-in-TIFF fixture (each strip a standalone JFIF stream). */
  def tiffContainer(w: Int, h: Int, spp: Int, photometric: Int,
      compression: Int, rowsPerStrip: Int, littleEndian: Boolean,
      predictor: Int, strips: Seq[Array[Byte]]): Array[Byte] = {
    val nStrips = strips.length
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
    // layout: header(8) | IFD (10 tags) | bits array (spp=3 only) |
    // strip offsets | strip counts | strip data
    val nTags = if (predictor == 2) 11 else 10
    val ifdBytes = 2 + 12 * nTags + 4
    var cursor = 8L + ifdBytes
    val bitsOff = cursor
    if (spp == 3) cursor += 2 * spp
    val needOffArrays = nStrips > 1
    val offsetsOff = cursor
    if (needOffArrays) cursor += 4L * nStrips
    val countsOff = cursor
    if (needOffArrays) cursor += 4L * nStrips
    val stripOffs = strips.scanLeft(cursor)((acc, st) => acc + st.length)

    bos.write(if (littleEndian) 'I' else 'M')
    bos.write(if (littleEndian) 'I' else 'M')
    w16(42); w32(8)
    def tag(t: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(t); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value.toInt); w16(0) }
      else w32(value)
    }
    w16(nTags)
    tag(256, 4, 1, w.toLong)
    tag(257, 4, 1, h.toLong)
    if (spp == 3) tag(258, 3, 3, bitsOff)
    else tag(258, 3, 1, 8)
    tag(259, 3, 1, compression.toLong)
    tag(262, 3, 1, photometric.toLong)
    tag(273, 4, nStrips,
      if (needOffArrays) offsetsOff else stripOffs(0))
    tag(277, 3, 1, spp.toLong)
    tag(278, 4, 1, rowsPerStrip.toLong)
    tag(279, 4, nStrips,
      if (needOffArrays) countsOff else strips(0).length.toLong)
    tag(284, 3, 1, 1)
    if (predictor == 2) tag(317, 3, 1, 2)
    w32(0) // no next IFD
    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (needOffArrays) {
      stripOffs.init.foreach(w32)
      strips.foreach(st => w32(st.length.toLong))
    }
    strips.foreach(st => bos.write(st, 0, st.length))
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
