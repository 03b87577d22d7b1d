package graft.operators

/** REAL animated-GIF codec — the frame-sampling leg of the multimodal
  * story, fully real like [[PngPixels]], [[JpegDc]] and [[WavPcm]]
  * (GIF's only compression is LZW, pure bit/dictionary work needing no
  * codec library; format per the public GIF89a specification).
  *
  * Reader: header + logical-screen-descriptor walk, global/local color
  * tables (mapped to 8-bit luminance, Rec.709 integer weights),
  * extension blocks (graphic control, comment, application, …) skipped
  * by sub-block length, and a complete variable-width LZW decode —
  * 9→12-bit code growth, clear/reset, the KwKwK self-reference case —
  * per image descriptor. INTERLACED frames decode for real: the
  * stored rows arrive in the spec's four-pass order (8-strided from
  * row 0, 8-strided from 4, 4-strided from 2, 2-strided from 1) and
  * are permuted back to raster order after LZW. Untrusted dims are
  * validated in Long against [[PngPixels.MaxDecodedBytes]] before any
  * allocation. Outside the subset — a frame with no active color
  * table, out-of-palette indices, truncated or corrupt streams — the
  * decoder returns None, never throws: the dirty-crawl-bytes contract
  * shared by all four media codecs.
  *
  * Writer: a REAL greedy LZW compressor (longest-match dictionary,
  * width growth, clear-on-full) — not the fixed-width "uncompressed
  * GIF" shortcut — so round-trip tests exercise the decoder's whole
  * dictionary path, including 12-bit growth and mid-stream resets on
  * large frames. Frames carry pixels following the pure contract
  * [[pix]], so a SQL oracle re-derives exact per-frame statistics with
  * no image machinery.
  *
  * Frames are decoded independently (palette → luminance); GIF
  * disposal/compositing is out of scope — for the pipeline use cases
  * here (frame sampling, per-frame features, near-dup) the per-frame
  * raster is the payload, reference capability: binary media objects,
  * 01_simple.ipynb cell 29. */
object Gif {

  /** The pixel contract the oracle recomputes: frame `f` of doc `id`
    * at (x, y) = `(3x + 5y + 11f + 7·id) mod 251` — a prime modulus,
    * so no axis aligns with the 256-entry palette or the LZW window. */
  def pix(id: Long, f: Int, x: Int, y: Int): Int =
    math.floorMod(3L * x + 5L * y + 11L * f + 7L * id, 251L).toInt

  /** One decoded frame: luminance raster, scanline-major. */
  final case class Frame(
      left: Int, top: Int, width: Int, height: Int, luma: Array[Byte])

  /** Decoded GIF: logical screen dims + every frame. */
  final case class Decoded(width: Int, height: Int, frames: Vector[Frame])

  /** Source-row order of an interlaced frame (GIF89a §20): pass 1
    * every 8th row from 0, pass 2 every 8th from 4, pass 3 every 4th
    * from 2, pass 4 every 2nd from 1. `result(j)` = the raster row
    * the j-th STORED row lands on — the writer emits rows in this
    * order and the reader permutes them back. */
  private[operators] def interlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var j = 0
    val starts = Array(0, 4, 2, 1)
    val steps = Array(8, 8, 4, 2)
    var p = 0
    while (p < 4) {
      var row = starts(p)
      while (row < h) { out(j) = row; j += 1; row += steps(p) }
      p += 1
    }
    out
  }

  // ---------------------------------------------------------------- writer

  /** Complete animated GIF89a whose frame `f` pixel (x, y) equals
    * [[pix]]`(id, f, x, y)`: grayscale global color table (entry i =
    * (i,i,i), so index == luminance exactly), a comment extension and
    * per-frame graphic-control extensions (exercising the reader's
    * block skipper), full-size frames, real LZW. `interlaced` stores
    * every frame's rows in the four-pass order with the descriptor
    * flag set — same pixels, permuted layout, so decoded output is
    * bit-identical to the sequential form (the oracle is
    * layout-independent by construction). */
  def gifWithFrames(id: Long, w: Int, h: Int, nFrames: Int,
      interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0 && w * h.toLong * nFrames < (1L << 26),
      s"w=$w h=$h frames=$nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    bos.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    bos.write(0)    // background color index
    bos.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { bos.write(i); bos.write(i); bos.write(i); i += 1 }
    // comment extension — readers must skip arbitrary sub-block chains
    bos.write(0x21); bos.write(0xfe)
    val comment = s"graft fixture $id".getBytes("US-ASCII")
    bos.write(comment.length); bos.write(comment, 0, comment.length)
    bos.write(0)
    var f = 0
    while (f < nFrames) {
      // graphic control extension (delay 10 cs, no transparency)
      bos.write(0x21); bos.write(0xf9); bos.write(4)
      bos.write(0); le16(10); bos.write(0); bos.write(0)
      // image descriptor: full-size, no local table; the interlace
      // flag changes the stored ROW ORDER, not the pixels
      bos.write(0x2c); le16(0); le16(0); le16(w); le16(h)
      bos.write(if (interlaced) 0x40 else 0)
      val rowOf: Int => Int =
        if (interlaced) { val order = interlaceRows(h); order(_) }
        else identity
      val indices = new Array[Byte](w * h)
      var j = 0
      while (j < h) {
        val y = rowOf(j) // stored row j carries raster row y
        var x = 0
        while (x < w) {
          indices(j * w + x) = pix(id, f, x, y).toByte; x += 1
        }
        j += 1
      }
      bos.write(8) // LZW minimum code size
      val lzw = lzwEncode(indices, 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        bos.write(n); bos.write(lzw, off, n); off += n
      }
      bos.write(0) // block terminator
      f += 1
    }
    bos.write(0x3b) // trailer
    bos.toByteArray
  }

  /** Delta-frame animated GIF (r8): frame 0 paints the full canvas;
    * every later frame is a SUB-RECTANGLE at a deterministic position
    * with transparency holes (pixels where `pix % 7 == 0` carry the
    * transparent index 255 — never used by opaque pixels, whose values
    * stay < 251), disposal "do not dispose". The composited canvas at
    * frame f therefore shows, at each (x, y), the most recent frame
    * g <= f whose rectangle covers the pixel AND is opaque there —
    * a pure integer contract a SQL oracle brute-forces. Rectangle
    * geometry (all affine-mod, 1-based-free):
    * `fw = w - (3f+id) mod (w/2)`, `fh = h - (5f+id) mod (h/2)`,
    * `left = (7f+id) mod (w-fw+1)`, `top = (11f+id) mod (h-fh+1)`. */
  def gifWithDeltaFrames(id: Long, w: Int, h: Int, nFrames: Int)
      : Array[Byte] = {
    require(w >= 2 && h >= 2 && nFrames > 0 &&
      w * h.toLong * nFrames < (1L << 26), s"w=$w h=$h frames=$nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    bos.write(0xf7); bos.write(0); bos.write(0)
    var i = 0
    while (i < 256) { bos.write(i); bos.write(i); bos.write(i); i += 1 }
    var f = 0
    while (f < nFrames) {
      val fw = if (f == 0) w
        else w - math.floorMod(3L * f + id, (w / 2).toLong).toInt
      val fh = if (f == 0) h
        else h - math.floorMod(5L * f + id, (h / 2).toLong).toInt
      val left = if (f == 0) 0
        else math.floorMod(7L * f + id, (w - fw + 1).toLong).toInt
      val top = if (f == 0) 0
        else math.floorMod(11L * f + id, (h - fh + 1).toLong).toInt
      // graphic control: disposal 1 (leave), transparent index 255
      bos.write(0x21); bos.write(0xf9); bos.write(4)
      bos.write(0x05); le16(10); bos.write(255); bos.write(0)
      bos.write(0x2c); le16(left); le16(top); le16(fw); le16(fh)
      bos.write(0)
      val indices = new Array[Byte](fw * fh)
      var v = 0
      while (v < fh) {
        var u = 0
        while (u < fw) {
          val p = pix(id, f, left + u, top + v)
          indices(v * fw + u) = (if (p % 7 == 0) 255 else p).toByte
          u += 1
        }
        v += 1
      }
      bos.write(8)
      val lzw = lzwEncode(indices, 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        bos.write(n); bos.write(lzw, off, n); off += n
      }
      bos.write(0)
      f += 1
    }
    bos.write(0x3b)
    bos.toByteArray
  }

  /** Greedy LZW compress (GIF variant): codes packed LSB-first, width
    * grows when the just-assigned dictionary index reaches 1<<width,
    * clear + reset when the 12-bit dictionary fills. */
  private[operators] def lzwEncode(
      data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bos = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        bos.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // dictionary: (prefix code, next byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    def reset(): Unit = { dict = new java.util.HashMap(); next = eoi + 1 }
    emit(clear)
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = Integer.valueOf((cur << 8) | k)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          if (next == 4096) { // dictionary full: clear and start over
            emit(clear); width = minCodeSize + 1; reset()
          } else {
            dict.put(key, Integer.valueOf(next))
            if (next == (1 << width) && width < 12) width += 1
            next += 1
          }
          cur = k
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (bitCnt > 0) bos.write((bitBuf & 0xff).toInt)
    bos.toByteArray
  }

  // ---------------------------------------------------------------- reader

  /** Real decode (sequential AND interlaced row layouts); None on dirty bytes. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes, composite = false)
    catch { case _: Exception => None }
  }

  /** COMPOSITED decode (r8): frames rendered onto the logical screen
    * per the GIF89a animation model — sub-rectangle frames painted at
    * (left, top), transparent-index pixels letting the prior canvas
    * show through, and the graphic-control DISPOSAL methods honored
    * between frames (1/0 leave, 2 restore-to-background, 3
    * restore-to-previous). Every returned frame is a full canvas
    * snapshot (left=0, top=0, canvas dims) — what a delta-frame
    * animation actually looks like, which per-frame independent
    * [[decode]] cannot show. A frame rectangle outside the canvas is
    * dirty → None. */
  def decodeComposited(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes, composite = true)
    catch { case _: Exception => None }
  }

  /** True iff the magic bytes say GIF — the dispatch predicate
    * [[Multimodal.sampleFrames]] uses to pick the real frame path. */
  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def decode0(b: Array[Byte], composite: Boolean)
      : Option[Decoded] = {
    if (!isGif(b) || b.length < 13) return None
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val sw = le16(6); val sh = le16(8)
    val packed = b(10) & 0xff
    val bgIndex = b(11) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val entries = 1 << ((packed & 7) + 1)
      lumaTable(b, pos, entries) match {
        case Some(t) => gct = t
        case None => return None
      }
      pos += 3 * entries
    }
    // animation canvas state (composite mode only)
    var canvas: Array[Byte] = null
    var bgLuma: Byte = 0
    if (composite) {
      if (sw <= 0 || sh <= 0 ||
        sw.toLong * sh > PngPixels.MaxDecodedBytes) return None
      bgLuma =
        if (gct != null && bgIndex < gct.length) gct(bgIndex) else 0
      canvas = new Array[Byte](sw * sh)
      java.util.Arrays.fill(canvas, bgLuma)
    }
    // pending graphic-control state — applies to the NEXT image only
    var disposal = 0
    var transparentIdx = -1
    val frames = Vector.newBuilder[Frame]
    var totalPx = 0L
    var done = false
    while (!done) {
      if (pos >= b.length) return None // no trailer
      val block = b(pos) & 0xff; pos += 1
      block match {
        case 0x3b => done = true
        case 0x21 => // extension: label byte, then length-prefixed sub-blocks
          if (pos >= b.length) return None
          val label = b(pos) & 0xff
          pos += 1
          // graphic control (0xf9): capture disposal + transparency for
          // the next image before the generic sub-block skip
          if (label == 0xf9 && pos + 5 <= b.length &&
            (b(pos) & 0xff) == 4) {
            val gcPacked = b(pos + 1) & 0xff
            disposal = (gcPacked >> 2) & 7
            transparentIdx =
              if ((gcPacked & 1) != 0) b(pos + 4) & 0xff else -1
          }
          var len = -1
          while (len != 0) {
            if (pos >= b.length) return None
            len = b(pos) & 0xff; pos += 1
            if (pos + len > b.length) return None
            pos += len
          }
        case 0x2c => // image descriptor
          if (pos + 9 > b.length) return None
          val left = le16(pos); val top = le16(pos + 2)
          val fw = le16(pos + 4); val fh = le16(pos + 6)
          val fpacked = b(pos + 8) & 0xff
          pos += 9
          val interlaced = (fpacked & 0x40) != 0
          var table = gct
          if ((fpacked & 0x80) != 0) {
            val entries = 1 << ((fpacked & 7) + 1)
            lumaTable(b, pos, entries) match {
              case Some(t) => table = t
              case None => return None
            }
            pos += 3 * entries
          }
          if (table == null) return None // no active color table
          val px = fw.toLong * fh
          // composite snapshots are canvas-sized — budget the larger
          totalPx += (if (composite) sw.toLong * sh else px)
          if (fw <= 0 || fh <= 0 || px > PngPixels.MaxDecodedBytes ||
            totalPx > PngPixels.MaxDecodedBytes) return None
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xff; pos += 1
          if (minCode < 2 || minCode > 8) return None
          // gather the LZW stream from its sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var len = -1
          while (len != 0) {
            if (pos >= b.length) return None
            len = b(pos) & 0xff; pos += 1
            if (pos + len > b.length) return None
            data.write(b, pos, len); pos += len
          }
          val indices = lzwDecode(data.toByteArray, minCode, (fw * fh.toLong).toInt)
          if (indices == null) return None
          // interlaced: stored row j belongs at raster row order(j) —
          // a four-pass row permutation, same bytes per row (applied
          // to the INDEX plane so transparency tests see raster order)
          val rasterIdx =
            if (!interlaced) indices
            else {
              val order = interlaceRows(fh)
              val out = new Array[Byte](indices.length)
              var j = 0
              while (j < fh) {
                System.arraycopy(indices, j * fw, out, order(j) * fw, fw)
                j += 1
              }
              out
            }
          if (!composite) {
            val luma = new Array[Byte](rasterIdx.length)
            var i = 0
            while (i < rasterIdx.length) {
              val idx = rasterIdx(i) & 0xff
              if (idx >= table.length) return None // out-of-palette index
              luma(i) = table(idx)
              i += 1
            }
            frames += Frame(left, top, fw, fh, luma)
          } else {
            // animation model: paint the sub-rect onto the canvas
            // (transparent index pixels leave it untouched), snapshot,
            // then apply the pending disposal
            if (left + fw > sw || top + fh > sh) return None
            val saved =
              if (disposal == 3) canvas.clone() else null
            var v = 0
            while (v < fh) {
              var u = 0
              while (u < fw) {
                val idx = rasterIdx(v * fw + u) & 0xff
                if (idx != transparentIdx) {
                  if (idx >= table.length) return None
                  canvas((top + v) * sw + (left + u)) = table(idx)
                }
                u += 1
              }
              v += 1
            }
            frames += Frame(0, 0, sw, sh, canvas.clone())
            disposal match {
              case 2 => // restore the frame rect to the background
                var v2 = 0
                while (v2 < fh) {
                  var u2 = 0
                  while (u2 < fw) {
                    canvas((top + v2) * sw + (left + u2)) = bgLuma
                    u2 += 1
                  }
                  v2 += 1
                }
              case 3 => canvas = saved // restore to previous
              case _ => () // 0/1: leave as rendered
            }
          }
          // graphic control applies to exactly one image
          disposal = 0
          transparentIdx = -1
        case _ => return None
      }
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some(Decoded(sw, sh, fs))
  }

  /** Color table → 8-bit luminance, Rec.709 integer weights — exact
    * identity for grayscale entries (2126r+7152g+722b = 10000·v). */
  private def lumaTable(b: Array[Byte], off: Int, entries: Int)
      : Option[Array[Byte]] = {
    if (off + 3 * entries > b.length) return None
    val t = new Array[Byte](entries)
    var i = 0
    while (i < entries) {
      val r = b(off + 3 * i) & 0xff
      val g = b(off + 3 * i + 1) & 0xff
      val bl = b(off + 3 * i + 2) & 0xff
      t(i) = ((2126 * r + 7152 * g + 722 * bl) / 10000).toByte
      i += 1
    }
    Some(t)
  }

  /** Full GIF LZW decode: variable 9→12-bit codes LSB-first, clear /
    * end-of-information handling, KwKwK case. Returns exactly
    * `expected` indices or null (never throws on dirty streams). */
  private[operators] def lzwDecode(
      data: Array[Byte], minCodeSize: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCodeSize + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    val stack = new Array[Byte](4096)
    var bitBuf = 0L
    var bitCnt = 0
    var bytePos = 0
    var prev = -1
    var firstOfPrev: Byte = 0
    while (outPos < expected) {
      while (bitCnt < width) {
        if (bytePos >= data.length) return null // truncated stream
        bitBuf |= (data(bytePos) & 0xffL) << bitCnt
        bitCnt += 8; bytePos += 1
      }
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      if (code == clear) {
        next = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return null // EOI before all pixels decoded
      } else {
        var sp = 0
        var cur = code
        if (code >= next) {
          if (code != next || prev < 0) return null // gap in the dictionary
          stack(sp) = firstOfPrev; sp += 1 // KwKwK: code being defined now
          cur = prev
        }
        while (cur >= clear + 2) { // walk the chain down to a literal
          stack(sp) = suffix(cur); sp += 1; cur = prefix(cur)
        }
        if (cur >= clear) return null // literal slot holding clear/eoi
        val first = cur.toByte
        stack(sp) = first; sp += 1
        if (outPos + sp > expected) return null // frame overrun
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code; firstOfPrev = first
      }
    }
    out
  }
}
