package graft.operators

/** REAL FLAC audio codec (RFC 9639 / xiph.org format spec) — the
  * compressed leg of the audio story next to [[WavPcm]]'s raw PCM.
  * FLAC is the lossless format an audio crawl actually contains, and
  * it needs no external library: the whole format is bit-packed
  * integer prediction + Rice coding.
  *
  * Reader subset (everything a 16-bit-PCM corpus hits is REAL):
  *  - full metadata-block walk (STREAMINFO parsed, all other block
  *    types skipped by length, `last` flag honored);
  *  - every frame-header block-size code (192/576·2ⁿ/256·2ⁿ and both
  *    get-from-end forms), every sample-rate code (streaminfo ref,
  *    the eleven direct codes, all three get-from-end forms), UTF-8
  *    coded frame/sample numbers, CRC-8 header check;
  *  - all four channel assignments: independent, left/side,
  *    right/side, mid/side (side channel decoded at bps+1, exact
  *    integer reconstruction);
  *  - all subframe types: CONSTANT, VERBATIM, FIXED orders 0–4, and
  *    LPC orders 1–32 (quantized-coefficient integer prediction with
  *    arithmetic shift), plus the wasted-bits unary prefix;
  *  - both residual coding methods (4-bit and 5-bit Rice parameters),
  *    partition orders 0–15, the escape (verbatim-residual) code;
  *  - frame CRC-16 check and whole-stream MD5 verification against
  *    STREAMINFO (a single corrupted bit anywhere fails the decode).
  * Outside the subset — bit depths ≠ 16 (the PCM16 corpus contract
  * shared with [[WavPcm]]) — the decoder returns None, never throws:
  * the dirty-crawl-bytes contract of every codec in the repo.
  *
  * The writer is a real encoder (fixed + LPC prediction, per-partition
  * Rice parameter search, stereo decorrelation, wasted-bits
  * detection, real CRCs and MD5), so round-trip specs exercise the
  * same bit grammar a foreign decoder would read. Samples follow
  * [[WavPcm.samp]], so the SQL oracle for FLAC queries is the SAME
  * closed form as the WAV ones — the engine value just additionally
  * survived prediction + Rice + CRC + MD5.
  *
  * Reference capability: binary media objects per document
  * (01_simple.ipynb cell 29, `"objects": True`).
  */
object Flac {

  /** Decoded PCM16 stream — the same shape as [[WavPcm.Decoded]] so
    * the canonical-WAV bridge serves every existing audio kernel. */
  final case class Decoded(
      channels: Int, sampleRate: Int, frames: Int, samples: Array[Short])

  def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  // ---------------------------------------------------------------
  // CRCs (FLAC frame polynomials, MSB-first, init 0)
  // ---------------------------------------------------------------

  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      t(i) = c; i += 1
    }
    t
  }

  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      t(i) = c; i += 1
    }
    t
  }

  private[operators] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table((c ^ b(i)) & 0xff); i += 1 }
    c
  }

  private[operators] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = (((c << 8) & 0xffff) ^ crc16Table(((c >> 8) ^ b(i)) & 0xff)); i += 1 }
    c
  }

  // ---------------------------------------------------------------
  // Bit I/O (FLAC packs MSB-first)
  // ---------------------------------------------------------------

  private[operators] final class BitWriter {
    private var buf = new Array[Byte](256)
    private var nBytes = 0
    private var acc = 0L
    private var nAcc = 0

    private def ensure(n: Int): Unit =
      if (nBytes + n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, nBytes + n))

    def write(value: Long, bits: Int): Unit = {
      var rem = bits
      var v = if (bits == 64) value else value & ((1L << bits) - 1)
      while (rem > 0) {
        val take = math.min(rem, 56 - nAcc)
        acc = (acc << take) | ((v >>> (rem - take)) & ((1L << take) - 1))
        nAcc += take; rem -= take
        if (rem > 0) v &= (1L << rem) - 1
        while (nAcc >= 8) {
          ensure(1)
          buf(nBytes) = ((acc >>> (nAcc - 8)) & 0xff).toByte
          nBytes += 1; nAcc -= 8
        }
      }
    }

    def writeUnary(v: Int): Unit = { var i = 0; while (i < v) { write(0, 1); i += 1 }; write(1, 1) }

    def alignZero(): Unit = if (nAcc > 0) write(0, (8 - nAcc) & 7)

    def size: Int = { require(nAcc == 0, "unaligned"); nBytes }
    def byteAt(i: Int): Byte = buf(i)
    def bytes(from: Int, until: Int): Array[Byte] = java.util.Arrays.copyOfRange(buf, from, until)
    def toByteArray: Array[Byte] = { alignZero(); java.util.Arrays.copyOf(buf, nBytes) }
  }

  /** Thrown internally on any malformed bit structure; decode()
    * converts every instance to None. */
  private final class Malformed extends Exception

  private[operators] final class BitReader(b: Array[Byte], var pos: Int) {
    private var bit = 0

    def bytePos: Int = { if (bit != 0) throw new Malformed; pos }
    def atByteBoundary: Boolean = bit == 0
    def hasBits(n: Long): Boolean = (b.length.toLong - pos) * 8 - bit >= n

    def take(bits: Int): Int = takeLong(bits).toInt

    def takeLong(bits: Int): Long = {
      if (!hasBits(bits)) throw new Malformed
      var out = 0L
      var rem = bits
      while (rem > 0) {
        val avail = 8 - bit
        val take = math.min(rem, avail)
        val cur = (b(pos) >> (avail - take)) & ((1 << take) - 1)
        out = (out << take) | cur
        bit += take; rem -= take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      out
    }

    /** Count of zero bits before the next 1 (the 1 is consumed). */
    def unary(): Int = {
      var n = 0
      while (take(1) == 0) { n += 1; if (n > (1 << 24)) throw new Malformed }
      n
    }

    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }

    def signed(bits: Int): Int = {
      val v = takeLong(bits)
      ((v << (64 - bits)) >> (64 - bits)).toInt
    }
  }

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  /** Max decoded PCM bytes — shared cap with the other codecs. */
  private def maxSamples: Long = PngPixels.MaxDecodedBytes / 2

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def decode0(b: Array[Byte]): Option[Decoded] = {
    if (!isFlac(b) || b.length < 4 + 4 + 34) return None
    var pos = 4
    // metadata walk: STREAMINFO must be first (spec), others skipped
    var last = false
    var first = true
    var rate = 0; var channels = 0; var bps = 0
    var totalSamples = 0L
    var md5 = new Array[Byte](16)
    while (!last) {
      if (pos + 4 > b.length) return None
      val h = b(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((b(pos + 1) & 0xff) << 16) | ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      pos += 4
      if (pos.toLong + len > b.length) return None
      if (first) {
        if (btype != 0 || len != 34) return None
        val r = new BitReader(b, pos)
        r.take(16); r.take(16) // min/max blocksize
        r.take(24); r.take(24) // min/max framesize
        rate = r.take(20)
        channels = r.take(3) + 1
        bps = r.take(5) + 1
        totalSamples = r.takeLong(36)
        md5 = java.util.Arrays.copyOfRange(b, pos + 18, pos + 34)
        first = false
      } else if (btype == 0) return None // duplicate STREAMINFO
      pos += len
    }
    if (first || rate <= 0 || channels < 1 || channels > 8) return None
    if (bps != 16) return None // PCM16 subset, like WavPcm
    if (totalSamples > maxSamples / channels) return None

    val out = new java.io.ByteArrayOutputStream() // interleaved LE PCM16
    var decoded = 0L
    // totalSamples == 0 means unknown: decode until bytes run out
    while ((totalSamples > 0 && decoded < totalSamples) ||
        (totalSamples == 0 && pos + 2 <= b.length)) {
      val frameStart = pos
      val r = new BitReader(b, pos)
      if (r.take(14) != 0x3ffe) return None // sync
      if (r.take(1) != 0) return None // reserved
      r.take(1) // blocking strategy (both accepted; numbering unchecked)
      val bsCode = r.take(4)
      val srCode = r.take(4)
      val chAsgn = r.take(4)
      val ssCode = r.take(3)
      if (r.take(1) != 0) return None // reserved
      // UTF-8 coded frame/sample number (value unused beyond validity)
      decodeUtf8Number(r)
      val blockSize = bsCode match {
        case 0 => return None
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => r.take(8) + 1
        case 7 => r.take(16) + 1
        case n => 256 << (n - 8)
      }
      srCode match {
        case 0 | 1 | 2 | 3 | 4 | 5 | 6 | 7 | 8 | 9 | 10 | 11 => ()
        case 12 => r.take(8) // kHz
        case 13 | 14 => r.take(16) // Hz / daHz
        case _ => return None
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return None
      }
      if (frameBps != 16) return None
      val nCh = chAsgn match {
        case a if a <= 7 => a + 1
        case 8 | 9 | 10 => 2
        case _ => return None
      }
      if (nCh != channels) return None
      val headerEnd = r.bytePos
      val expected8 = r.take(8)
      if (crc8(b, frameStart, headerEnd) != expected8) return None

      if (decoded + blockSize > maxSamples / channels) return None
      // subframes
      val chans = new Array[Array[Int]](nCh)
      var c = 0
      while (c < nCh) {
        val sideBits = chAsgn match {
          case 8 if c == 1 => 1 // left/side
          case 9 if c == 0 => 1 // right/side
          case 10 if c == 1 => 1 // mid/side
          case _ => 0
        }
        chans(c) = decodeSubframe(r, blockSize, frameBps + sideBits)
        c += 1
      }
      r.align()
      val frameEnd = r.bytePos
      val expected16 = r.take(16)
      if (crc16(b, frameStart, frameEnd) != expected16) return None
      pos = r.bytePos

      // undo stereo decorrelation (exact integer reconstruction)
      chAsgn match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 9 => // right/side: left = right + side
          var i = 0
          while (i < blockSize) {
            val right = chans(1)(i)
            chans(0)(i) = right + chans(0)(i)
            i += 1
          }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val mid = chans(0)(i); val side = chans(1)(i)
            val left = mid + ((side + (side & 1)) >> 1)
            chans(0)(i) = left
            chans(1)(i) = left - side
            i += 1
          }
        case _ => ()
      }
      var i = 0
      while (i < blockSize) {
        c = 0
        while (c < nCh) {
          val v = chans(c)(i)
          if (v < Short.MinValue || v > Short.MaxValue) return None
          out.write(v & 0xff); out.write((v >> 8) & 0xff)
          c += 1
        }
        i += 1
      }
      decoded += blockSize
      if (totalSamples > 0 && decoded > totalSamples) return None
    }

    val pcm = out.toByteArray
    // whole-stream MD5 check (all-zero md5 = unknown, skip)
    var md5Known = false
    var k = 0
    while (k < 16) { if (md5(k) != 0) md5Known = true; k += 1 }
    if (md5Known) {
      val got = java.security.MessageDigest.getInstance("MD5").digest(pcm)
      if (!java.util.Arrays.equals(got, md5)) return None
    }
    val n = pcm.length / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((pcm(2 * i) & 0xff) | ((pcm(2 * i + 1) & 0xff) << 8)).toShort
      i += 1
    }
    Some(Decoded(channels, rate, n / channels, samples))
  }

  private def decodeUtf8Number(r: BitReader): Long = {
    val b0 = r.take(8)
    if ((b0 & 0x80) == 0) return b0
    var nCont = 0
    var mask = 0x40
    while ((b0 & mask) != 0 && nCont < 7) { nCont += 1; mask >>= 1 }
    if (nCont < 1 || nCont > 6) throw new Malformed
    var v: Long = b0 & (mask - 1)
    var i = 0
    while (i < nCont) {
      val bc = r.take(8)
      if ((bc & 0xc0) != 0x80) throw new Malformed
      v = (v << 6) | (bc & 0x3f)
      i += 1
    }
    v
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int): Array[Int] = {
    if (r.take(1) != 0) throw new Malformed // padding bit
    val stype = r.take(6)
    val wastedFlag = r.take(1)
    val wasted = if (wastedFlag == 1) r.unary() + 1 else 0
    val eff = bps - wasted
    if (eff <= 0) throw new Malformed
    val s = new Array[Int](n)
    if (stype == 0) { // CONSTANT
      val v = r.signed(eff)
      var i = 0
      while (i < n) { s(i) = v; i += 1 }
    } else if (stype == 1) { // VERBATIM
      var i = 0
      while (i < n) { s(i) = r.signed(eff); i += 1 }
    } else if ((stype & 0x38) == 0x08 && (stype & 0x07) <= 4) { // FIXED 0-4
      val order = stype & 0x07
      if (order > n) throw new Malformed
      var i = 0
      while (i < order) { s(i) = r.signed(eff); i += 1 }
      decodeResidual(r, s, n, order)
      // un-difference: s[i] = residual + fixed prediction
      order match {
        case 0 => ()
        case 1 =>
          i = 1; while (i < n) { s(i) += s(i - 1); i += 1 }
        case 2 =>
          i = 2; while (i < n) { s(i) += 2 * s(i - 1) - s(i - 2); i += 1 }
        case 3 =>
          i = 3; while (i < n) { s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3); i += 1 }
        case 4 =>
          i = 4; while (i < n) { s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4); i += 1 }
      }
    } else if ((stype & 0x20) != 0) { // LPC, order 1-32
      val order = (stype & 0x1f) + 1
      if (order > n) throw new Malformed
      var i = 0
      while (i < order) { s(i) = r.signed(eff); i += 1 }
      val precision = r.take(4) + 1
      if (precision == 16) throw new Malformed // 1111 invalid
      val shift = r.take(5) // spec: negative shift reserved; 5-bit unsigned
      val coef = new Array[Int](order)
      i = 0
      while (i < order) { coef(i) = r.signed(precision); i += 1 }
      decodeResidual(r, s, n, order)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j).toLong * s(i - 1 - j); j += 1 }
        val pred = acc >> shift
        val v = s(i) + pred
        if (v < Int.MinValue || v > Int.MaxValue) throw new Malformed
        s(i) = v.toInt
        i += 1
      }
    } else throw new Malformed
    if (wasted > 0) {
      var i = 0
      while (i < n) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** Rice-coded residual into s[order..n). */
  private def decodeResidual(r: BitReader, s: Array[Int], n: Int, order: Int): Unit = {
    val method = r.take(2)
    if (method > 1) throw new Malformed
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val pOrder = r.take(4)
    val nPart = 1 << pOrder
    if (n % nPart != 0) throw new Malformed
    val perPart = n / nPart
    var idx = order
    var p = 0
    while (p < nPart) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) throw new Malformed
      val param = r.take(paramBits)
      if (param == escape) {
        val bits = r.take(5)
        var i = 0
        while (i < count) {
          s(idx) = if (bits == 0) 0 else r.signed(bits)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val u = (q.toLong << param) | (if (param > 0) r.takeLong(param) else 0L)
          // zigzag: even -> u/2, odd -> -(u+1)/2
          val v = ((u >>> 1) ^ -(u & 1L))
          if (v < Int.MinValue || v > Int.MaxValue) throw new Malformed
          s(idx) = v.toInt
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  // ---------------------------------------------------------------
  // Encoder (a real one: prediction search-free but spec-complete)
  // ---------------------------------------------------------------

  /** Complete FLAC stream whose PCM16 samples equal
    * [[WavPcm.samp]]`(id, i)` at flat interleaved index i — the same
    * contract as [[WavPcm.wavWithSamples]], so FLAC queries share the
    * WAV closed-form oracle. The encoder cycles subframe types,
    * stereo assignments, partition orders, Rice methods and
    * block-size/sample-rate header codes deterministically by
    * (id, frame) so a fixture corpus exercises the whole grammar. */
  def flacWithSamples(
      id: Long, frames: Int, channels: Int, sampleRate: Int): Array[Byte] = {
    require(frames > 0 && channels > 0 && channels <= 8 && sampleRate > 0,
      s"frames=$frames channels=$channels rate=$sampleRate")
    val samples = new Array[Short](frames * channels)
    var i = 0
    while (i < samples.length) { samples(i) = WavPcm.samp(id, i).toShort; i += 1 }
    encode(id, channels, sampleRate, samples)
  }

  /** Encode GIVEN interleaved PCM16 samples; `seed` steers the
    * deterministic strategy cycling. */
  def encode(seed: Long, channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && channels <= 8 && samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    val frames = samples.length / channels
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last=0): a PADDING block follows to exercise the walk
    val si = new BitWriter
    si.write(0x00, 8); si.write(34, 24)
    val blockSize = 256
    si.write(blockSize, 16); si.write(blockSize, 16)
    si.write(0, 24); si.write(0, 24) // frame sizes unknown
    si.write(sampleRate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5) // bps-1 = 15
    si.write(frames.toLong, 36)
    val md5 = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      java.security.MessageDigest.getInstance("MD5").digest(pcm)
    }
    var k = 0
    while (k < 16) { si.write(md5(k) & 0xffL, 8); k += 1 }
    bos.write(si.toByteArray)
    // PADDING metadata block (last=1) — readers must skip it
    val pad = new BitWriter
    pad.write(0x81, 8); pad.write(4, 24); pad.write(0, 32)
    bos.write(pad.toByteArray)

    var frameNo = 0
    var off = 0
    while (off < frames) {
      val n = math.min(blockSize, frames - off)
      bos.write(encodeFrame(seed, frameNo, n, n == blockSize, channels,
        sampleRate, samples, off))
      off += n
      frameNo += 1
    }
    bos.toByteArray
  }

  /** One frame: header + per-channel subframes + CRCs. */
  private def encodeFrame(seed: Long, frameNo: Int, n: Int, fullBlock: Boolean,
      channels: Int, sampleRate: Int, samples: Array[Short], off: Int): Array[Byte] = {
    val w = new BitWriter
    w.write(0x3ffe, 14) // sync
    w.write(0, 1); w.write(0, 1) // reserved, fixed-blocksize strategy
    // block size code: full blocks use the direct 256 code; the final
    // partial block uses a get-from-end form (8-bit, or 16-bit by seed)
    val bsCode =
      if (fullBlock) 8
      else if (math.floorMod(seed, 2) == 0) 6 else 7
    w.write(bsCode, 4)
    // sample-rate code cycling: streaminfo ref / direct / 16-bit Hz
    val srCode = math.floorMod(seed + frameNo, 3) match {
      case 0 => 0
      case 1 => directRateCode(sampleRate).getOrElse(0)
      case _ => if (sampleRate < 65536) 13 else 0
    }
    w.write(srCode, 4)
    val asgn =
      if (channels == 2) math.floorMod(seed + frameNo, 4) match {
        case 0 => 1 // independent stereo
        case 1 => 8 // left/side
        case 2 => 9 // right/side
        case _ => 10 // mid/side
      }
      else channels - 1
    w.write(asgn, 4)
    w.write(4, 3) // sample size 16-bit
    w.write(0, 1) // reserved
    writeUtf8Number(w, frameNo)
    if (bsCode == 6) w.write(n - 1, 8)
    else if (bsCode == 7) w.write(n - 1, 16)
    if (srCode == 13) w.write(sampleRate, 16)
    w.alignZero()
    val headerLen = w.size
    val header = w.bytes(0, headerLen)
    w.write(crc8(header, 0, headerLen), 8)

    // channel data (after decorrelation)
    val chans = new Array[Array[Int]](if (asgn >= 8) 2 else channels)
    val chBits = new Array[Int](chans.length)
    if (asgn >= 8) {
      val left = new Array[Int](n); val right = new Array[Int](n)
      var i = 0
      while (i < n) {
        left(i) = samples((off + i) * 2)
        right(i) = samples((off + i) * 2 + 1)
        i += 1
      }
      val side = new Array[Int](n)
      i = 0
      while (i < n) { side(i) = left(i) - right(i); i += 1 }
      asgn match {
        case 8 => chans(0) = left; chans(1) = side; chBits(0) = 16; chBits(1) = 17
        case 9 => chans(0) = side; chans(1) = right; chBits(0) = 17; chBits(1) = 16
        case _ =>
          val mid = new Array[Int](n)
          i = 0
          while (i < n) { mid(i) = (left(i) + right(i)) >> 1; i += 1 }
          chans(0) = mid; chans(1) = side; chBits(0) = 16; chBits(1) = 17
      }
    } else {
      var c = 0
      while (c < channels) {
        val a = new Array[Int](n)
        var i = 0
        while (i < n) { a(i) = samples((off + i) * channels + c); i += 1 }
        chans(c) = a; chBits(c) = 16
        c += 1
      }
    }
    var c = 0
    while (c < chans.length) {
      encodeSubframe(w, seed + frameNo * 31 + c * 7, chans(c), chBits(c))
      c += 1
    }
    w.alignZero()
    val bodyLen = w.size
    val body = w.bytes(0, bodyLen)
    w.write(crc16(body, 0, bodyLen), 16)
    w.toByteArray
  }

  private def directRateCode(rate: Int): Option[Int] = rate match {
    case 88200 => Some(1); case 176400 => Some(2); case 192000 => Some(3)
    case 8000 => Some(4); case 16000 => Some(5); case 22050 => Some(6)
    case 24000 => Some(7); case 32000 => Some(8); case 44100 => Some(9)
    case 48000 => Some(10); case 96000 => Some(11); case _ => None
  }

  private def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.write(v, 8); return }
    // count payload bits -> continuation bytes
    var nCont = 1
    while (v >= (1L << (6 * nCont + (6 - nCont))) && nCont < 6) nCont += 1
    val lead = (0xfe << (6 - nCont)) & 0xff
    w.write(lead | (v >>> (6 * nCont)), 8)
    var i = nCont - 1
    while (i >= 0) { w.write(0x80 | ((v >>> (6 * i)) & 0x3f), 8); i -= 1 }
  }

  private def encodeSubframe(w: BitWriter, seed: Long, raw: Array[Int], bps: Int): Unit = {
    val n = raw.length
    // wasted-bits detection (all samples share w trailing zero bits)
    var wasted = 32
    var i = 0
    while (i < n && wasted > 0) {
      if (raw(i) != 0)
        wasted = math.min(wasted, java.lang.Integer.numberOfTrailingZeros(raw(i)))
      i += 1
    }
    if (wasted >= bps || wasted == 32) wasted = 0 // all-zero or degenerate
    val s = if (wasted == 0) raw else {
      val a = new Array[Int](n)
      i = 0
      while (i < n) { a(i) = raw(i) >> wasted; i += 1 }
      a
    }
    val eff = bps - wasted

    def writeHeader(stype: Int): Unit = {
      w.write(0, 1)
      w.write(stype, 6)
      if (wasted == 0) w.write(0, 1)
      else { w.write(1, 1); w.writeUnary(wasted - 1) }
    }

    // constant?
    var allEqual = true
    i = 1
    while (i < n && allEqual) { if (s(i) != s(0)) allEqual = false; i += 1 }
    if (allEqual) { writeHeader(0); w.write(s(0).toLong, eff); return }

    val mode = math.floorMod(seed, 7)
    if (mode == 0 || n < 8) { // VERBATIM
      writeHeader(1)
      i = 0
      while (i < n) { w.write(s(i).toLong, eff); i += 1 }
    } else if (mode == 6) { // LPC with deterministic quantized coefficients
      val order = 2 + math.floorMod(seed, 3).toInt // 2..4
      val shift = 2
      val coef = new Array[Int](order)
      i = 0
      // small nonzero coefficients in [-4,4]
      while (i < order) { coef(i) = (math.floorMod(seed + i * 13, 8) - 3).toInt match {
        case 0 => 4; case c => c }; i += 1 }
      val res = new Array[Int](n)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j).toLong * s(i - 1 - j); j += 1 }
        val r = s(i).toLong - (acc >> shift)
        require(r >= Int.MinValue && r <= Int.MaxValue)
        res(i) = r.toInt
        i += 1
      }
      writeHeader(0x20 | (order - 1))
      i = 0
      while (i < order) { w.write(s(i).toLong, eff); i += 1 }
      w.write(4, 4) // precision-1 = 4 -> 5-bit coefficients
      w.write(shift, 5)
      i = 0
      while (i < order) { w.write(coef(i).toLong, 5); i += 1 }
      writeResidual(w, seed, res, n, order)
    } else { // FIXED order 1..4 (mode 1..4) or order 0 (mode 5)
      val order = if (mode == 5) 0 else mode.toInt
      val res = new Array[Int](n)
      i = order
      while (i < n) {
        res(i) = order match {
          case 0 => s(i)
          case 1 => s(i) - s(i - 1)
          case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
          case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
          case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
        }
        i += 1
      }
      writeHeader(0x08 | order)
      i = 0
      while (i < order) { w.write(s(i).toLong, eff); i += 1 }
      writeResidual(w, seed, res, n, order)
    }
  }

  /** Partitioned Rice residual: partition order cycles by seed among
    * the legal values; per-partition parameter by exhaustive search;
    * the 5-bit method and the escape code are exercised on a seed
    * schedule so decoders face the whole grammar. */
  private def writeResidual(w: BitWriter, seed: Long, res: Array[Int], n: Int, order: Int): Unit = {
    var pOrder = math.floorMod(seed / 7, 3).toInt // 0..2
    while (pOrder > 0 && (n % (1 << pOrder) != 0 || (n >> pOrder) <= order)) pOrder -= 1
    val method = if (math.floorMod(seed, 11) == 3) 1 else 0
    val paramBits = if (method == 0) 4 else 5
    val maxParam = (1 << paramBits) - 2
    w.write(method, 2)
    w.write(pOrder, 4)
    val nPart = 1 << pOrder
    val perPart = n / nPart
    var p = 0
    var idx = order
    while (p < nPart) {
      val count = if (p == 0) perPart - order else perPart
      val escapeThis = math.floorMod(seed + p, 13) == 5
      if (escapeThis) {
        // verbatim-residual escape: enough bits for the widest value
        var bits = 1
        var i = 0
        while (i < count) {
          val v = res(idx + i)
          val need = 33 - java.lang.Integer.numberOfLeadingZeros(if (v < 0) ~v else v)
          if (need > bits) bits = need
          i += 1
        }
        if (bits > 31) bits = 31
        w.write((1 << paramBits) - 1, paramBits)
        w.write(bits, 5)
        i = 0
        while (i < count) { w.write(res(idx + i).toLong, bits); i += 1 }
      } else {
        // best k by exact cost
        var bestK = 0; var bestCost = Long.MaxValue
        var k = 0
        while (k <= maxParam) {
          var cost = 0L
          var i = 0
          while (i < count) {
            val v = res(idx + i)
            val u = (v.toLong << 1) ^ (v.toLong >> 63)
            cost += (u >>> k) + 1 + k
            i += 1
          }
          if (cost < bestCost) { bestCost = cost; bestK = k }
          k += 1
        }
        w.write(bestK, paramBits)
        var i = 0
        while (i < count) {
          val v = res(idx + i)
          val u = (v.toLong << 1) ^ (v.toLong >> 63)
          val q = (u >>> bestK).toInt
          w.writeUnary(q)
          if (bestK > 0) w.write(u & ((1L << bestK) - 1), bestK)
          i += 1
        }
      }
      idx += count
      p += 1
    }
  }
}
