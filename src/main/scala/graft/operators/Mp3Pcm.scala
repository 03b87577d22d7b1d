package graft.operators

import graft.functions.Mp3Tables

/** REAL MPEG Layer III payload decode (ISO/IEC 11172-3 §2.4.3.4 +
  * ISO/IEC 13818-3 LSF, MPEG-2.5 rate extension): frame walk + bit
  * reservoir, side info (MPEG-1 and LSF layouts), scalefactors (scfsi
  * sharing and the LSF scalefac_compress partitions), Huffman spectral
  * decode with exact part2_3_length accounting, power-law requantize,
  * short-block reorder, MS/intensity stereo, alias reduction, hybrid
  * IMDCT (36-point long, 3x12 short, block types 0-3 incl. mixed),
  * frequency inversion, and the 32-band polyphase synthesis
  * filterbank of Table 3-B.3 — PCM16 out.
  *
  * The reference treats audio objects as opaque binary payloads
  * (01_simple.ipynb cell 29); here the decode is a real per-row kernel
  * so VAD / normalization / fingerprint curation runs on MP3 crawl
  * audio like it does on WAV/FLAC ([[WavPcm]], [[Flac]]).
  *
  * HONEST SUBSET, stated loudly: Huffman tables 11/12/13/15 and the
  * linbits families 16-31 are not shipped ([[Mp3Tables]] header —
  * this container has no spec text or probeable MP3 system library to
  * transcribe them against, unlike the libwebp/libtiff probe path the
  * VP8/T.4 tables used). A granule selecting an unshipped table makes
  * the whole decode return None — never silently-wrong PCM. Layer
  * I/II payloads and free-format bitrate are likewise rejected.
  *
  * Validator stance everywhere: dirty bytes → None, never a throw.
  * Conformance is bit-exact by construction: every granule's
  * scalefactor+Huffman read must land EXACTLY on part2_3_length bits
  * (the count1 overrun quadruple is rolled back per spec), and
  * [[stats]] surfaces the per-file granule/bit accounting so the
  * declared queries can pin it. */
object Mp3Pcm {

  final case class Decoded(
      sampleRate: Int, channels: Int, pcm: Array[Short])

  /** Per-file decode accounting for the conformance-pinning queries:
    * `bitsExact` counts granule-CHANNELS whose scalefactor+entropy
    * read consumed the side info's part2_3_length exactly (a fully
    * conformant stereo file has bitsExact == granules * channels);
    * `reservoirSilent` counts granules emitted as silence because the
    * bit reservoir did not reach back far enough (stream head after a
    * cut — normal, not an error). */
  final case class Stats(
      frames: Int, granules: Int, bitsExact: Int, reservoirSilent: Int,
      sampleRate: Int, channels: Int, nSamples: Long)

  // ------------------------------------------------------------ bits

  private final class Bits(b: Array[Byte], var pos: Int) {
    def get(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((b(pos >>> 3) >>> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def get1(): Int = {
      val v = (b(pos >>> 3) >>> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def end: Int = b.length * 8
  }

  // ------------------------------------------------------- side info

  private final class GrInfo {
    var part23 = 0; var bigValues = 0; var globalGain = 0
    var scalefacCompress = 0; var windowSwitching = false
    var blockType = 0; var mixedBlock = false
    val tableSelect = new Array[Int](3)
    val subblockGain = new Array[Int](3)
    var region0 = 0; var region1 = 0
    var preflag = 0; var scalefacScale = 0; var count1Sel = 0
    var scfsiStore: Array[Int] = null
    // filled by the scalefactor pass
    val scalefacL = new Array[Int](23)
    val scalefacS = Array.ofDim[Int](13, 3)
  }

  private final class Header(
      val version: Int, // 1, 2, 25
      val sampleRate: Int, val bitrate: Int, val channels: Int,
      val mode: Int, val modeExt: Int, val crc: Boolean,
      val frameLen: Int)

  private def parseHeader(b: Array[Byte], pos: Int): Header = {
    if (pos + 4 > b.length) return null
    if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xe0) != 0xe0) return null
    val vBits = (b(pos + 1) >> 3) & 3
    val lBits = (b(pos + 1) >> 1) & 3
    if (vBits == 1 || lBits != 1) return null // Layer III only
    val version = if (vBits == 3) 1 else if (vBits == 2) 2 else 25
    val brIdx = (b(pos + 2) >> 4) & 0xf
    if (brIdx == 0 || brIdx == 15) return null // free format rejected
    val kbps =
      if (version == 1)
        Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
      else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
    val srIdx = (b(pos + 2) >> 2) & 3
    if (srIdx == 3) return null
    val rate = version match {
      case 1 => Array(44100, 48000, 32000)(srIdx)
      case 2 => Array(22050, 24000, 16000)(srIdx)
      case _ => Array(11025, 12000, 8000)(srIdx)
    }
    val padding = (b(pos + 2) >> 1) & 1
    val mode = (b(pos + 3) >> 6) & 3
    val modeExt = (b(pos + 3) >> 4) & 3
    val frameLen =
      if (version == 1) 144000 * kbps / rate + padding
      else 72000 * kbps / rate + padding
    if (frameLen < 4 || pos + frameLen > b.length) return null
    new Header(version, rate, kbps, if (mode == 3) 1 else 2, mode,
      modeExt, (b(pos + 1) & 1) == 0, frameLen)
  }

  /** ISO 11172-3 §2.4.3.1 crc_check: CRC-16 (poly 0x8005, init
    * 0xFFFF, MSB-first) over header bytes 2-3 plus the side info —
    * exactly the bits the spec protects for Layer III. Public for the
    * writer and the spec's independent pin vectors. */
  def crc16(bytes: Iterator[Byte], init: Int = 0xffff): Int = {
    var crc = init
    bytes.foreach { byte =>
      var k = 7
      while (k >= 0) {
        val bit = (byte >> k) & 1
        val carry = (crc >>> 15) & 1
        crc = (crc << 1) & 0xffff
        if ((carry ^ bit) == 1) crc ^= 0x8005
        k -= 1
      }
    }
    crc
  }

  private def readSideInfo(
      b: Array[Byte], off: Int, h: Header): (Array[Array[GrInfo]], Int) = {
    val bits = new Bits(b, off * 8)
    val lsf = h.version != 1
    val nGr = if (lsf) 1 else 2
    val nCh = h.channels
    val mainDataBegin = bits.get(if (lsf) 8 else 9)
    bits.get(if (lsf) (if (nCh == 1) 1 else 2) else (if (nCh == 1) 5 else 3))
    val scfsi = Array.ofDim[Int](nCh, 4)
    if (!lsf) {
      var c = 0
      while (c < nCh) {
        var i = 0
        while (i < 4) { scfsi(c)(i) = bits.get1(); i += 1 }
        c += 1
      }
    }
    val grs = Array.fill(nGr, nCh)(new GrInfo)
    var g = 0
    while (g < nGr) {
      var c = 0
      while (c < nCh) {
        val gr = grs(g)(c)
        gr.part23 = bits.get(12)
        gr.bigValues = bits.get(9)
        gr.globalGain = bits.get(8)
        gr.scalefacCompress = bits.get(if (lsf) 9 else 4)
        gr.windowSwitching = bits.get1() == 1
        if (gr.windowSwitching) {
          gr.blockType = bits.get(2)
          gr.mixedBlock = bits.get1() == 1
          gr.tableSelect(0) = bits.get(5)
          gr.tableSelect(1) = bits.get(5)
          gr.tableSelect(2) = 0 // no region2 under window switching
          gr.subblockGain(0) = bits.get(3)
          gr.subblockGain(1) = bits.get(3)
          gr.subblockGain(2) = bits.get(3)
          // fixed regions under window switching (ISO 11172-3 2.4.2.7)
          gr.region0 = if (gr.blockType == 2 && !gr.mixedBlock) 8 else 7
          gr.region1 = 36 // sentinel: region1 runs to the end
        } else {
          gr.blockType = 0
          gr.tableSelect(0) = bits.get(5)
          gr.tableSelect(1) = bits.get(5)
          gr.tableSelect(2) = bits.get(5)
          gr.region0 = bits.get(4)
          gr.region1 = bits.get(3)
        }
        if (!lsf) gr.preflag = bits.get1()
        gr.scalefacScale = bits.get1()
        gr.count1Sel = bits.get1()
        // scfsi carried via closure below
        c += 1
      }
      g += 1
    }
    // stash scfsi on the granule-1 infos (MPEG-1 only)
    if (!lsf) {
      var c = 0
      while (c < nCh) {
        grs(1)(c).scfsiStore = scfsi(c)
        c += 1
      }
    }
    (grs, mainDataBegin)
  }

  // ------------------------------------------------------ main decode

  /** Decode an MP3 stream to interleaved PCM16. None on anything the
    * honest subset cannot prove out (see the object scaladoc). */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try decodeWithStats(bytes).map(_._1)
    catch { case _: Exception => None }

  /** Decode accounting (frame/granule/bit-exactness) without keeping
    * the PCM. */
  def stats(bytes: Array[Byte]): Option[Stats] =
    try decodeWithStats(bytes).map(_._2)
    catch { case _: Exception => None }

  /** Huffman-table TRIAGE over side info only — no entropy decode, no
    * reservoir: how much of a file's granule-channels the shipped
    * table subset (1-10 + count1, FIXTURES.md §5) can decode, and
    * which unshipped family blocks the rest. A granule-channel counts
    * toward `shipped` iff none of its USED big-values regions (a
    * region is used when it starts below bigValues*2) selects an
    * unshipped table; otherwise it counts toward EVERY family it
    * uses: 11-15 (no linbits), 16-23 / 24-31 (the two linbits
    * families; 17-23 and 25-31 reuse 16/24's codes), and `invalid`
    * for the reserved ids 4/14. part2_3_length == 0 granules are
    * silent and always decodable. This measures TABLE coverage only —
    * the walk applies the same framing checks as decode (header
    * coherence, side-info fit) but not CRC or payload accounting. */
  final case class Coverage(
      frames: Int, granuleChannels: Int, shipped: Int,
      fam11_15: Int, fam16_23: Int, fam24_31: Int, invalid: Int)

  def coverage(bytes: Array[Byte]): Option[Coverage] =
    try coverage0(bytes) catch { case _: Exception => None }

  private def coverage0(bytes: Array[Byte]): Option[Coverage] = {
    if (bytes == null || bytes.length < 4) return None
    var pos = 0
    var end = bytes.length
    if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if (bytes.length < 10) return None
      if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0) return None
      pos = 10 + (((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f))
      if (pos >= end) return None
    }
    if (end - pos > 128 && bytes(end - 128) == 'T' &&
      bytes(end - 127) == 'A' && bytes(end - 126) == 'G') end -= 128
    var rate = 0; var nCh = 0
    var frames = 0; var gch = 0; var shipped = 0
    var f11 = 0; var f16 = 0; var f24 = 0; var inv = 0
    while (pos + 4 <= end) {
      val h = parseHeader(bytes, pos)
      if (h == null) return None
      if (rate == 0) { rate = h.sampleRate; nCh = h.channels }
      else if (rate != h.sampleRate || nCh != h.channels) return None
      val lsf = h.version != 1
      val sideLen =
        if (lsf) (if (nCh == 1) 9 else 17) else (if (nCh == 1) 17 else 32)
      val crcLen = if (h.crc) 2 else 0
      if (pos + 4 + crcLen + sideLen > pos + h.frameLen) return None
      val (grs, _) = readSideInfo(bytes, pos + 4 + crcLen, h)
      val sfbL = Mp3Tables.SfbLong(h.sampleRate)
      grs.foreach(_.foreach { gr =>
        gch += 1
        var g11 = false; var g16 = false; var g24 = false
        var gInv = false
        if (gr.part23 > 0 && gr.bigValues > 0) {
          val bigEnd = math.min(gr.bigValues * 2, 576)
          val starts =
            if (gr.windowSwitching)
              Array(0, wsRegion1Start(gr.blockType, gr.mixedBlock,
                h.sampleRate), 576)
            else Array(0, sfbL(math.min(gr.region0 + 1, 22)),
              sfbL(math.min(gr.region0 + 1 + gr.region1 + 1, 22)))
          var r = 0
          while (r < 3) {
            if (starts(r) < bigEnd) {
              val tab = gr.tableSelect(r)
              if (tab != 0 && !Mp3Tables.Huff.contains(tab)) {
                if (tab == 4 || tab == 14) gInv = true
                else if (tab <= 15) g11 = true
                else if (tab <= 23) g16 = true
                else g24 = true
              }
            }
            r += 1
          }
        }
        if (g11) f11 += 1
        if (g16) f16 += 1
        if (g24) f24 += 1
        if (gInv) inv += 1
        if (!(g11 || g16 || g24 || gInv)) shipped += 1
      })
      frames += 1
      pos += h.frameLen
    }
    if (frames < 1 || pos != end) return None
    Some(Coverage(frames, gch, shipped, f11, f16, f24, inv))
  }

  def decodeWithStats(bytes: Array[Byte]): Option[(Decoded, Stats)] = {
    if (bytes == null || bytes.length < 4) return None
    var pos = 0
    var end = bytes.length
    // ID3v2 prefix
    if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if (bytes.length < 10) return None
      if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0) return None
      pos = 10 + (((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f))
      if (pos >= end) return None
    }
    // ID3v1 trailer
    if (end - pos > 128 && bytes(end - 128) == 'T' &&
      bytes(end - 127) == 'A' && bytes(end - 126) == 'G') end -= 128

    var rate = 0; var nCh = 0
    val pcmOut = new java.io.ByteArrayOutputStream()
    var frames = 0; var granules = 0; var bitsExact = 0; var resSilent = 0

    // bit reservoir: all main-data bytes seen so far, in stream order
    val reservoir = new java.io.ByteArrayOutputStream()
    // per-frame pending granule descriptors (decoded once the
    // reservoir holds their bytes): (grInfo, header, startBitInRes)
    var mdTotal = 0

    // decoder state that persists across frames
    var st: ChannelState = null

    while (pos + 4 <= end) {
      val h = parseHeader(bytes, pos)
      if (h == null) return None
      if (rate == 0) { rate = h.sampleRate; nCh = h.channels }
      else if (rate != h.sampleRate || nCh != h.channels) return None
      if (st == null) st = new ChannelState(nCh)
      val lsf = h.version != 1
      val sideLen =
        if (lsf) (if (nCh == 1) 9 else 17) else (if (nCh == 1) 17 else 32)
      val crcLen = if (h.crc) 2 else 0
      if (pos + 4 + crcLen + sideLen > pos + h.frameLen) return None
      if (h.crc) {
        // a protected frame whose CRC disagrees is corrupt: fail the
        // file (validator stance), never decode garbled side info
        val stored = ((bytes(pos + 4) & 0xff) << 8) | (bytes(pos + 5) & 0xff)
        val computed = crc16(
          (Iterator(bytes(pos + 2), bytes(pos + 3)) ++
            (0 until sideLen).iterator.map(i => bytes(pos + 6 + i))))
        if (stored != computed) return None
      }
      val (grs, mainDataBegin) = readSideInfo(bytes, pos + 4 + crcLen, h)
      // block_type 0 under window switching is forbidden (2.4.2.7)
      if (grs.exists(_.exists(g => g.windowSwitching && g.blockType == 0)))
        return None
      // honest-subset reject: at MPEG-2.5 8 kHz no short-band boundary
      // falls on the mixed long/short seam (3*sfbS(3) = 72, not 36),
      // so the requantize/reorder/stereo geometry this decoder shares
      // with every other rate would scale an 8 kHz mixed granule from
      // the wrong band offsets. Reject the file rather than decode it
      // wrong (same stance as unshipped Huffman tables).
      if (h.sampleRate == 8000 &&
          grs.exists(_.exists(g => g.windowSwitching && g.mixedBlock)))
        return None
      val mdStart = pos + 4 + crcLen + sideLen
      val mdLen = h.frameLen - 4 - crcLen - sideLen
      reservoir.write(bytes, mdStart, mdLen)
      val res = reservoir.toByteArray // bounded: trimmed below
      mdTotal += mdLen
      // this frame's granule data starts main_data_begin bytes before
      // its own main data; in the (possibly trimmed) res coordinate:
      val startByte = res.length - mdLen - mainDataBegin

      val nGr = if (lsf) 1 else 2
      if (startByte < 0) {
        // reservoir does not reach back (stream head): silence
        var g = 0
        while (g < nGr) {
          st.silentGranule()
          pcmOut.write(st.renderPcm())
          granules += 1; resSilent += 1
          g += 1
        }
      } else {
        val br = new Bits(res, startByte * 8)
        var g = 0
        while (g < nGr) {
          var c = 0
          val xr = Array.ofDim[Double](nCh, 576)
          var ok = true
          while (c < nCh && ok) {
            val gr = grs(g)(c)
            val startBits = br.pos
            if (gr.part23 == 0) {
              java.util.Arrays.fill(gr.scalefacL, 0)
              var w = 0
              while (w < 13) {
                java.util.Arrays.fill(gr.scalefacS(w), 0); w += 1
              }
              // spectrum stays zero; a zero-bit granule is exact
              bitsExact += 1
            } else {
              if (br.pos + gr.part23 > br.end) return None
              val intensityCh = lsf && c == 1 && h.mode == 1 &&
                (h.modeExt & 1) == 1
              val part2 =
                if (lsf) readScalefacLsf(br, gr, intensityCh)
                else readScalefacV1(br, gr, grs(0)(c), g)
              if (part2 < 0 || part2 > gr.part23) return None
              ok = huffmanDecode(br, gr, h, startBits, xr(c))
              if (ok) {
                if (br.pos != startBits + gr.part23) return None
                bitsExact += 1
              }
            }
            c += 1
          }
          if (!ok) return None
          // requantize AFTER both channels read (stereo needs both)
          var cc = 0
          val isRaw = xr // xr currently holds raw is[] values
          val xq = Array.ofDim[Double](nCh, 576)
          while (cc < nCh) {
            requantize(grs(g)(cc), h, isRaw(cc), xq(cc))
            cc += 1
          }
          if (nCh == 2) stereo(grs(g), h, isRaw, xq)
          cc = 0
          while (cc < nCh) {
            val gr = grs(g)(cc)
            reorderShort(gr, h, xq(cc))
            alias(gr, xq(cc))
            st.hybrid(cc, gr, xq(cc))
            cc += 1
          }
          pcmOut.write(st.renderPcm())
          granules += 1
          g += 1
        }
      }
      // trim the reservoir: at most 511 bytes of history are
      // addressable (9-bit main_data_begin), keep a safe 2x margin
      if (reservoir.size() > 4096) {
        val r = reservoir.toByteArray
        reservoir.reset()
        reservoir.write(r, r.length - 2048, 2048)
      }
      frames += 1
      pos += h.frameLen
    }
    if (frames < 1 || pos != end) return None
    val raw = pcmOut.toByteArray
    val pcm = new Array[Short](raw.length / 2)
    var i = 0
    while (i < pcm.length) {
      pcm(i) = (((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)).toShort
      i += 1
    }
    val dec = Decoded(rate, nCh, pcm)
    Some((dec, Stats(frames, granules, bitsExact, resSilent, rate, nCh,
      pcm.length.toLong / nCh)))
  }

  // ---------------------------------------------------- scalefactors

  /** MPEG-1 scalefactors (Table B.5 slens, scfsi band sharing on
    * granule 1). Returns bits consumed, or -1 on malformed input. */
  private def readScalefacV1(
      br: Bits, gr: GrInfo, gr0: GrInfo, g: Int): Int = {
    val start = br.pos
    val s1 = Mp3Tables.Slen1(gr.scalefacCompress)
    val s2 = Mp3Tables.Slen2(gr.scalefacCompress)
    if (gr.blockType == 2) {
      if (gr.mixedBlock) {
        var b = 0
        while (b < 8) { gr.scalefacL(b) = br.get(s1); b += 1 }
        var s = 3
        while (s < 12) {
          val len = if (s < 6) s1 else s2
          var w = 0
          while (w < 3) { gr.scalefacS(s)(w) = br.get(len); w += 1 }
          s += 1
        }
      } else {
        var s = 0
        while (s < 12) {
          val len = if (s < 6) s1 else s2
          var w = 0
          while (w < 3) { gr.scalefacS(s)(w) = br.get(len); w += 1 }
          s += 1
        }
      }
    } else {
      val scfsi =
        if (gr.scfsiStore == null) Array(0, 0, 0, 0) else gr.scfsiStore
      var b = 0
      while (b < 21) {
        val group = if (b < 6) 0 else if (b < 11) 1 else if (b < 16) 2 else 3
        val len = if (b < 11) s1 else s2
        if (g == 1 && scfsi(group) == 1) gr.scalefacL(b) = gr0.scalefacL(b)
        else gr.scalefacL(b) = br.get(len)
        b += 1
      }
    }
    br.pos - start
  }

  /** LSF scalefactors (ISO 13818-3 2.4.3.2): scalefac_compress
    * decomposes into four slens + a band partition by range; the
    * intensity channel uses the >>1 halved compress and its own
    * partitions. Sets preflag for the 500-511 range. */
  private def readScalefacLsf(
      br: Bits, gr: GrInfo, intensity: Boolean): Int = {
    val start = br.pos
    val slen = new Array[Int](4)
    val sfc0 = gr.scalefacCompress
    var rowKey: String = null
    if (!intensity) {
      if (sfc0 < 400) {
        slen(0) = (sfc0 >> 4) / 5; slen(1) = (sfc0 >> 4) % 5
        slen(2) = (sfc0 & 15) >> 2; slen(3) = sfc0 & 3
        gr.preflag = 0; rowKey = "n0"
      } else if (sfc0 < 500) {
        val s = sfc0 - 400
        slen(0) = (s >> 2) / 5; slen(1) = (s >> 2) % 5
        slen(2) = s & 3; slen(3) = 0
        gr.preflag = 0; rowKey = "n1"
      } else {
        val s = sfc0 - 500
        slen(0) = s / 3; slen(1) = s % 3; slen(2) = 0; slen(3) = 0
        gr.preflag = 1; rowKey = "n2"
      }
    } else {
      val is = sfc0 >> 1
      if (is < 180) {
        slen(0) = is / 36; slen(1) = (is % 36) / 6; slen(2) = is % 6
        slen(3) = 0; gr.preflag = 0; rowKey = "i0"
      } else if (is < 244) {
        val s = is - 180
        slen(0) = (s & 63) >> 4; slen(1) = (s & 15) >> 2; slen(2) = s & 3
        slen(3) = 0; gr.preflag = 0; rowKey = "i1"
      } else {
        val s = is - 244
        slen(0) = s / 3; slen(1) = s % 3; slen(2) = 0; slen(3) = 0
        gr.preflag = 0; rowKey = "i2"
      }
    }
    val (nrN, nrS, nrM) = Mp3Tables.LsfNrOfSfb(rowKey)
    val nr =
      if (gr.blockType == 2 && gr.windowSwitching)
        (if (gr.mixedBlock) nrM else nrS)
      else nrN
    // read sequentially into the long array / short matrix
    if (gr.blockType == 2 && gr.windowSwitching && !gr.mixedBlock) {
      var slot = 0 // (sfb, window) slots in order
      var p = 0
      while (p < 4) {
        var k = 0
        while (k < nr(p)) {
          gr.scalefacS(slot / 3)(slot % 3) =
            if (slen(p) == 0) 0 else br.get(slen(p))
          slot += 1; k += 1
        }
        p += 1
      }
    } else if (gr.blockType == 2 && gr.windowSwitching) {
      // mixed: a flat counter routes the first 6 values to the long
      // bands (sfb 0-5) and everything after to the short slots from
      // sfb 3 — INDEPENDENT of the partition boundaries. The n2 row's
      // mixed partitions are {15,18,0,0}: its first partition crosses
      // the long/short boundary, so "partition 0 == long bands" would
      // misroute 9 scalefactors into scalefacL(6..14) and leave short
      // slots 18..35 zero with bit accounting still exact (silently
      // wrong PCM).
      var p = 0; var b = 0; var slot = 9 // long sfb0; short sfb3,w0
      while (p < 4) {
        var k = 0
        while (k < nr(p)) {
          val v = if (slen(p) == 0) 0 else br.get(slen(p))
          if (b < 6) { gr.scalefacL(b) = v; b += 1 }
          else { gr.scalefacS(slot / 3)(slot % 3) = v; slot += 1 }
          k += 1
        }
        p += 1
      }
    } else {
      var b = 0; var p = 0
      while (p < 4) {
        var k = 0
        while (k < nr(p)) {
          val v = if (slen(p) == 0) 0 else br.get(slen(p))
          if (b < 22) gr.scalefacL(b) = v
          b += 1; k += 1
        }
        p += 1
      }
    }
    br.pos - start
  }

  // -------------------------------------------------------- huffman

  /** Flat lookup decoders built once per table: bits -> (x, y, len). */
  private lazy val huffLut: Map[Int, (Int, Array[Int], Int)] = // (maxLen, lut, ylen)
    Mp3Tables.Huff.map { case (id, (xl, yl, packed)) =>
      val maxLen = packed.map(_ >>> 16).max
      val lut = new Array[Int](1 << maxLen)
      var x = 0
      while (x < xl) {
        var y = 0
        while (y < yl) {
          val e = packed(x * yl + y)
          val len = e >>> 16
          val code = e & 0xffff
          val shift = maxLen - len
          var fill = 0
          while (fill < (1 << shift)) {
            lut((code << shift) | fill) = (x << 12) | (y << 4) | len
            fill += 1
          }
          y += 1
        }
        x += 1
      }
      id -> ((maxLen, lut, yl))
    }

  private lazy val count1Lut: Array[Array[Int]] = Array(
    buildCount1(Mp3Tables.Count1A), buildCount1(Mp3Tables.Count1B))

  private def buildCount1(packed: Array[Int]): Array[Int] = {
    val maxLen = packed.map(_ >>> 16).max // 6 for A, 4 for B
    val lut = new Array[Int](1 << maxLen)
    var i = 0
    while (i < 16) {
      val len = packed(i) >>> 16
      val code = packed(i) & 0xffff
      val shift = maxLen - len
      var fill = 0
      while (fill < (1 << shift)) {
        lut((code << shift) | fill) = (i << 4) | len
        fill += 1
      }
      i += 1
    }
    lut
  }

  private def peek(br: Bits, n: Int): Int = {
    val save = br.pos
    val avail = math.min(n, br.end - br.pos)
    var v = br.get(avail) << (n - avail)
    br.pos = save
    v
  }

  /** Decode big_values pairs + count1 quadruples into is[576] (raw
    * integer values as doubles, signed). Exact part2_3_length
    * accounting: the count1 quadruple that would cross the boundary
    * is rolled back (2.4.3.4.4); big-values overrun fails the file.
    * Returns false if an unshipped table is selected or the stream
    * overruns. */
  /** Big-values region-1 start (line index) for window-switching
    * granules, where region0_count is implicit (2.4.2.7): 8 for pure
    * short blocks — 9 short band-slots, 3*sfbShort(3) = 36 at every
    * rate except MPEG-2.5 8 kHz (72) — and 7 otherwise (block type
    * 1/3 and mixed blocks) — sfbLong(8) = 36 at MPEG-1 rates but 54
    * at the LSF rates. The flat 36 both the decoder and the writer
    * used before r12 was only correct at MPEG-1 rates: at LSF it
    * decoded lines 36..53 of a start/stop block with tableSelect(1)
    * instead of tableSelect(0). Shared with [[Mp3FramesWriter]] so
    * the serializer mirrors the split (the independent reference
    * pipeline consumes field values, never this boundary). */
  private[operators] def wsRegion1Start(
      blockType: Int, mixed: Boolean, sampleRate: Int): Int =
    if (blockType == 2 && !mixed) 3 * Mp3Tables.SfbShort(sampleRate)(3)
    else Mp3Tables.SfbLong(sampleRate)(8)

  private def huffmanDecode(
      br: Bits, gr: GrInfo, h: Header, startBits: Int,
      out: Array[Double]): Boolean = {
    val limit = startBits + gr.part23
    val sfb = Mp3Tables.SfbLong(h.sampleRate)
    // region boundaries in line indices
    val (r1Start, r2Start) =
      if (gr.windowSwitching)
        (wsRegion1Start(gr.blockType, gr.mixedBlock, h.sampleRate), 576)
      else (sfb(math.min(gr.region0 + 1, 22)),
        sfb(math.min(gr.region0 + 1 + gr.region1 + 1, 22)))
    val bigEnd = math.min(gr.bigValues * 2, 576)
    var i = 0
    while (i < bigEnd) {
      val region = if (i < r1Start) 0 else if (i < r2Start) 1 else 2
      val tab = gr.tableSelect(region)
      if (tab == 0) {
        out(i) = 0.0; out(i + 1) = 0.0
        i += 2
      } else {
        val lutEntry = huffLut.get(tab) match {
          case Some(t) => t
          case None => return false // unshipped table: honest reject
        }
        val (maxLen, lut, _) = lutEntry
        if (br.pos >= limit) return false
        val e = lut(peek(br, maxLen))
        val len = e & 0xf
        if (len == 0) return false
        br.pos += len
        // (linbits escapes live in the unshipped 16-31 families; the
        // shipped tables top out below the 15-escape, so no escape
        // read is reachable here)
        var x = (e >> 12) & 0xff
        var y = (e >> 4) & 0xff
        if (x != 0) {
          if (br.pos >= limit) return false
          if (br.get1() == 1) x = -x
        }
        if (y != 0) {
          if (br.pos >= limit) return false
          if (br.get1() == 1) y = -y
        }
        if (br.pos > limit) return false
        out(i) = x.toDouble
        out(i + 1) = y.toDouble
        i += 2
      }
    }
    // count1 region
    val lut = count1Lut(gr.count1Sel)
    val maxLen = if (gr.count1Sel == 0) 6 else 4
    var stop = false
    while (!stop && br.pos < limit && i <= 572) {
      val save = br.pos
      val e = lut(peek(br, maxLen))
      val len = e & 0xf
      br.pos += len
      val q = (e >> 4) & 0xf
      val vals = new Array[Int](4)
      vals(0) = (q >> 3) & 1; vals(1) = (q >> 2) & 1
      vals(2) = (q >> 1) & 1; vals(3) = q & 1
      var k = 0
      var bad = br.pos > limit
      while (k < 4 && !bad) {
        if (vals(k) != 0) {
          if (br.pos >= limit || br.pos >= br.end) bad = true
          else if (br.get1() == 1) vals(k) = -vals(k)
        }
        k += 1
      }
      if (bad) {
        // the quadruple crossing the boundary is discarded (spec:
        // 2.4.3.4.4 — the encoder may let count1 overrun part2_3)
        br.pos = save
        stop = true
      } else {
        out(i) = vals(0); out(i + 1) = vals(1)
        out(i + 2) = vals(2); out(i + 3) = vals(3)
        i += 4
      }
    }
    // any unread gap up to part2_3_length is stuffing only when the
    // count1 rollback fired; land the cursor exactly on the boundary
    if (br.pos > limit) return false
    br.pos = limit
    true
  }

  // ------------------------------------------------------ requantize

  private val Pow43 = Array.tabulate(8207)(i => math.pow(i, 4.0 / 3.0))

  private def pow43(v: Double): Double = {
    val a = math.abs(v)
    val m = if (a < 8207) Pow43(a.toInt) else math.pow(a, 4.0 / 3.0)
    if (v < 0) -m else m
  }

  /** Power-law requantization (2.4.3.4.7): per-band scaling from
    * global_gain, subblock_gain, scalefac (+pretab under preflag),
    * halved or full steps by scalefac_scale. */
  private def requantize(
      gr: GrInfo, h: Header, is: Array[Double], xr: Array[Double]): Unit = {
    val mul = if (gr.scalefacScale == 1) 1.0 else 0.5
    val sfbL = Mp3Tables.SfbLong(h.sampleRate)
    val sfbS = Mp3Tables.SfbShort(h.sampleRate)
    val gg = gr.globalGain - 210
    if (gr.blockType == 2 && gr.windowSwitching) {
      val longEnd = if (gr.mixedBlock) 36 else 0
      // long head of a mixed block
      var i = 0
      var band = 0
      while (i < longEnd) {
        if (i == sfbL(band + 1)) band += 1
        val pre = if (gr.preflag == 1) Mp3Tables.Pretab(band) else 0
        val exp = gg / 4.0 - mul * (gr.scalefacL(band) + pre)
        xr(i) = pow43(is(i)) * math.pow(2.0, exp)
        i += 1
      }
      // short region: is[] is still in huffman order (sfb, window,
      // line) — scale BEFORE reorder using that order
      var sband = if (gr.mixedBlock) 3 else 0
      i = longEnd
      while (i < 576 && sband < 13) {
        val width = sfbS(sband + 1) - sfbS(sband)
        var w = 0
        while (w < 3) {
          val exp = (gg - 8 * gr.subblockGain(w)) / 4.0 -
            mul * gr.scalefacS(sband)(w)
          val f = math.pow(2.0, exp)
          var l = 0
          while (l < width && i < 576) {
            xr(i) = pow43(is(i)) * f
            i += 1; l += 1
          }
          w += 1
        }
        sband += 1
      }
      while (i < 576) { xr(i) = 0.0; i += 1 }
    } else {
      var i = 0
      var band = 0
      while (i < 576) {
        if (band < 21 && i == sfbL(band + 1)) band += 1
        val pre = if (gr.preflag == 1) Mp3Tables.Pretab(band) else 0
        val exp = gg / 4.0 - mul * (gr.scalefacL(band) + pre)
        xr(i) = pow43(is(i)) * math.pow(2.0, exp)
        i += 1
      }
    }
  }

  // ---------------------------------------------------------- stereo

  /** MS and intensity stereo (2.4.3.4.9). MS: mid/side over sqrt(2),
    * applied everywhere OUTSIDE the intensity region (intensity bands
    * pan from the RAW left value, so MS must not touch them; an
    * illegal-is_pos band — position 7 under MPEG-1 — stays as-is and
    * is still excluded from MS).
    *
    * Long blocks: one bound at the first scalefactor band lying
    * entirely in the right channel's zero tail; bands from there up
    * pan by scalefacL is_pos (the top band above the last transmitted
    * scalefactor reads is_pos 0).
    *
    * Short blocks (r12): PER-WINDOW bounds over the short bands —
    * window w's intensity region starts at the first short band with
    * no nonzero right-channel line at or above it IN THAT WINDOW, and
    * pans by is_pos = scalefacS(sfb)(w). The short region is still in
    * huffman (sfb, window, line) order here (stereo runs before
    * reorderShort), where band b / window w occupies
    * [3*sfbS(b) + w*width, +width) — the same layout requantize
    * walked. A mixed block whose right channel is zero across the
    * WHOLE short region extends the intensity region into the long
    * head with long-band is_pos. (Mixed blocks at 8 kHz are rejected
    * at side-info time — see the decode loop — so 3*sfbS(3) == 36
    * holds for every granule that reaches this code.) */
  private def stereo(
      grs: Array[GrInfo], h: Header, isRaw: Array[Array[Double]],
      xq: Array[Array[Double]]): Unit = {
    if (h.mode != 1) return
    val ms = (h.modeExt & 2) == 2
    val intensity = (h.modeExt & 1) == 1
    val n = 576
    val gr = grs(1)
    val lsf = h.version != 1

    // is_pos -> (kl, kr); pan fills [lo, hi) from the raw left value
    def pan(isPos: Int, lo: Int, hi: Int): Unit = {
      val illegal = if (lsf) false else isPos == 7
      if (illegal) return
      val (kl, kr) =
        if (lsf) {
          val io = if ((gr.scalefacCompress & 1) == 1)
            math.pow(2.0, -0.25) else math.pow(2.0, -0.5)
          if (isPos == 0) (1.0, 1.0)
          else if ((isPos & 1) == 1)
            (math.pow(io, (isPos + 1) / 2.0), 1.0)
          else (1.0, math.pow(io, isPos / 2.0))
        } else {
          val ratio = math.tan(isPos * math.Pi / 12.0)
          (ratio / (1.0 + ratio), 1.0 / (1.0 + ratio))
        }
      var i = lo
      while (i < hi) {
        val v = xq(0)(i)
        xq(0)(i) = v * kl
        xq(1)(i) = v * kr
        i += 1
      }
    }

    // inIs(i): line i belongs to the intensity region (excluded from
    // MS whether or not its band's is_pos was legal to pan)
    val inIs = new Array[Boolean](n)
    if (intensity) {
      val sfbL = Mp3Tables.SfbLong(h.sampleRate)
      if (gr.blockType == 2 && gr.windowSwitching) {
        val sfbS = Mp3Tables.SfbShort(h.sampleRate)
        val startBand = if (gr.mixedBlock) 3 else 0
        val longEnd = if (gr.mixedBlock) 36 else 0
        def blockLo(b: Int, w: Int): Int =
          3 * sfbS(b) + w * (sfbS(b + 1) - sfbS(b))
        var allShortZero = true
        var w = 0
        while (w < 3) {
          var bound = 13
          var b = 12
          var stop = false
          while (!stop && b >= startBand) {
            val width = sfbS(b + 1) - sfbS(b)
            val lo = blockLo(b, w)
            var nz = false
            var l = 0
            while (l < width && !nz) {
              if (isRaw(1)(lo + l) != 0.0) nz = true
              l += 1
            }
            if (nz) stop = true else { bound = b; b -= 1 }
          }
          if (bound > startBand) allShortZero = false
          b = bound
          while (b <= 12) {
            val width = sfbS(b + 1) - sfbS(b)
            val lo = blockLo(b, w)
            java.util.Arrays.fill(inIs, lo, lo + width, true)
            pan(gr.scalefacS(b)(w), lo, lo + width)
            b += 1
          }
          w += 1
        }
        if (gr.mixedBlock && allShortZero) {
          // the zero tail reaches below the short region: continue
          // into the long head with long-band is_pos
          var boundLine = longEnd
          while (boundLine > 0 && isRaw(1)(boundLine - 1) == 0.0)
            boundLine -= 1
          var band = 0
          while (band < 22 && sfbL(band) < boundLine) band += 1
          while (band < 22 && sfbL(band) < longEnd) {
            val lo = sfbL(band)
            val hi = math.min(sfbL(band + 1), longEnd)
            java.util.Arrays.fill(inIs, lo, hi, true)
            pan(gr.scalefacL(band), lo, hi)
            band += 1
          }
        }
      } else {
        var boundLine = n
        while (boundLine > 0 && isRaw(1)(boundLine - 1) == 0.0)
          boundLine -= 1
        var band = 0
        while (band < 22 && sfbL(band) < boundLine) band += 1
        while (band < 22) {
          val lo = sfbL(band)
          val hi = sfbL(band + 1)
          java.util.Arrays.fill(inIs, lo, hi, true)
          pan(gr.scalefacL(band), lo, hi)
          band += 1
        }
      }
    }
    if (ms) {
      val invSqrt2 = 1.0 / math.sqrt(2.0)
      var i = 0
      while (i < n) {
        if (!inIs(i)) {
          val m = xq(0)(i); val s = xq(1)(i)
          xq(0)(i) = (m + s) * invSqrt2
          xq(1)(i) = (m - s) * invSqrt2
        }
        i += 1
      }
    }
  }

  // --------------------------------------------------------- reorder

  /** Short-block reorder (2.4.3.4.8): huffman order (sfb, window,
    * line) -> line-interleaved window order the hybrid filterbank
    * consumes. */
  private def reorderShort(
      gr: GrInfo, h: Header, xr: Array[Double]): Unit = {
    if (!(gr.blockType == 2 && gr.windowSwitching)) return
    val sfbS = Mp3Tables.SfbShort(h.sampleRate)
    val start = if (gr.mixedBlock) 36 else 0
    val startBand = if (gr.mixedBlock) 3 else 0
    val tmp = new Array[Double](576 - start)
    var i = start
    var band = startBand
    while (band < 13 && i < 576) {
      val lo = sfbS(band)
      val width = sfbS(band + 1) - lo
      var w = 0
      while (w < 3) {
        var l = 0
        while (l < width) {
          val dst = 3 * lo + 3 * l + w - start
          if (i < 576 && dst >= 0 && dst < tmp.length) tmp(dst) = xr(i)
          i += 1; l += 1
        }
        w += 1
      }
      band += 1
    }
    System.arraycopy(tmp, 0, xr, start, tmp.length)
  }

  // ----------------------------------------------------------- alias

  private val AliasCs = new Array[Double](8)
  private val AliasCa = new Array[Double](8)
  locally {
    val ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
      -0.0037)
    var i = 0
    while (i < 8) {
      val d = math.sqrt(1.0 + ci(i) * ci(i))
      AliasCs(i) = 1.0 / d
      AliasCa(i) = ci(i) / d
      i += 1
    }
  }

  /** Alias-reduction butterflies (2.4.3.4.10.1) on every long
    * subband boundary (one boundary for the long head of a mixed
    * block, none for pure short). */
  private def alias(gr: GrInfo, xr: Array[Double]): Unit = {
    val nB =
      if (gr.blockType == 2 && gr.windowSwitching)
        (if (gr.mixedBlock) 1 else 0)
      else 31
    var b = 0
    while (b < nB) {
      var i = 0
      while (i < 8) {
        val lo = 18 * b + 17 - i
        val hi = 18 * b + 18 + i
        val a = xr(lo); val c = xr(hi)
        xr(lo) = a * AliasCs(i) - c * AliasCa(i)
        xr(hi) = c * AliasCs(i) + a * AliasCa(i)
        i += 1
      }
      b += 1
    }
  }

  // ------------------------------------------- hybrid + synthesis

  /** Per-channel persistent filterbank state: IMDCT overlap and the
    * polyphase V FIFO, plus the granule's 18x32 time-sample matrix. */
  private final class ChannelState(nCh: Int) {
    val overlap = Array.ofDim[Double](nCh, 32, 18)
    val v = Array.ofDim[Double](nCh, 1024)
    val slots = Array.ofDim[Double](nCh, 18, 32)
    private val pcmBuf = new Array[Double](18 * 32 * nCh)
    var channels: Int = nCh

    def silentGranule(): Unit = {
      var c = 0
      while (c < channels) {
        // zero spectrum still flushes the overlap + FIFO tails
        hybrid(c, null, null)
        c += 1
      }
    }

    /** IMDCT + window + overlap-add + frequency inversion for one
      * granule of one channel; fills slots(c). */
    def hybrid(c: Int, gr: GrInfo, xr: Array[Double]): Unit = {
      var sb = 0
      while (sb < 32) {
        val bt =
          if (gr == null) 0
          else if (gr.windowSwitching && gr.mixedBlock && sb < 2) 0
          else if (gr.windowSwitching) gr.blockType
          else 0
        val out = Mp3Imdct.imdctBlock(xr, sb, bt)
        val ov = overlap(c)(sb)
        var i = 0
        while (i < 18) {
          var s = out(i) + ov(i)
          ov(i) = out(18 + i)
          // frequency inversion: odd time samples of odd subbands
          if ((sb & 1) == 1 && (i & 1) == 1) s = -s
          slots(c)(i)(sb) = s
          i += 1
        }
        sb += 1
      }
    }

    /** Polyphase synthesis of the granule in `slots`; returns
      * big-endian PCM16 interleaved bytes. */
    def renderPcm(): Array[Byte] = {
      val out = new Array[Byte](18 * 32 * channels * 2)
      var c = 0
      while (c < channels) {
        var ss = 0
        while (ss < 18) {
          Mp3Synth.synth(v(c), slots(c)(ss), pcmBuf, (ss * 32) * channels + c,
            channels)
          ss += 1
        }
        c += 1
      }
      var i = 0
      while (i < 18 * 32 * channels) {
        val v0 = pcmBuf(i) * 32768.0
        val s = math.max(-32768.0, math.min(32767.0, math.rint(v0))).toInt
        out(2 * i) = ((s >> 8) & 0xff).toByte
        out(2 * i + 1) = (s & 0xff).toByte
        i += 1
      }
      out
    }
  }
}
