package graft.operators

/** REAL MPEG-audio (MP3) frame-header codec — metadata triage for the
  * most common audio format in a web crawl. Audio payload decoding
  * (Huffman + IMDCT + synthesis filterbank) stays behind the honest
  * external-codec seam, but everything a pipeline filters on is fully
  * parsed from the public header layout (ISO/IEC 11172-3):
  *
  *  - optional ID3v2 prefix (syncsafe size) skipped, optional ID3v1
  *    trailer recognized;
  *  - per-frame 4-byte headers: sync, MPEG version (1/2/2.5), layer
  *    (I/II/III), bitrate and sample-rate table lookups, padding,
  *    channel mode;
  *  - the frame-length formulas (layer I: (12·kbps·1000/rate + pad)·4;
  *    layer II and MPEG1 layer III: 144000·kbps/rate + pad; MPEG2/2.5
  *    layer III: 72000·kbps/rate + pad) walk the whole stream, so a
  *    single corrupted frame breaks the parse — this is a real
  *    validator, not a first-header sniff;
  *  - duration from frame count × samples-per-frame / rate.
  *
  * Dirty bytes → None, never a throw; at least two consistent frames
  * are required (a lone 0xFFE sync is a common false positive in
  * arbitrary bytes). Pure `Array[Byte] => Option[Meta]` kernel —
  * rides the scan like every codec here. */
object Mp3 {

  final case class Meta(
      version: String, layer: Int, bitrateKbps: Int, sampleRate: Int,
      channels: Int, nFrames: Int, durationMs: Long, hasId3: Boolean)

  // bitrate tables (kbps), index 1-14; 0 = free (rejected), 15 = bad
  private val brV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val brV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val brV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val brV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val brV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val ratesV1 = Array(44100, 48000, 32000)
  private val ratesV2 = Array(22050, 24000, 16000)
  private val ratesV25 = Array(11025, 12000, 8000)

  def isMp3(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
        ((b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0))

  def meta(bytes: Array[Byte]): Option[Meta] = {
    try meta0(bytes)
    catch { case _: Exception => None }
  }

  private def meta0(b: Array[Byte]): Option[Meta] = {
    if (b == null || b.length < 4) return None
    var pos = 0
    var hasId3 = false
    // ID3v2: 'ID3' vv flags + 4 syncsafe size bytes
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if (b.length < 10) return None
      val s = Array(b(6), b(7), b(8), b(9))
      if (s.exists(x => (x & 0x80) != 0)) return None
      val size = ((s(0) & 0x7f) << 21) | ((s(1) & 0x7f) << 14) |
        ((s(2) & 0x7f) << 7) | (s(3) & 0x7f)
      pos = 10 + size
      if (pos >= b.length) return None
      hasId3 = true
    }
    var end = b.length
    // ID3v1 trailer: 'TAG' + 125 bytes
    if (end - pos > 128 && b(end - 128) == 'T' && b(end - 127) == 'A' &&
      b(end - 126) == 'G') end -= 128

    var version = ""
    var layer = 0
    var firstBitrate = 0
    var sampleRate = 0
    var channels = 0
    var samplesPerFrame = 0
    var nFrames = 0
    while (pos + 4 <= end) {
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xe0) != 0xe0) return None
      val vBits = (b(pos + 1) >> 3) & 3
      val lBits = (b(pos + 1) >> 1) & 3
      if (vBits == 1 || lBits == 0) return None
      val v = vBits match {
        case 3 => "MPEG1"; case 2 => "MPEG2"; case _ => "MPEG2.5"
      }
      val l = 4 - lBits // 3->I(1), 2->II(2), 1->III(3)
      val brIdx = (b(pos + 2) >> 4) & 0xf
      if (brIdx == 0 || brIdx == 15) return None
      val kbps = (vBits, l) match {
        case (3, 1) => brV1L1(brIdx)
        case (3, 2) => brV1L2(brIdx)
        case (3, 3) => brV1L3(brIdx)
        case (_, 1) => brV2L1(brIdx)
        case _ => brV2L23(brIdx)
      }
      val srIdx = (b(pos + 2) >> 2) & 3
      if (srIdx == 3) return None
      val rate = vBits match {
        case 3 => ratesV1(srIdx); case 2 => ratesV2(srIdx)
        case _ => ratesV25(srIdx)
      }
      val padding = (b(pos + 2) >> 1) & 1
      val mode = (b(pos + 3) >> 6) & 3
      val ch = if (mode == 3) 1 else 2
      val spf =
        if (l == 1) 384
        else if (l == 2) 1152
        else if (vBits == 3) 1152 else 576
      val frameLen =
        if (l == 1) (12000 * kbps / rate + padding) * 4
        else if (l == 3 && vBits != 3) 72000 * kbps / rate + padding
        else 144000 * kbps / rate + padding
      if (frameLen < 4 || pos + frameLen > end) return None
      if (nFrames == 0) {
        version = v; layer = l; firstBitrate = kbps; sampleRate = rate
        channels = ch; samplesPerFrame = spf
      } else if (v != version || l != layer || rate != sampleRate ||
        ch != channels) return None // inconsistent stream
      nFrames += 1
      pos += frameLen
    }
    if (pos != end || nFrames < 2) return None
    val durationMs = nFrames.toLong * samplesPerFrame * 1000L / sampleRate
    Some(Meta(version, layer, firstBitrate, sampleRate, channels, nFrames,
      durationMs, hasId3))
  }

  // ---------------------------------------------------------------- writer

  /** Complete MP3 stream: nFrames valid layer-III frames (MPEG1 or
    * MPEG2 by flag) with deterministic filler payloads, an optional
    * ID3v2 prefix and optional ID3v1 trailer — every header field a
    * closed form the SQL oracle re-derives. */
  def mp3WithFrames(id: Long, nFrames: Int, mpeg1: Boolean, brIdx: Int,
      mono: Boolean, id3v2: Boolean, id3v1: Boolean): Array[Byte] = {
    require(nFrames >= 2 && brIdx >= 1 && brIdx <= 14,
      s"nFrames=$nFrames brIdx=$brIdx")
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2) {
      val extra = (id % 7).toInt * 11
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // v2.3, no flags
      out.write((extra >> 21) & 0x7f); out.write((extra >> 14) & 0x7f)
      out.write((extra >> 7) & 0x7f); out.write(extra & 0x7f)
      var i = 0
      while (i < extra) { out.write(((id * 31 + i) & 0xff).toInt); i += 1 }
    }
    val kbps = if (mpeg1) brV1L3(brIdx) else brV2L23(brIdx)
    val rate = if (mpeg1) 44100 else 22050
    var f = 0
    while (f < nFrames) {
      val padding = ((id + f) % 2).toInt
      val frameLen =
        if (mpeg1) 144000 * kbps / rate + padding
        else 72000 * kbps / rate + padding
      out.write(0xff)
      out.write(0xe0 | ((if (mpeg1) 3 else 2) << 3) | (1 << 1)) // layer III
      out.write((brIdx << 4) | (0 << 2) | (padding << 1))
      out.write(((if (mono) 3 else 0) << 6))
      var i = 4
      while (i < frameLen) {
        out.write(((id * 7 + f * 13 + i) & 0xff).toInt); i += 1
      }
      f += 1
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      var i = 0
      while (i < 125) { out.write(((id + i) & 0x7f).toInt); i += 1 }
    }
    out.toByteArray
  }
}
