package graft.operators

/** Ogg container walk (RFC 3533) with Vorbis/Opus identification —
  * the open web audio shapes (.ogg/.opus) a crawl serves beside MP3
  * and WAV. This is the real page grammar, checksummed:
  *
  *  - pages: `OggS` capture + version 0 + header-type flags + 64-bit
  *    granule + serial/sequence + CRC-32 + the lacing segment table;
  *  - the page CRC is VERIFIED per page with Ogg's polynomial
  *    (0x04c11db7, direct/unreflected, init 0, no final xor, crc
  *    field zeroed during computation) — a flipped byte anywhere in a
  *    page fails the file;
  *  - packets: lacing values accumulate, 255 continues a packet into
  *    the next segment (and the continuation flag carries it across
  *    pages), < 255 terminates one;
  *  - codec identification from the first packet: `\x01vorbis`
  *    (channels u8, rate u32-LE) or `OpusHead` (channels u8, pre-skip
  *    u16, input rate u32-LE);
  *  - `last_granule` from the final page — the sample clock a
  *    duration estimate reads (Opus granules always tick at 48 kHz).
  *
  * Dirty bytes → None, never a throw. */
object Ogg {

  final case class Meta(codec: String, channels: Int, sampleRate: Long,
      pages: Int, packets: Int, lastGranule: Long)

  // Ogg CRC-32: direct (unreflected) 0x04c11db7, init 0, no final xor
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  def crc(b: Array[Byte], from: Int, len: Int, zeroAt: Int): Int = {
    var c = 0
    var i = from
    val end = from + len
    while (i < end) {
      val byte = if (i >= zeroAt && i < zeroAt + 4) 0 else b(i) & 0xff
      c = (c << 8) ^ crcTable(((c >>> 24) ^ byte) & 0xff)
      i += 1
    }
    c
  }

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def u64le(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }

  def parse(b: Array[Byte]): Option[Meta] = {
    try parse0(b)
    catch { case _: Exception => None }
  }

  private def parse0(b: Array[Byte]): Option[Meta] = {
    if (b == null || b.length < 28) return None
    var pos = 0
    var pages = 0
    var packets = 0
    var lastGranule = 0L
    var firstSerial = -1L
    var firstPacket: Array[Byte] = null
    var firstPacketBuf: java.io.ByteArrayOutputStream = null
    var midPacket = false
    while (pos < b.length) {
      if (pos + 27 > b.length) return None
      if (!(b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' &&
        b(pos + 3) == 'S')) return None
      if (b(pos + 4) != 0) return None // stream structure version
      val headerType = b(pos + 5) & 0xff
      val granule = u64le(b, pos + 6)
      val serial = u32le(b, pos + 14)
      val nsegs = b(pos + 26) & 0xff
      val segTable = pos + 27
      if (segTable + nsegs > b.length) return None
      var bodyLen = 0
      var i = 0
      while (i < nsegs) { bodyLen += b(segTable + i) & 0xff; i += 1 }
      val body = segTable + nsegs
      if (body + bodyLen > b.length) return None
      // verify the page CRC with the crc field zeroed
      val stored = u32le(b, pos + 22).toInt
      if (crc(b, pos, 27 + nsegs + bodyLen, pos + 22) != stored) return None
      if (firstSerial < 0) firstSerial = serial
      if (serial == firstSerial) {
        lastGranule = granule
        // continuation pages only continue when flagged
        if (midPacket && (headerType & 0x1) == 0) return None
        var segAt = body
        i = 0
        while (i < nsegs) {
          val lace = b(segTable + i) & 0xff
          if (firstPacket == null && pages == 0) {
            if (firstPacketBuf == null)
              firstPacketBuf = new java.io.ByteArrayOutputStream()
            firstPacketBuf.write(b, segAt, lace)
          }
          segAt += lace
          if (lace < 255) {
            packets += 1
            midPacket = false
            if (firstPacket == null && firstPacketBuf != null) {
              firstPacket = firstPacketBuf.toByteArray
            }
          } else midPacket = true
          i += 1
        }
      }
      pos = body + bodyLen
      pages += 1
      if (pages > (1 << 20)) return None
    }
    if (pages == 0 || firstPacket == null) return None
    // codec identification from the first packet
    val fp = firstPacket
    if (fp.length >= 30 && fp(0) == 1 && fp(1) == 'v' && fp(2) == 'o' &&
      fp(3) == 'r' && fp(4) == 'b' && fp(5) == 'i' && fp(6) == 's') {
      val channels = fp(11) & 0xff
      val rate = u32le(fp, 12)
      if (channels < 1 || rate <= 0) return None
      Some(Meta("vorbis", channels, rate, pages, packets, lastGranule))
    } else if (fp.length >= 19 && fp(0) == 'O' && fp(1) == 'p' &&
      fp(2) == 'u' && fp(3) == 's' && fp(4) == 'H' && fp(5) == 'e' &&
      fp(6) == 'a' && fp(7) == 'd') {
      val channels = fp(9) & 0xff
      val rate = u32le(fp, 12) // informational input rate
      if (channels < 1) return None
      Some(Meta("opus", channels, rate, pages, packets, lastGranule))
    } else None
  }

  // ---------------------------------------------------------------- writer

  /** One page's bytes with a correct CRC. */
  def page(headerType: Int, granule: Long, serial: Long, seq: Long,
      laces: Seq[Int], body: Array[Byte]): Array[Byte] = {
    require(laces.forall(l => l >= 0 && l <= 255) && laces.length <= 255)
    require(laces.sum == body.length, "laces must cover the body")
    val out = new Array[Byte](27 + laces.length + body.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(4) = 0
    out(5) = headerType.toByte
    var i = 0
    var g = granule
    while (i < 8) { out(6 + i) = (g & 0xff).toByte; g >>= 8; i += 1 }
    var s = serial
    i = 0
    while (i < 4) { out(14 + i) = (s & 0xff).toByte; s >>= 8; i += 1 }
    var q = seq
    i = 0
    while (i < 4) { out(18 + i) = (q & 0xff).toByte; q >>= 8; i += 1 }
    out(26) = laces.length.toByte
    laces.zipWithIndex.foreach { case (l, j) => out(27 + j) = l.toByte }
    System.arraycopy(body, 0, out, 27 + laces.length, body.length)
    val c = crc(out, 0, out.length, 22)
    i = 0
    var cc = c
    while (i < 4) { out(22 + i) = (cc & 0xff).toByte; cc >>= 8; i += 1 }
    out
  }

  /** A Vorbis identification header packet. */
  def vorbisId(channels: Int, rate: Long): Array[Byte] = {
    val p = new Array[Byte](30)
    p(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(p, 1)
    // version 0 (4 bytes at 7)
    p(11) = channels.toByte
    var r = rate
    var i = 0
    while (i < 4) { p(12 + i) = (r & 0xff).toByte; r >>= 8; i += 1 }
    p(29) = 1 // framing bit
    p
  }

  /** An OpusHead identification packet. */
  def opusHead(channels: Int, rate: Long): Array[Byte] = {
    val p = new Array[Byte](19)
    "OpusHead".getBytes("US-ASCII").copyToArray(p, 0)
    p(8) = 1 // version
    p(9) = channels.toByte
    var r = rate
    var i = 0
    while (i < 4) { p(12 + i) = (r & 0xff).toByte; r >>= 8; i += 1 }
    p
  }

  /** A complete single-stream Ogg: the id packet on its own first
    * page (BOS), then `nPages` audio pages of `packetsPerPage`
    * deterministic packets each, granules advancing by `granuleStep`,
    * one packet spanning a 255-lace continuation inside a page so the
    * lacing path is exercised. */
  def ogg(opus: Boolean, channels: Int, rate: Long, nPages: Int,
      packetsPerPage: Int, granuleStep: Long, seed: Long): Array[Byte] = {
    require(nPages >= 1 && packetsPerPage >= 1)
    val out = new java.io.ByteArrayOutputStream()
    val serial = 0x13572468L
    val id = if (opus) opusHead(channels, rate) else vorbisId(channels, rate)
    out.write(page(0x02 /* BOS */, 0, serial, 0, Seq(id.length), id))
    var p = 0
    while (p < nPages) {
      val laces = Vector.newBuilder[Int]
      val body = new java.io.ByteArrayOutputStream()
      var k = 0
      while (k < packetsPerPage) {
        // one long packet per page exercises the 255-continuation
        val len = if (k == 0) 300 else 10 + ((seed + p + k) % 40).toInt
        val data = Array.tabulate[Byte](len)(j =>
          ((seed + p * 31 + k * 7 + j) % 251).toByte)
        body.write(data, 0, data.length)
        var rest = len
        while (rest >= 255) { laces += 255; rest -= 255 }
        laces += rest
        k += 1
      }
      val last = p == nPages - 1
      out.write(page(if (last) 0x04 /* EOS */ else 0,
        (p + 1) * granuleStep, serial, p + 1, laces.result(),
        body.toByteArray))
      p += 1
    }
    out.toByteArray
  }
}
