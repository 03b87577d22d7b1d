package graft.operators

import graft.SparkTestBase

/** MP3 frame-header triage + µ-law WAV decode: real frame-length
  * walks, ID3 wrappers, the G.711 expansion, and dirty-bytes
  * rejection. */
class Mp3Spec extends SparkTestBase {

  test("meta(mp3WithFrames) recovers every header field across the " +
    "fixture residue classes (version, bitrate table, mono, ID3v2 " +
    "prefix, ID3v1 trailer)") {
    (0L until 30L).foreach { id =>
      val m = Mp3.meta(MediaFixtures.mp3MediaFor(id)).getOrElse(
        fail(s"id=$id did not parse"))
      val n = (10 + (id * 3) % 40).toInt
      assert(m.version == (if (id % 2 == 0) "MPEG1" else "MPEG2"))
      assert(m.layer == 3)
      val expectBr =
        if (id % 2 == 0) Seq(32, 64, 128)((id % 3).toInt)
        else Seq(8, 40, 80)((id % 3).toInt)
      assert(m.bitrateKbps == expectBr, s"id=$id")
      assert(m.sampleRate == (if (id % 2 == 0) 44100 else 22050))
      assert(m.channels == (if (id % 3 == 0) 1 else 2))
      assert(m.nFrames == n)
      assert(m.hasId3 == (id % 2 == 0))
      val spf = if (id % 2 == 0) 1152 else 576
      assert(m.durationMs == n.toLong * spf * 1000 / m.sampleRate)
    }
  }

  test("the frame-length walk is a real validator: a corrupted " +
    "mid-stream header, a truncated last frame, and a lone sync all " +
    "reject") {
    val clean = Mp3.mp3WithFrames(4L, 12, mpeg1 = true, brIdx = 5,
      mono = false, id3v2 = false, id3v1 = false)
    assert(Mp3.meta(clean).isDefined)
    // corrupt the second frame's sync (first frame len: 144000*64/44100)
    val flen = 144000 * 64 / 44100
    val b = clean.clone()
    b(flen) = 0
    assert(Mp3.meta(b).isEmpty)
    assert(Mp3.meta(java.util.Arrays.copyOf(clean, clean.length - 3)).isEmpty)
    assert(Mp3.meta(Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0)).isEmpty)
    val rnd = new scala.util.Random(777)
    (0 until 200).foreach { _ =>
      val g = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(g)
      if (g.length > 3) { g(0) = 0xff.toByte; g(1) = 0xfa.toByte }
      Mp3.meta(g) // must not throw
    }
  }

  test("ulaw decode: wavWithUlaw expands through the G.711 formula " +
    "exactly, and ulawToPcm matches the reference expansion at the " +
    "edge codes") {
    // reference points: 0xFF -> 0, 0x7F -> -1 ... check the standard
    // identities: ulaw(0xff)=0, ulaw(0x7f)=-0? canonical: u=0xff ->
    // ~u=0 -> t=132 -> t-132=0
    assert(WavPcm.ulawToPcm(0xff) == 0)
    assert(WavPcm.ulawToPcm(0x7f) == 0) // negative zero maps to 0
    assert(WavPcm.ulawToPcm(0x00) == -32124) // G.711 negative max
    assert(WavPcm.ulawToPcm(0x80) == 32124) // G.711 positive max
    (0L until 8L).foreach { id =>
      val d = WavPcm.decode(MediaFixtures.ulawMediaFor(id)).getOrElse(
        fail(s"id=$id did not decode"))
      assert(d.channels == 1 + (id % 2) && d.sampleRate == 8000)
      assert(d.frames == 80 + (id * 11 % 300))
      var i = 0
      while (i < d.samples.length) {
        val ub = ((i * 7 + id * 13) % 256).toInt
        assert(d.samples(i) == WavPcm.ulawToPcm(ub), s"id=$id i=$i")
        i += 1
      }
    }
    // odd-length data chunk keeps RIFF word alignment
    assert(WavPcm.decode(WavPcm.wavWithUlaw(3L, 33, 1, 8000)).isDefined)
  }

  test("PCM16 decode still rejects other format tags and bit depths " +
    "(float, ADPCM, 8-bit linear)") {
    val base = WavPcm.wavWithSamples(2L, 40, 1, 8000)
    val asFloat = base.clone(); asFloat(20) = 3 // IEEE float tag
    assert(WavPcm.decode(asFloat).isEmpty)
    val ulaw = WavPcm.wavWithUlaw(2L, 40, 1, 8000)
    val wrongBits = ulaw.clone(); wrongBits(34) = 16 // µ-law must be 8-bit
    assert(WavPcm.decode(wrongBits).isEmpty)
  }
}
