package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Vorbis I decode pinned from both sides (r16): the spec's own
  * worked codeword example, an ANALYTIC synthesis pin (single
  * spectral line → the decoded PCM must equal the closed-form
  * windowed-cosine overlap, computed here with raw trig — not the
  * decoder's code paths), the encoder/decoder pair round-trip over
  * real Ogg pages, and the dirty-byte boundaries. */
class VorbisSpec extends AnyFunSuite {

  test("codeword assignment reproduces the spec's §3.2.1 worked " +
    "example: lengths [2,4,4,4,4,2,3,3]") {
    val cw = Vorbis.codewordTable(Array(2, 4, 4, 4, 4, 2, 3, 3))
    val got = cw.map { case (c, l) =>
      (0 until l).map(b => (c >>> (l - 1 - b)) & 1).mkString }
    assert(got.toSeq == Seq("00", "0100", "0101", "0110", "0111",
      "10", "110", "111"))
  }

  test("a codebook round-trips: every entry's written codeword " +
    "decodes back to the entry, through the LSB-first stream") {
    val lengths = Array.fill(47)(6) ++ Array.fill(34)(7)
    val cw = Vorbis.codewordTable(lengths)
    val w = new Vorbis.BitWriter
    val order = Seq(0, 80, 46, 47, 1, 33, 79, 13)
    order.foreach(e => Vorbis.writeCodeword(w, cw(e)._1, cw(e)._2))
    val book = Vorbis.Codebook(1, 81, lengths, 0, null)
    assert(book.valid)
    val r = new Vorbis.BitReader(w.bytes)
    order.foreach(e => assert(book.decodeScalar(r) == e))
  }

  test("over-subscribed codeword lengths are rejected") {
    val book = Vorbis.Codebook(1, 3, Array(1, 1, 1), 0, null)
    assert(!book.valid)
  }

  test("bitpacking is LSB-first and round-trips through the writer") {
    val w = new Vorbis.BitWriter
    w.write(5, 3); w.write(0x1a3, 9); w.writeLong(0x0f0f0f0fL, 32)
    val r = new Vorbis.BitReader(w.bytes)
    assert(r.read(3) == 5)
    assert(r.read(9) == 0x1a3)
    assert(r.readLong(32) == 0x0f0f0f0fL)
  }

  test("float32 pack/unpack round-trips the encoder's constants") {
    Seq(64.0f, -64.0f, 1.0f, 0.25f, -3.5f).foreach { v =>
      assert(Vorbis.float32Unpack(Vorbis.float32Pack(v)) == v)
    }
  }

  test("the fixture stream decodes: mono, right rate, one PCM window " +
    "per packet after the primer, deterministic") {
    val bytes = VorbisEnc.fixture(16000L, nPackets = 5, seed = 7L)
    val d = Vorbis.decodeOgg(bytes).getOrElse(fail("no decode"))
    assert(d.channels == 1 && d.sampleRate == 16000L)
    assert(d.packets == 5)
    assert(d.pcm.length == 4 * VorbisEnc.N2,
      "first packet primes the lap and emits nothing")
    val d2 = Vorbis.decodeOgg(VorbisEnc.fixture(16000L, 5, 7L)).get
    assert(d.pcm.toSeq == d2.pcm.toSeq, "decode is deterministic")
    assert(d.pcm.exists(_ != 0), "the stream carries signal")
  }

  test("ANALYTIC pin: a single spectral line decodes to the closed-" +
    "form windowed cosine overlap (raw trig here, no decoder code)") {
    val n2 = VorbisEnc.N2
    val k0 = 9
    // two identical packets, one active line at k0 with digit 2 →
    // residue +Q; flat floor at dB index 254
    val digits = Array.fill(n2)(1)
    digits(k0) = 2
    val (id, comment, setup) = VorbisEnc.headers(8000L)
    val p = VorbisEnc.audioPacket(digits)
    val stream = VorbisEnc.oggStream(8000L, Seq(id, comment, setup, p, p),
      n2)
    val d = Vorbis.decodeOgg(stream).getOrElse(fail("no decode"))
    assert(d.pcm.length == n2)
    val n = 2 * n2
    val amp = VorbisEnc.Q.toDouble *
      (0.8278826 * math.exp(0.0622535662 * (254 - 255)))
    def w(i: Int): Double = {
      val s = math.sin(math.Pi / n * (i + 0.5))
      math.sin(math.Pi / 2 * s * s)
    }
    def imdctLine(i: Int): Double =
      amp * math.cos(math.Pi / (2.0 * n) * (2 * i + 1 + n2) * (2 * k0 + 1))
    (0 until n2).foreach { s =>
      val expected = w(n2 + s) * imdctLine(n2 + s) + w(s) * imdctLine(s)
      val got = d.pcm(s) / 32767.0
      assert(math.abs(got - expected) < 2.0 / 32767.0,
        s"sample $s: got $got expected $expected")
    }
  }

  test("STEREO square-polar coupling decodes per the spec's inverse: " +
    "(mag,ang)=(+Q,0) puts the SAME line on both channels; " +
    "(mag,ang)=(+Q,+Q) puts it on the magnitude channel only") {
    val n2 = VorbisEnc.N2
    val n = 2 * n2
    val k0 = 5
    val (id, comment, setup) = VorbisEnc.stereoHeaders(8000L)
    val amp = VorbisEnc.Q.toDouble *
      (0.8278826 * math.exp(0.0622535662 * (254 - 255)))
    def w(i: Int): Double = {
      val s = math.sin(math.Pi / n * (i + 0.5))
      math.sin(math.Pi / 2 * s * s)
    }
    def line(i: Int): Double =
      amp * math.cos(math.Pi / (2.0 * n) * (2 * i + 1 + n2) * (2 * k0 + 1))
    def decode(magDigit: Int, angDigit: Int) = {
      val digits = Array.fill(2 * n2)(1)
      digits(2 * k0) = magDigit     // interleave: even = channel 0
      digits(2 * k0 + 1) = angDigit // odd = channel 1
      val p = VorbisEnc.stereoAudioPacket(digits)
      Vorbis.decodeOgg(VorbisEnc.oggStream(8000L,
        Seq(id, comment, setup, p, p), n2))
        .getOrElse(fail("stereo decode"))
    }
    // case 1: mag=+Q, ang=0 → new_A = M, new_M = M + A = Q on BOTH
    val both = decode(2, 1)
    assert(both.channels == 2 && both.pcm.length == 2 * n2)
    (0 until n2).foreach { s =>
      val expected = w(n2 + s) * line(n2 + s) + w(s) * line(s)
      val l = both.pcm(2 * s) / 32767.0
      val r = both.pcm(2 * s + 1) / 32767.0
      assert(math.abs(l - expected) < 2.0 / 32767.0, s"L at $s")
      assert(math.abs(r - expected) < 2.0 / 32767.0, s"R at $s")
    }
    // case 2: mag=+Q, ang=+Q → new_M = Q, new_A = Q - Q = 0:
    // the line lives on channel 0 only
    val solo = decode(2, 2)
    (0 until n2).foreach { s =>
      val expected = w(n2 + s) * line(n2 + s) + w(s) * line(s)
      val l = solo.pcm(2 * s) / 32767.0
      val r = solo.pcm(2 * s + 1) / 32767.0
      assert(math.abs(l - expected) < 2.0 / 32767.0, s"L at $s")
      assert(math.abs(r) < 2.0 / 32767.0, s"R must be silent at $s")
    }
  }

  test("codebook grammar paths the fixtures don't use: ORDERED " +
    "lengths, SPARSE entries, and lookup type 1 all parse and decode") {
    // ordered: 2 entries of len 1 (read as: curlen=1, number=2)
    val w1 = new Vorbis.BitWriter
    w1.write(0x564342, 24); w1.write(1, 16); w1.write(2, 24)
    w1.write(1, 1)        // ordered
    w1.write(0, 5)        // initial length - 1 = 0 -> len 1
    w1.write(2, Vorbis.ilog(2)) // number with ilog(entries - 0) bits
    w1.write(0, 4)        // lookup 0
    val r1 = new Vorbis.BitReader(w1.bytes)
    val b1 = Vorbis.readCodebook(r1).getOrElse(fail("ordered parse"))
    assert(b1.lengths.toSeq == Seq(1, 1))
    // sparse: 3 entries, middle unused; used ones len 1
    val w2 = new Vorbis.BitWriter
    w2.write(0x564342, 24); w2.write(1, 16); w2.write(3, 24)
    w2.write(0, 1)        // unordered
    w2.write(1, 1)        // sparse
    w2.write(1, 1); w2.write(0, 5) // entry 0: used, len 1
    w2.write(0, 1)                 // entry 1: unused
    w2.write(1, 1); w2.write(0, 5) // entry 2: used, len 1
    w2.write(0, 4)
    val b2 = Vorbis.readCodebook(new Vorbis.BitReader(w2.bytes))
      .getOrElse(fail("sparse parse"))
    assert(b2.lengths.toSeq == Seq(1, 0, 1))
    val wv = new Vorbis.BitWriter
    val cw2 = Vorbis.codewordTable(b2.lengths)
    Vorbis.writeCodeword(wv, cw2(2)._1, cw2(2)._2)
    Vorbis.writeCodeword(wv, cw2(0)._1, cw2(0)._2)
    val rv = new Vorbis.BitReader(wv.bytes)
    assert(b2.decodeScalar(rv) == 2 && b2.decodeScalar(rv) == 0)
    // lookup type 1: 4 entries, dims 2 -> lookup1_values = 2, the
    // multiplicands index by (entry / 2^d) % 2 — check the §3.2.2
    // unrolling against hand values
    assert(Vorbis.lookup1Values(4, 2) == 2)
    val w3 = new Vorbis.BitWriter
    w3.write(0x564342, 24); w3.write(2, 16); w3.write(4, 24)
    w3.write(0, 1); w3.write(0, 1)
    (0 until 4).foreach(_ => w3.write(1, 5)) // all len 2
    w3.write(1, 4) // lookup type 1
    w3.writeLong(Vorbis.float32Pack(0f), 32)  // min 0
    w3.writeLong(Vorbis.float32Pack(1f), 32)  // delta 1
    w3.write(0, 4) // value bits - 1 = 0 -> 1 bit
    w3.write(0, 1) // not sequential
    w3.write(0, 1); w3.write(1, 1) // mults = [0, 1]
    val b3 = Vorbis.readCodebook(new Vorbis.BitReader(w3.bytes))
      .getOrElse(fail("lookup1 parse"))
    // entry e, dim d -> mults[(e / 2^d) % 2]: e0=[0,0] e1=[1,0]
    // e2=[0,1] e3=[1,1]
    assert(b3.vq.map(_.toSeq).toSeq == Seq(Seq(0f, 0f), Seq(1f, 0f),
      Seq(0f, 1f), Seq(1f, 1f)))
  }

  test("a packet split across 255-lacing continuations reassembles") {
    // pad one audio packet past 255 bytes by activating many lines
    val digits = Array.tabulate(VorbisEnc.N2)(i => (i % 3))
    val (id, comment, setup) = VorbisEnc.headers(8000L)
    val p = VorbisEnc.audioPacket(digits)
    val stream = VorbisEnc.oggStream(8000L,
      Seq(id, comment, setup, p, p, p), VorbisEnc.N2)
    val packets = Vorbis.oggPackets(stream).getOrElse(fail("no packets"))
    assert(packets.length == 6)
    assert(packets(3).toSeq == p.toSeq)
    assert(Vorbis.decodeOgg(stream).isDefined)
  }

  test("page-level integrity (r17): a LOST whole page, a reordered " +
    "page, and a lying continued-flag all return None — CRC alone " +
    "cannot catch them (every surviving page stays individually valid)") {
    val (id, comment, setup) = VorbisEnc.headers(8000L)
    val digits = Array.tabulate(VorbisEnc.N2)(i => (i % 3))
    val p = VorbisEnc.audioPacket(digits)
    val stream = VorbisEnc.oggStream(8000L,
      Seq(id, comment, setup, p, p, p), VorbisEnc.N2)
    assert(Vorbis.oggPackets(stream).isDefined, "control: intact stream")
    // walk the page boundaries
    def pageSpans(b: Array[Byte]): Seq[(Int, Int)] = {
      var o = 0
      val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      while (o + 27 <= b.length) {
        val nSegs = b(o + 26) & 0xff
        val bodyLen = (0 until nSegs).map(j => b(o + 27 + j) & 0xff).sum
        val total = 27 + nSegs + bodyLen
        spans += ((o, total))
        o += total
      }
      spans.toSeq
    }
    val spans = pageSpans(stream)
    assert(spans.length == 5) // BOS, headers, 3 audio pages
    // drop the MIDDLE audio page whole: remaining pages all CRC-valid
    val (dropO, dropL) = spans(3)
    val lost = stream.take(dropO) ++ stream.drop(dropO + dropL)
    assert(Vorbis.oggPackets(lost).isEmpty,
      "a missing page must fail the sequence check, not splice")
    assert(Vorbis.decodeOgg(lost).isEmpty)
    // swap the two middle audio pages (each individually CRC-valid)
    val (aO, aL) = spans(2)
    val (bO, bL) = spans(3)
    val swapped = stream.take(aO) ++
      stream.slice(bO, bO + bL) ++ stream.slice(aO, aO + aL) ++
      stream.drop(bO + bL)
    assert(Vorbis.oggPackets(swapped).isEmpty,
      "reordered pages must fail the sequence check")
    // a page claiming continuation (0x01) with no packet open: patch
    // the header-type byte and re-CRC so only the LIE is wrong
    val lying = stream.clone()
    lying(dropO + 5) = (lying(dropO + 5) | 0x01).toByte
    val crc = Ogg.crc(lying, dropO, dropL, dropO + 22)
    var cc = crc; var i = 0
    while (i < 4) {
      lying(dropO + 22 + i) = (cc & 0xff).toByte; cc >>= 8; i += 1
    }
    assert(Vorbis.oggPackets(lying).isEmpty,
      "continued-flag must agree with the carried lacing state")
    // a foreign serial spliced mid-stream is not this stream's page
    val alien = stream.clone()
    alien(dropO + 14) = (alien(dropO + 14) ^ 0x7f).toByte
    val crc2 = Ogg.crc(alien, dropO, dropL, dropO + 22)
    cc = crc2; i = 0
    while (i < 4) {
      alien(dropO + 22 + i) = (cc & 0xff).toByte; cc >>= 8; i += 1
    }
    assert(Vorbis.oggPackets(alien).isEmpty,
      "a serial change mid-stream must reject")
  }

  test("dirty bytes reject, never throw: flipped payload byte (CRC), " +
    "truncation, two block sizes, floor0") {
    val good = VorbisEnc.fixture(16000L, 4, 3L)
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x5a).toByte
    assert(Vorbis.decodeOgg(flipped).isEmpty, "CRC must catch the flip")
    assert(Vorbis.decodeOgg(good.take(good.length / 3)).isEmpty)
    assert(Vorbis.decodeOgg(Array[Byte](1, 2, 3)).isEmpty)
    // two block sizes in the id header → honest-subset rejection.
    // blocksizes live in the LAST page-framed copy of the id packet:
    // patch byte 28 of the id packet, re-CRC via re-paging
    val (id, comment, setup) = VorbisEnc.headers(16000L)
    val id2 = id.clone(); id2(28) = 0x98.toByte // bs0=2^8, bs1=2^9
    val digits = Array.fill(VorbisEnc.N2)(1)
    val p = VorbisEnc.audioPacket(digits)
    val stream2 = VorbisEnc.oggStream(16000L,
      Seq(id2, comment, setup, p, p), VorbisEnc.N2)
    assert(Vorbis.decodeOgg(stream2).isEmpty)
  }

  test("one stream, two containers: the WebM mux of the SAME packets " +
    "decodes to byte-identical PCM (CodecPrivate Xiph lacing + audio " +
    "SimpleBlocks vs Ogg pages)") {
    val ogg = Vorbis.decodeOgg(VorbisEnc.fixture(16000L, 5, 9L))
      .getOrElse(fail("ogg decode"))
    val webm = Vorbis.decodeWebm(VorbisEnc.webmFixture(16000L, 5, 9L))
      .getOrElse(fail("webm decode"))
    assert(webm.channels == ogg.channels &&
      webm.sampleRate == ogg.sampleRate)
    assert(webm.pcm.toSeq == ogg.pcm.toSeq,
      "the two container paths must synthesize identical PCM")
    // the CodecPrivate round-trips through the Xiph lacing exactly
    val (id, comment, setup) = VorbisEnc.headers(16000L)
    val laced = Vorbis.xiphLacedPackets(VorbisEnc.codecPrivate(16000L))
      .getOrElse(fail("lacing"))
    assert(laced(0).toSeq == id.toSeq)
    assert(laced(1).toSeq == comment.toSeq)
    assert(laced(2).toSeq == setup.toSeq)
    // torn CodecPrivate (truncated mid-lacing) rejects
    val cp = VorbisEnc.codecPrivate(16000L)
    assert(Vorbis.xiphLacedPackets(cp.take(cp.length / 2)).isEmpty ||
      Vorbis.decodeWebm(VorbisEnc.webmFixture(16000L, 5, 9L)
        .take(200)).isEmpty)
    // an Opus-labeled track refuses the vorbis decode
    val opusWebm = Webm.build(48, 32,
      Seq(Array.fill(32)(0x01.toByte)), audio = Some(
        Webm.AudioMux("A_OPUS", 1, 48000,
          VorbisEnc.audioPackets(2, 1L), VorbisEnc.codecPrivate(16000L))))
    assert(Vorbis.decodeWebm(opusWebm).isEmpty)
  }

  test("the container walk still triages the vorbis fixture " +
    "(ogg_meta compatibility: codec, channels, rate)") {
    val bytes = VorbisEnc.fixture(24000L, 4, 11L)
    val m = Ogg.parse(bytes).getOrElse(fail("no meta"))
    assert(m.codec == "vorbis" && m.channels == 1 &&
      m.sampleRate == 24000L)
    assert(m.packets == 3 + 4) // 3 headers + 4 audio
  }
}
