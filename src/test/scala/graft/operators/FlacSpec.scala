package graft.operators

import graft.SparkTestBase

/** Real FLAC codec: decoded samples must equal the contract after a
  * genuine encode (prediction + Rice + CRCs + MD5); every subframe
  * type, stereo assignment and residual form round-trips; a single
  * flipped bit anywhere fails the CRC/MD5 chain; dirty and
  * out-of-subset bytes are rejected, never thrown on. */
class FlacSpec extends SparkTestBase {

  test("decode(encode) recovers the exact sample contract across the " +
    "strategy-cycling fixture ids (all subframe types, assignments, " +
    "Rice methods, escapes)") {
    (0L until 24L).foreach { id =>
      val d = Flac.decode(MediaFixtures.flacMediaFor(id)).getOrElse(
        fail(s"id=$id did not decode"))
      assert(d.frames == 100 + (id * 13 % 400))
      assert(d.channels == 1 + id % 2)
      assert(d.sampleRate == 8000 * (1 + id % 3))
      var i = 0
      while (i < d.samples.length) {
        assert(d.samples(i) == WavPcm.samp(id, i), s"id=$id i=$i")
        i += 1
      }
    }
  }

  test("FLAC and WAV fixtures decode to byte-identical PCM (the shared " +
    "sample contract the SQL oracle re-derives)") {
    (0L until 8L).foreach { id =>
      val f = Flac.decode(MediaFixtures.flacMediaFor(id)).get
      val w = WavPcm.decode(MediaFixtures.wavMediaFor(id)).get
      assert(f.channels == w.channels && f.sampleRate == w.sampleRate &&
        f.frames == w.frames)
      assert(f.samples.sameElements(w.samples), s"id=$id")
    }
  }

  test("seeded fuzz: 40 random (id, frames, channels, rate) combos " +
    "round-trip bit-exact, including multi-frame streams and partial " +
    "final blocks") {
    val rnd = new scala.util.Random(4242)
    (0 until 40).foreach { _ =>
      val id = rnd.nextInt(100000).toLong
      val frames = 1 + rnd.nextInt(1500)
      val ch = 1 + rnd.nextInt(4)
      val rate = 1 + rnd.nextInt(96000)
      val d = Flac.decode(Flac.flacWithSamples(id, frames, ch, rate)).getOrElse(
        fail(s"id=$id frames=$frames ch=$ch rate=$rate did not decode"))
      assert(d.frames == frames && d.channels == ch && d.sampleRate == rate)
      var i = 0
      while (i < d.samples.length) {
        assert(d.samples(i) == WavPcm.samp(id, i),
          s"id=$id frames=$frames ch=$ch i=$i")
        i += 1
      }
    }
  }

  test("constant blocks take the CONSTANT subframe path and round-trip") {
    val samples = Array.fill(700)(123.toShort)
    val d = Flac.decode(Flac.encode(5L, 1, 8000, samples)).get
    assert(d.samples.forall(_ == 123))
    // negative constant too (sign extension through the eff-bit write)
    val neg = Array.fill(300)((-2047).toShort)
    assert(Flac.decode(Flac.encode(6L, 1, 8000, neg)).get
      .samples.forall(_ == -2047))
  }

  test("wasted-bits: samples sharing trailing zero bits are detected, " +
    "encoded at reduced width, and reconstructed exactly") {
    val samples = Array.tabulate(512)(i => ((WavPcm.samp(9L, i) / 8) * 8).toShort)
    val enc = Flac.encode(9L, 1, 16000, samples)
    val d = Flac.decode(enc).get
    var i = 0
    while (i < samples.length) {
      assert(d.samples(i) == samples(i), s"i=$i")
      i += 1
    }
  }

  test("every stereo assignment reconstructs exactly (seeds cycle " +
    "independent, left/side, right/side, mid/side across frames)") {
    // 5 frames x 4 seeds covers all assignments incl. odd (L+R) parity
    (0L until 4L).foreach { seed =>
      val n = 256 * 5
      val samples = new Array[Short](n * 2)
      var i = 0
      while (i < samples.length) { samples(i) = WavPcm.samp(seed + 50, i).toShort; i += 1 }
      val d = Flac.decode(Flac.encode(seed, 2, 44100, samples)).get
      i = 0
      while (i < samples.length) {
        assert(d.samples(i) == samples(i), s"seed=$seed i=$i")
        i += 1
      }
    }
  }

  test("a single flipped bit anywhere in the stream fails the " +
    "CRC-8/CRC-16/MD5 chain (decode -> None, no throw)") {
    val clean = Flac.flacWithSamples(7L, 400, 2, 16000)
    assert(Flac.decode(clean).isDefined)
    val rnd = new scala.util.Random(99)
    (0 until 60).foreach { _ =>
      val b = clean.clone()
      val pos = rnd.nextInt(b.length)
      b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      // either rejected or (rarely, e.g. a bit in the skipped PADDING
      // block) decoded identically — never a wrong answer, never a throw
      Flac.decode(b) match {
        case Some(d) =>
          val ref = Flac.decode(clean).get
          assert(d.samples.sameElements(ref.samples),
            s"corruption at byte $pos changed samples without detection")
        case None => ()
      }
    }
  }

  test("out-of-subset and dirty bytes return None, never throw: " +
    "truncations, wrong magic, random garbage") {
    val clean = Flac.flacWithSamples(3L, 300, 1, 8000)
    (0 until clean.length by 37).foreach { cut =>
      assert(Flac.decode(java.util.Arrays.copyOf(clean, cut)).isEmpty ||
        cut == clean.length)
    }
    assert(Flac.decode("fLaX garbage".getBytes).isEmpty)
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
    assert(Flac.decode(null).isEmpty)
    val rnd = new scala.util.Random(1234)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(b)
      if (b.length > 4) { b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C' }
      Flac.decode(b) // must not throw
    }
  }

  test("media_features routes FLAC through the real decode: identical " +
    "temporal-amplitude features to the WAV of the same recording") {
    (0L until 4L).foreach { id =>
      val flacFeats = graft.functions.MediaFeatures
        .compute(MediaFixtures.flacMediaFor(id), 12)
      val wavFeats = graft.functions.MediaFeatures
        .compute(MediaFixtures.wavMediaFor(id), 12)
      assert(flacFeats.toFloatArray().sameElements(wavFeats.toFloatArray()),
        s"id=$id")
    }
  }

  test("flac_wav bridge: the re-wrapped WAV is byte-identical to the " +
    "direct WAV fixture of the same id (every audio kernel serves FLAC " +
    "unchanged)") {
    (0L until 6L).foreach { id =>
      val bridged = graft.functions.FlacWav.compute(MediaFixtures.flacMediaFor(id))
      val direct = MediaFixtures.wavMediaFor(id)
      assert(bridged != null && bridged.sameElements(direct), s"id=$id")
    }
    assert(graft.functions.FlacWav.compute("not flac".getBytes) == null)
  }
}
