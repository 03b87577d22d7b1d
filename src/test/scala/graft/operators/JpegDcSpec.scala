package graft.operators

import graft.SparkTestBase

/** DC-only baseline JPEG: the entropy round-trip must be bit-exact
  * against the block contract, and out-of-subset or corrupt streams
  * must be rejected, never thrown on. */
class JpegDcSpec extends SparkTestBase {

  test("decode(encode) recovers the exact block contract — both " +
    "component counts, varied dims, many DC categories") {
    (0L until 12L).foreach { id =>
      val bytes = MediaFixtures.jpegPixelMediaFor(id)
      val d = JpegDc.decode(bytes).getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == 8 * (1 + id % 6) && d.height == 8 * (1 + id % 5))
      assert(d.channels == (if (id % 2 == 0) 3 else 1))
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / d.channels) % d.width
        val y = i / (d.width * d.channels)
        val c = i % d.channels
        assert((d.pixels(i) & 0xff) == JpegDc.blockVal(id, x / 8, y / 8, c),
          s"id=$id x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("extreme DC swings (category-11 diffs) survive the bitstream") {
    // adjacent blocks at value 0 and 255 force diff = ±255 → the
    // widest category the standard DC table carries per block pair
    val w = 48; val h = 8
    val bytes = JpegDc.jpegWithPixels(151L, w, h, 1)
    val d = JpegDc.decode(bytes).get
    assert(d.width == w && d.pixels.length == w * h)
  }

  test("seeded fuzz: 50 random (id, blocks, components) combos " +
    "round-trip bit-exactly") {
    val rnd = new scala.util.Random(20260813L)
    (0 until 50).foreach { _ =>
      val id = rnd.nextLong(1000000L)
      val w = 8 * (1 + rnd.nextInt(10))
      val h = 8 * (1 + rnd.nextInt(8))
      val nc = if (rnd.nextBoolean()) 3 else 1
      val d = JpegDc.decode(JpegDc.jpegWithPixels(id, w, h, nc))
        .getOrElse(fail(s"id=$id ${w}x$h nc=$nc did not decode"))
      assert(d.width == w && d.height == h && d.channels == nc)
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / nc) % w
        val y = i / (w * nc)
        assert((d.pixels(i) & 0xff) ==
          JpegDc.blockVal(id, x / 8, y / 8, i % nc),
          s"id=$id ${w}x$h nc=$nc i=$i")
        i += 1
      }
    }
  }

  test("the shared header parser reads the DC-only frames (SOF0 after " +
    "DQT/DHT)") {
    val m = MediaCodec.parse(MediaFixtures.jpegPixelMediaFor(4L)).get
    assert(m.format == "jpeg" && m.width == 8 * (1 + 4 % 6) &&
      m.channels == 3)
  }

  test("out-of-subset and corrupt streams are rejected, never thrown on") {
    val good = MediaFixtures.jpegPixelMediaFor(6L)
    // corrupt a byte inside the entropy stream
    val corrupt = good.clone()
    corrupt(good.length - 10) = (corrupt(good.length - 10) ^ 0x55).toByte
    // either decodes to wrong-but-bounded pixels... no: a flipped bit
    // desyncs Huffman — the decoder must reject or at minimum not throw
    JpegDc.decode(corrupt) // must not throw
    // truncation mid-stream
    assert(JpegDc.decode(good.take(good.length / 2)).isEmpty)
    // the header-only fixture has no entropy data
    assert(JpegDc.decode(MediaFixtures.jpeg(16, 16, 3)).isEmpty)
    // PNG bytes are not a JPEG
    assert(JpegDc.decode(MediaFixtures.pixelMediaFor(2L)).isEmpty)
    assert(JpegDc.decode(Array[Byte]()).isEmpty)
    // header-only bytes (no tables, no entropy data) — dims are fine
    // now (edge blocks crop) but there is nothing to decode
    assert(JpegDc.decode(MediaFixtures.jpeg(20, 16, 1)).isEmpty)
  }

  test("full baseline decode: AC coefficients through Annex K Huffman " +
    "+ zigzag dequant + real IDCT recover the exact acPix contract, " +
    "including cropped edge blocks") {
    (0L until 8L).foreach { id =>
      val bytes = MediaFixtures.jpegAcMediaFor(id)
      val d = JpegDc.decode(bytes).getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == 10 + (id * 7 % 29) && d.height == 9 + (id * 5 % 23))
      assert(d.channels == (if (id % 2 == 0) 3 else 1))
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / d.channels) % d.width
        val y = i / (d.width * d.channels)
        val c = i % d.channels
        assert((d.pixels(i) & 0xff) == JpegDc.acPix(id, x, y, c),
          s"id=$id x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("seeded fuzz: 50 random (id, w, h, components) AC images " +
    "round-trip bit-exact (arbitrary dims, both component counts)") {
    val rnd = new scala.util.Random(4242)
    (0 until 50).foreach { _ =>
      val id = rnd.nextInt(10000).toLong
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(45)
      val nc = if (rnd.nextBoolean()) 3 else 1
      val d = JpegDc.decode(JpegDc.jpegWithAcPixels(id, w, h, nc))
        .getOrElse(fail(s"id=$id ${w}x$h nc=$nc did not decode"))
      assert(d.width == w && d.height == h && d.channels == nc)
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / nc) % w
        val y = i / (w * nc)
        val c = i % nc
        assert((d.pixels(i) & 0xff) == JpegDc.acPix(id, x, y, c),
          s"id=$id ${w}x$h nc=$nc x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("chroma subsampling: 4:2:0 / 4:2:2 / 4:4:0 fixtures decode " +
    "through real interleaved MCUs to the exact subPix contract, " +
    "including cropped luma AND chroma edge blocks") {
    (0L until 9L).foreach { id =>
      val bytes = MediaFixtures.jpegSubMediaFor(id)
      val d = JpegDc.decode(bytes).getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == 10 + (id * 7 % 29) && d.height == 9 + (id * 5 % 23))
      assert(d.channels == 3)
      val (yH, yV) = (id % 3) match {
        case 0 => (2, 2); case 1 => (2, 1); case _ => (1, 2)
      }
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / 3) % d.width
        val y = i / (d.width * 3)
        val c = i % 3
        assert((d.pixels(i) & 0xff) == JpegDc.subPix(id, x, y, c, yH, yV),
          s"id=$id ${yH}x$yV x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("seeded fuzz: 60 random (id, w, h, sampling) subsampled images " +
    "round-trip bit-exact across the full {1,2}x{1,2} factor matrix") {
    val rnd = new scala.util.Random(20260814L)
    (0 until 60).foreach { _ =>
      val id = rnd.nextInt(10000).toLong
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(45)
      val yH = 1 + rnd.nextInt(2)
      val yV = 1 + rnd.nextInt(2)
      val d = JpegDc.decode(JpegDc.jpegWithAcPixelsSampled(id, w, h, yH, yV))
        .getOrElse(fail(s"id=$id ${w}x$h samp=${yH}x$yV did not decode"))
      assert(d.width == w && d.height == h && d.channels == 3)
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / 3) % w
        val y = i / (w * 3)
        val c = i % 3
        assert((d.pixels(i) & 0xff) == JpegDc.subPix(id, x, y, c, yH, yV),
          s"id=$id ${w}x$h samp=${yH}x$yV x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("restart markers: DRI fixtures decode to the exact acPix " +
    "contract — per-interval DC prediction, cycling RSTn, real " +
    "markers present in the stream") {
    (0L until 10L).foreach { id =>
      val bytes = MediaFixtures.jpegRstMediaFor(id)
      // the fixture genuinely contains restart markers (0xFF 0xD0-D7)
      val nRst = (0 until bytes.length - 1).count { j =>
        (bytes(j) & 0xff) == 0xff &&
        (bytes(j + 1) & 0xff) >= 0xd0 && (bytes(j + 1) & 0xff) <= 0xd7
      }
      assert(nRst > 0, s"id=$id fixture carries no RSTn markers")
      val d = JpegDc.decode(bytes).getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == 10 + (id * 7 % 29) && d.height == 9 + (id * 5 % 23))
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / d.channels) % d.width
        val y = i / (d.width * d.channels)
        val c = i % d.channels
        assert((d.pixels(i) & 0xff) == JpegDc.acPix(id, x, y, c),
          s"id=$id x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("seeded fuzz: 50 random (id, w, h, nc, ri) restart images " +
    "round-trip bit-exact, including ri past the 8-marker cycle") {
    val rnd = new scala.util.Random(20260814L)
    (0 until 50).foreach { _ =>
      val id = rnd.nextInt(10000).toLong
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(45)
      val nc = if (rnd.nextBoolean()) 3 else 1
      val ri = 1 + rnd.nextInt(7)
      val d = JpegDc.decode(JpegDc.jpegWithAcPixelsRestart(id, w, h, nc, ri))
        .getOrElse(fail(s"id=$id ${w}x$h nc=$nc ri=$ri did not decode"))
      assert(d.width == w && d.height == h && d.channels == nc)
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / nc) % w
        val y = i / (w * nc)
        assert((d.pixels(i) & 0xff) == JpegDc.acPix(id, x, y, i % nc),
          s"id=$id ${w}x$h nc=$nc ri=$ri i=$i")
        i += 1
      }
    }
  }

  test("progressive (SOF2): the 6-scan successive-approximation " +
    "script decodes to the exact acPix contract — DC first/refine, " +
    "AC first with real EOB runs, AC refinement with interleaved " +
    "correction bits") {
    (0L until 8L).foreach { id =>
      val w = (10 + id * 7 % 29).toInt
      val h = (9 + id * 5 % 23).toInt
      val nc = if (id % 2 == 0) 3 else 1
      val bytes = JpegDc.jpegProgressive(id, w, h, nc)
      // the stream is genuinely progressive: SOF2 frame, multiple SOS
      assert((2 until bytes.length - 1).exists { j =>
        (bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == 0xc2
      })
      val nSos = (2 until bytes.length - 1).count { j =>
        (bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == 0xda
      }
      assert(nSos == 2 + 4 * nc, s"id=$id expected ${2 + 4 * nc} scans")
      val d = JpegDc.decode(bytes).getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == w && d.height == h && d.channels == nc)
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / nc) % w
        val y = i / (w * nc)
        assert((d.pixels(i) & 0xff) == JpegDc.acPix(id, x, y, i % nc),
          s"id=$id x=$x y=$y c=${i % nc}")
        i += 1
      }
    }
  }

  test("progressive + chroma subsampling: 4:2:0/4:2:2/4:4:0 SOF2 " +
    "streams decode through interleaved DC MCUs and non-interleaved " +
    "AC scans to the exact subPix contract") {
    ((0L until 9L)).foreach { id =>
      val w = (10 + id * 7 % 29).toInt
      val h = (9 + id * 5 % 23).toInt
      val (yH, yV) = (id % 3) match {
        case 0 => (2, 2); case 1 => (2, 1); case _ => (1, 2)
      }
      val d = JpegDc.decode(JpegDc.jpegProgressive(id, w, h, 3, yH, yV))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.width == w && d.height == h && d.channels == 3)
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / 3) % w
        val y = i / (w * 3)
        val c = i % 3
        assert((d.pixels(i) & 0xff) == JpegDc.subPix(id, x, y, c, yH, yV),
          s"id=$id ${yH}x$yV x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("seeded fuzz: 60 random progressive (id, w, h, nc, sampling) " +
    "round-trip bit-exact") {
    val rnd = new scala.util.Random(20260815L)
    (0 until 60).foreach { _ =>
      val id = rnd.nextInt(10000).toLong
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(45)
      val nc = if (rnd.nextBoolean()) 3 else 1
      val yH = 1 + rnd.nextInt(2)
      val yV = 1 + rnd.nextInt(2)
      val d = JpegDc.decode(JpegDc.jpegProgressive(id, w, h, nc, yH, yV))
        .getOrElse(fail(s"id=$id ${w}x$h nc=$nc ${yH}x$yV did not decode"))
      assert(d.width == w && d.height == h && d.channels == nc)
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / nc) % w
        val y = i / (w * nc)
        val c = i % nc
        val want =
          if (nc == 1) JpegDc.acPix(id, x, y, 0)
          else JpegDc.subPix(id, x, y, c, yH, yV)
        assert((d.pixels(i) & 0xff) == want,
          s"id=$id ${w}x$h nc=$nc ${yH}x$yV x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("progressive damage is rejected, never thrown on: truncation, " +
    "a missing scan tail, and refinement-before-first scans") {
    val good = JpegDc.jpegProgressive(3L, 24, 16, 1)
    assert(JpegDc.decode(good.take(good.length / 3)).isEmpty)
    // chop after the 2nd SOS: EOI never arrives
    val sos2 = {
      var seen = 0; var at = -1
      (2 until good.length - 1).foreach { j =>
        if (at < 0 && (good(j) & 0xff) == 0xff &&
          (good(j + 1) & 0xff) == 0xda) {
          seen += 1; if (seen == 2) at = j
        }
      }
      at
    }
    assert(JpegDc.decode(good.take(sos2 + 6)).isEmpty)
    // flip Ah/Al of the first AC scan to a non-successive pair (Ah=3
    // refining onto Al=0 history jumps 3 bits — out of subset)
    val bad = good.clone()
    var fixed = false
    (sos2 until bad.length - 10).foreach { j =>
      if (!fixed && (bad(j) & 0xff) == 0xff && (bad(j + 1) & 0xff) == 0xda) {
        // SOS: len(2) ns(1) comp pairs(2*ns=2) Ss Se AhAl
        bad(j + 9) = 0x30.toByte; fixed = true
      }
    }
    assert(fixed && JpegDc.decode(bad).isEmpty)
  }

  test("restart damage is rejected, never thrown on: out-of-sequence " +
    "RSTn, and a declared DRI whose markers are absent") {
    val good = JpegDc.jpegWithAcPixelsRestart(7L, 40, 24, 1, 2)
    // find the first RSTn in the entropy stream and bump its sequence
    val at = (2 until good.length - 1).find { j =>
      (good(j) & 0xff) == 0xff &&
      (good(j + 1) & 0xff) >= 0xd0 && (good(j + 1) & 0xff) <= 0xd7
    }.get
    assert((good(at + 1) & 0xff) == 0xd0) // first marker is RST0
    val wrongSeq = good.clone()
    wrongSeq(at + 1) = 0xd3.toByte
    assert(JpegDc.decode(wrongSeq).isEmpty)
    // same coefficients, no DRI and no markers — but declare DRI by
    // hand: the decoder expects a marker that never comes
    val noRst = JpegDc.jpegWithAcPixels(7L, 40, 24, 1)
    val withDri = new java.io.ByteArrayOutputStream()
    withDri.write(noRst, 0, 2) // SOI
    withDri.write(Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, 2), 0, 6)
    withDri.write(noRst, 2, noRst.length - 2)
    assert(JpegDc.decode(withDri.toByteArray).isEmpty)
  }

  test("sampling factors above 2 are outside the subset and rejected, " +
    "and the header parser still reads subsampled frames") {
    // patch the Y sampling byte of a good 4:2:0 frame to 3x1
    val good = JpegDc.jpegWithAcPixelsSampled(5L, 24, 16, 2, 2)
    val sofAt = {
      var i = 2
      var at = -1
      while (at < 0) {
        val m = good(i + 1) & 0xff
        if (m == 0xc0) at = i
        else i += 2 + (((good(i + 2) & 0xff) << 8) | (good(i + 3) & 0xff))
      }
      at
    }
    assert((good(sofAt + 11) & 0xff) == 0x22) // Y sampling byte: 2x2
    val bad = good.clone()
    bad(sofAt + 11) = 0x31.toByte
    assert(JpegDc.decode(bad).isEmpty)
    // the shared header parser reads dims/channels from the 4:2:0 frame
    val m = MediaCodec.parse(good).get
    assert(m.format == "jpeg" && m.width == 24 && m.height == 16 &&
      m.channels == 3)
  }

  test("the DC-only stream decodes identically through the general " +
    "baseline path (flat blocks are just the all-AC-zero case)") {
    val d = JpegDc.decode(MediaFixtures.jpegPixelMediaFor(4L)).get
    var i = 0
    while (i < d.pixels.length) {
      val x = (i / d.channels) % d.width
      val y = i / (d.width * d.channels)
      val c = i % d.channels
      assert((d.pixels(i) & 0xff) ==
        JpegDc.blockVal(4L, x / 8, y / 8, c), s"x=$x y=$y c=$c")
      i += 1
    }
  }

  test("adversarial SOF0 dims are rejected before allocation (Long " +
    "size math + decode cap)") {
    val good = MediaFixtures.jpegPixelMediaFor(4L) // 3-component
    // SOF0 sits after APP0 (ends at 20) and DQT (ends at 89): marker
    // 89-90, len 91-92, precision 93, h 94-95, w 96-97
    assert((good(89) & 0xff) == 0xff && (good(90) & 0xff) == 0xc0)
    val huge = good.clone()
    // 65528×65528×3 ≈ 12.9 GB decoded — far over the cap; the buffer
    // must never be sized/allocated (w*ch*h also overflows Int)
    huge(94) = 0xff.toByte; huge(95) = 0xf8.toByte
    huge(96) = 0xff.toByte; huge(97) = 0xf8.toByte
    assert(JpegDc.decode(huge).isEmpty)
  }

  test("extractFeatures routes decodable media to REAL pixel " +
    "histograms and everything else to the FakeCodec seam") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq(
      (0L, MediaFixtures.pixelMediaFor(4L)),     // real PNG pixels
      (1L, MediaFixtures.jpegPixelMediaFor(4L)), // real JPEG pixels
      (2L, MediaFixtures.png(16, 16, 2)),        // header-only → seam
      (3L, "not media at all".getBytes("UTF-8")) // opaque → seam
    ).toDF("id", "media")
    val out = Multimodal.extractFeatures(rows, "media", dim = 8)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // decodable rows: the L1-normalized luminance histogram of the
    // REAL pixels (recompute from the decoder directly)
    def histo(d: PngPixels.Decoded): Seq[Float] = {
      val counts = new Array[Long](8)
      d.pixels.grouped(d.channels).foreach { p =>
        val luma =
          if (d.channels == 3)
            (299 * (p(0) & 0xff) + 587 * (p(1) & 0xff) +
              114 * (p(2) & 0xff)) / 1000
          else p(0) & 0xff
        counts(luma * 8 / 256) += 1
      }
      val t = math.max(1L, counts.sum)
      counts.map(_.toFloat / t).toSeq
    }
    assert(out(0L) == histo(PngPixels.decode(
      MediaFixtures.pixelMediaFor(4L)).get))
    assert(out(1L) == histo(JpegDc.decode(
      MediaFixtures.jpegPixelMediaFor(4L)).get))
    // non-decodable rows: byte-identical to the FakeCodec head
    assert(out(2L) == Multimodal.FakeCodec
      .features(MediaFixtures.png(16, 16, 2), 8).toSeq)
    assert(out(3L) == Multimodal.FakeCodec
      .features("not media at all".getBytes("UTF-8"), 8).toSeq)
  }

  test("extractFeatures routes GIF to an all-frames histogram and WAV " +
    "to the temporal amplitude profile — real content, not byte sums") {
    import spark.implicits._
    val gifBytes = MediaFixtures.gifMediaFor(6L)
    val wavBytes = MediaFixtures.wavMediaFor(6L)
    val out = Multimodal.extractFeatures(
        Seq((0L, gifBytes), (1L, wavBytes)).toDF("id", "media"),
        "media", dim = 8)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // GIF: luminance histogram over every decoded frame
    val g = Gif.decode(gifBytes).get
    val gc = new Array[Long](8)
    g.frames.foreach(_.luma.foreach(b => gc((b & 0xff) * 8 / 256) += 1))
    val gt = gc.sum.max(1L)
    assert(out(0L) == gc.map(_.toFloat / gt).toSeq)
    // WAV: |amplitude| summed into 8 time buckets, L1-normalized
    val w = WavPcm.decode(wavBytes).get
    val wc = new Array[Long](8)
    w.samples.zipWithIndex.foreach { case (s, i) =>
      wc((i.toLong * 8 / w.samples.length).toInt) += math.abs(s.toLong)
    }
    val wt = wc.sum.max(1L)
    assert(out(1L) == wc.map(_.toFloat / wt).toSeq)
    // neither equals the old byte-sum head (the routing is live)
    assert(out(0L) != Multimodal.FakeCodec.features(gifBytes, 8).toSeq)
    assert(out(1L) != Multimodal.FakeCodec.features(wavBytes, 8).toSeq)
  }

  test("the multimodal kernels are callable from verbatim SQL text") {
    val r = spark.sql("""
      SELECT parse_media(pixel_media_for_id(4L)).format AS fmt,
             png_stats(pixel_media_for_id(4L)).pix_sum AS psum,
             jpeg_stats(jpeg_pixel_media_for_id(4L)).pix_count AS jcount,
             size(png_histogram(pixel_media_for_id(4L), 16)) AS bins,
             size(media_features(jpeg_pixel_media_for_id(4L), 8)) AS dim
      """).head()
    assert(r.getString(0) == "png")
    assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    assert(r.getInt(3) == 16 && r.getInt(4) == 8)
  }

  test("PNG and JPEG pixel decoders are mutually exclusive on the " +
    "same fixture ids (format routing is unambiguous)") {
    (0L until 6L).foreach { id =>
      assert(PngPixels.decode(MediaFixtures.jpegPixelMediaFor(id)).isEmpty)
      assert(JpegDc.decode(MediaFixtures.pixelMediaFor(id)).isEmpty)
    }
  }
}
