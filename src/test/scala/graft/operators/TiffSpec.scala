package graft.operators

import graft.SparkTestBase

/** TIFF 6.0 IFD walk serving two surfaces: standalone TIFF metadata
  * and JPEG EXIF (APP1-embedded TIFF). Round trips must hold in both
  * byte orders through both the inline and offset ASCII paths; the
  * spliced JPEG must still pixel-decode; dirty bytes reject. */
class TiffSpec extends SparkTestBase {

  test("standalone TIFF round-trips geometry in both byte orders") {
    for (le <- Seq(true, false); ch <- 1 to 4) {
      val m = Tiff.parseTiff(Tiff.tiff(123, 77, ch, le))
        .getOrElse(fail(s"le=$le ch=$ch did not parse"))
      assert(m.width == 123 && m.height == 77 && m.channels == ch &&
        m.format == "tiff")
    }
  }

  test("TIFF rejects dirty bytes: truncation, bad magic, wild offsets, " +
    "oversized entry counts") {
    val good = Tiff.tiff(40, 30, 3, littleEndian = true)
    assert(Tiff.parseTiff(good).isDefined)
    assert(Tiff.parseTiff(null).isEmpty)
    assert(Tiff.parseTiff(good.take(6)).isEmpty)           // truncated header
    assert(Tiff.parseTiff(good.take(good.length - 9)).isEmpty) // short IFD
    val magic = good.clone(); magic(2) = 43                // not 42
    assert(Tiff.parseTiff(magic).isEmpty)
    val order = good.clone(); order(0) = 'X'
    assert(Tiff.parseTiff(order).isEmpty)
    val wild = good.clone()                                // IFD offset 2^31-ish
    wild(4) = -1; wild(5) = -1; wild(6) = -1; wild(7) = 0x7f
    assert(Tiff.parseTiff(wild).isEmpty)
    val count = good.clone(); count(8) = -1; count(9) = -1 // 65535 entries
    assert(Tiff.parseTiff(count).isEmpty)
    // zero/negative dims out of contract
    assert(Tiff.parseTiff(Tiff.tiff(0, 10, 1, littleEndian = true)).isEmpty)
  }

  test("EXIF round-trips through both byte orders and both ASCII paths " +
    "(inline <= 4 bytes, offset beyond)") {
    for (le <- Seq(true, false)) {
      // model "M2" (3 bytes with NUL) rides INLINE; make/datetime off-load
      val app1 = Tiff.exifApp1(6, "CameraCorp", "M2",
        "2021:05:09 08:30:00", 640, 480, le)
      val jpeg = Tiff.withExif(JpegDc.jpegWithPixels(5L, 16, 8, 1), app1)
      val e = Tiff.parseExif(jpeg).getOrElse(fail(s"le=$le did not parse"))
      assert(e.orientation == 6)
      assert(e.make == "CameraCorp" && e.model == "M2")
      assert(e.dateTime == "2021:05:09 08:30:00") // sub-IFD DateTimeOriginal
      assert(e.exifW == 640 && e.exifH == 480)
    }
  }

  test("the spliced JPEG still entropy-decodes: APP1 rides transparently " +
    "through the full baseline path") {
    val id = 9L
    val base = JpegDc.jpegWithPixels(id, 24, 16, 1)
    val spliced = Tiff.withExif(base,
      Tiff.exifApp1(3, "Cam", "M", "2020:01:01 00:00:00", 24, 16,
        littleEndian = false))
    val d0 = JpegDc.decode(base).getOrElse(fail("base did not decode"))
    val d1 = JpegDc.decode(spliced).getOrElse(fail("spliced did not decode"))
    assert(d1.width == d0.width && d1.height == d0.height)
    assert(java.util.Arrays.equals(d1.pixels, d0.pixels))
  }

  test("JPEG without an Exif APP1 (or with dirty EXIF) yields None, " +
    "never a throw") {
    assert(Tiff.parseExif(JpegDc.jpegWithPixels(2L, 8, 8, 1)).isEmpty)
    assert(Tiff.parseExif(null).isEmpty)
    assert(Tiff.parseExif(Array[Byte](1, 2, 3)).isEmpty)
    val good = MediaFixtures.jpegExifMediaFor(4L)
    assert(Tiff.parseExif(good).isDefined)
    // corrupt the embedded TIFF byte-order mark: reject, not throw
    var i = 2
    var app1At = -1
    while (app1At < 0 && i + 3 < good.length) {
      if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xe1) app1At = i
      else i += 1
    }
    assert(app1At > 0)
    val bad = good.clone(); bad(app1At + 10) = 'Z'
    assert(Tiff.parseExif(bad).isEmpty)
    assert(Tiff.parseExif(good.take(app1At + 12)).isEmpty) // truncated APP1
  }

  test("pixel decode round-trips the closed form through every " +
    "variant axis: photometric 0/1/2, none/PackBits/LZW/deflate, " +
    "predictor, strip heights, both byte orders") {
    def expect(seed: Long, w: Int, h: Int, spp: Int): (Long, Int) = {
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until spp)
        sum += (7L * x + 13L * y + 29L * c + 31L * seed) % 256L
      (sum, w * h * spp)
    }
    for (seed <- 0L to 3L; photometric <- Seq(0, 1, 2);
        comp <- Seq(1, 32773, 5, 8); pred <- Seq(1, 2);
        rps <- Seq(1, 3, 100); le <- Seq(true, false)) {
      val w = 9; val h = 7
      val spp = if (photometric == 2) 3 else 1
      val bytes = Tiff.tiffWithPixels(seed, w, h, photometric,
        comp, rps, le, predictor = pred)
      val label = s"seed=$seed ph=$photometric c=$comp p=$pred " +
        s"rps=$rps le=$le"
      val d = Tiff.decodePixels(bytes).getOrElse(fail(label))
      assert(d.width == w && d.height == h && d.channels == spp)
      val (wantSum, wantN) = expect(seed, w, h, spp)
      assert(d.pixels.length == wantN)
      assert(d.pixels.map(_ & 0xffL).sum == wantSum, label)
      // positional, not just the sum: spot-check corners
      assert((d.pixels(0) & 0xff) == ((31 * seed) % 256).toInt)
      assert((d.pixels.last & 0xff) ==
        ((7L * (w - 1) + 13L * (h - 1) + 29L * (spp - 1) +
          31L * seed) % 256L).toInt)
    }
  }

  test("segmented grammar (r10): tiled x planar x 16-bit x " +
    "compression x byte order x predictor all round-trip the closed " +
    "form positionally, and the 8-bit view equals the classic " +
    "contract (high byte of v*257 == v)") {
    def px(seed: Long, x: Int, y: Int, c: Int): Int =
      ((7L * x + 13L * y + 29L * c + 31L * seed) % 256L).toInt
    for (seed <- 0L to 1L; photometric <- Seq(0, 1, 2);
        comp <- Seq(1, 32773, 5, 8); pred <- Seq(1, 2);
        bps <- Seq(8, 16); planar <- Seq(1, 2);
        tile <- Seq(None, Some((16, 16))); le <- Seq(true, false)) {
      // 20x21 forces a 2x2 tile grid with right+bottom padding
      val w = 20; val h = 21
      val spp = if (photometric == 2) 3 else 1
      val bytes = Tiff.tiffWithPixelsExt(seed, w, h, photometric, comp,
        le, pred, bps, planar, tile, rowsPerStrip = 5)
      val label = s"seed=$seed ph=$photometric c=$comp p=$pred " +
        s"bps=$bps pl=$planar t=$tile le=$le"
      // exact sample surface
      val (dw, dh, dspp, dbps, samples) =
        Tiff.decodePixels16(bytes).getOrElse(fail(s"16: $label"))
      assert((dw, dh, dspp, dbps) == ((w, h, spp, bps)), label)
      for (y <- Seq(0, 7, h - 1); x <- Seq(0, 9, w - 1); c <- 0 until spp) {
        val want = px(seed, x, y, c) * (if (bps == 16) 257 else 1)
        assert(samples((y * w + x) * spp + c) == want,
          s"$label @($x,$y,$c)")
      }
      assert(samples.map(_.toLong).sum ==
        (for (y <- 0 until h; x <- 0 until w; c <- 0 until spp)
          yield px(seed, x, y, c).toLong *
            (if (bps == 16) 257 else 1)).sum, label)
      // byte view == classic contract at either depth
      val d = Tiff.decodePixels(bytes).getOrElse(fail(s"8: $label"))
      assert((d.width, d.height, d.channels) == ((w, h, spp)), label)
      for (y <- Seq(0, h - 1); x <- Seq(0, w - 1); c <- 0 until spp)
        assert((d.pixels((y * w + x) * spp + c) & 0xff) ==
          px(seed, x, y, c), s"8bit $label @($x,$y,$c)")
    }
  }

  test("segmented validator stance: non-multiple-of-16 tile dims, " +
    "strip+tile coexistence, and truncated segment data all fail the " +
    "file (None, never a throw)") {
    val good = Tiff.tiffWithPixelsExt(1L, 20, 21, 1, 1, true, 1, 16, 1,
      Some((16, 16)), 5)
    assert(Tiff.decodePixels(good).isDefined)
    // tile width 12: spec violation (tag 322 inline value)
    val badTile = good.clone()
    // find tag 322 in the IFD and overwrite its value with 12
    val n = (badTile(8) & 0xff) | ((badTile(9) & 0xff) << 8)
    var patched = false
    (0 until n).foreach { i =>
      val off = 10 + 12 * i
      val tag = (badTile(off) & 0xff) | ((badTile(off + 1) & 0xff) << 8)
      if (tag == 322) { badTile(off + 8) = 12; patched = true }
    }
    assert(patched)
    assert(Tiff.decodePixels(badTile).isEmpty)
    assert(Tiff.decodePixels16(good.take(good.length / 2)).isEmpty)
    assert(Tiff.decodePixels16(Array[Byte](0, 1, 2)).isEmpty)
  }

  test("TIFF-LZW bitstream: a hand-computed vector pins the " +
    "MSB-first packing and early-change widths, not just a " +
    "self-consistent round trip") {
    // encode "ABABAB" (A=65, B=66), hand trace:
    //  prev=A; AB miss -> put(65), add AB=258, prev=B;
    //  BA miss -> put(66), add BA=259, prev=A;
    //  AB HIT -> prev=258;
    //  (258,A) miss -> put(258), add ABA=260, prev=A;
    //  AB HIT -> prev=258; end -> put(258), put(EOI).
    // Codes: 256 65 66 258 258 257, each 9-bit MSB-first.
    val bits = "100000000" + "001000001" + "001000010" + "100000010" +
      "100000010" + "100000001"
    val padded = bits.padTo((bits.length + 7) / 8 * 8, '0')
    val want = padded.grouped(8)
      .map(s => Integer.parseInt(s, 2).toByte).toArray
    val got = Tiff.lzwEncode("ABABAB".getBytes("US-ASCII"))
    assert(java.util.Arrays.equals(got, want),
      s"got=${got.map(b => f"$b%02x").mkString} " +
        s"want=${want.map(b => f"$b%02x").mkString}")
    // ...and repetitive input actually compresses
    val enc = Tiff.lzwEncode(
      (0 until 2000).map(i => ('a' + i % 3).toByte).toArray)
    assert(enc.length < 2000)
  }

  test("LZW survives a width-growth stream: >510 distinct pairs " +
    "force the 9->10->11 bit transitions both ways") {
    // low-periodicity bytes so the dictionary grows past the 510 and
    // 1022 early-change boundaries
    val data = Array.tabulate[Byte](60000)(i =>
      ((i * 31 + (i >> 5) * 17) % 251).toByte)
    val enc = Tiff.lzwEncode(data)
    val tif = Tiff.tiffWithPixels(1L, 200, 300, 1, 5, 300, true)
    assert(Tiff.decodePixels(tif).isDefined) // big single strip
    // and the raw pair through a fabricated strip: decode via the
    // private path by wrapping in a one-strip file is covered above;
    // here pin encode length sanity
    assert(enc.length > 0 && enc.length < data.length * 2)
  }

  test("pixel decode validator stance: corruption sweep never " +
    "throws across all four compressions; truncation fails loudly") {
    for (comp <- Seq(1, 32773, 5, 8)) {
      val good = Tiff.tiffWithPixels(3L, 9, 7, 1, comp,
        rowsPerStrip = 2, littleEndian = true)
      assert(Tiff.decodePixels(good).isDefined, s"c=$comp")
      for (i <- good.indices) {
        val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
        val r = Tiff.decodePixels(bad) // no throw
        r.foreach(d => assert(d.pixels.length == d.width * d.height *
          d.channels))
      }
      assert(Tiff.decodePixels(good.take(20)).isEmpty)
      assert(Tiff.decodePixels(good.dropRight(3)).isEmpty, s"c=$comp")
    }
  }

  test("pixel_stats dispatches TIFF magic to the real decoder; the " +
    "fixture sum matches the analytic form") {
    val df = spark.range(12).selectExpr(
      "pixel_stats(tiffpx_media_for_id(id)) AS st", "id")
    val rows = df.selectExpr("id", "st.pix_sum", "st.pix_count")
      .collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val w = (6 + id % 11).toInt; val h = (4 + id % 7).toInt
      val spp = if (id % 3 == 2) 3 else 1
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until spp)
        sum += (7L * x + 13L * y + 29L * c + 31L * id) % 256L
      assert(r.getLong(1) == sum, s"id=$id")
      assert(r.getLong(2) == w.toLong * h * spp, s"id=$id")
    }
  }

  test("JPEG-in-TIFF (Compression 7): the strip decodes through the " +
    "full baseline JPEG path to the same pixels as the bare JPEG; " +
    "geometry mismatches and predictor misuse fail the file") {
    for (id <- 0L until 10L) {
      val tif = MediaFixtures.tiffJpegFor(id)
      val d = Tiff.decodePixels(tif).getOrElse(fail(s"id=$id"))
      val w = 8 * (1 + id % 6).toInt; val h = 8 * (1 + id % 5).toInt
      val ch = if (id % 2 == 0) 3 else 1
      val direct = JpegDc.decode(
        JpegDc.jpegWithPixels(id, w, h, ch)).get
      assert(d.width == w && d.height == h && d.channels == ch)
      assert(java.util.Arrays.equals(d.pixels, direct.pixels), s"id=$id")
    }
    // geometry lie: container says 16 wide, strip decodes 8 wide
    val lying = Tiff.tiffContainer(16, 8, 1, 1, 7, 8, true, 1,
      Seq(JpegDc.jpegWithPixels(1L, 8, 8, 1)))
    assert(Tiff.decodePixels(lying).isEmpty)
    // predictor 2 with JPEG strips is out of spec
    val badPred = Tiff.tiffContainer(8, 8, 1, 1, 7, 8, true, 2,
      Seq(JpegDc.jpegWithPixels(1L, 8, 8, 1)))
    assert(Tiff.decodePixels(badPred).isEmpty)
    // YCbCr photometric without JPEG compression rejects
    val badPhoto = Tiff.tiffContainer(8, 8, 3, 6, 1, 8, true, 1,
      Seq(new Array[Byte](8 * 8 * 3)))
    assert(Tiff.decodePixels(badPhoto).isEmpty)
  }

  test("media_features routes TIFF (and BMP) through the real " +
    "decode: the luminance histogram matches one computed from " +
    "decodePixels directly, not the byte-sum fallback head") {
    def histogram(d: PngPixels.Decoded, dim: Int): Array[Float] = {
      val counts = new Array[Long](dim)
      var i = 0
      while (i < d.pixels.length) {
        val v =
          if (d.channels >= 3)
            (299 * (d.pixels(i) & 0xff) + 587 * (d.pixels(i + 1) & 0xff) +
              114 * (d.pixels(i + 2) & 0xff)) / 1000
          else d.pixels(i) & 0xff
        counts(v * dim / 256) += 1
        i += d.channels
      }
      val total = math.max(1L, counts.sum)
      counts.map(_.toFloat / total)
    }
    for (id <- 0L until 8L) {
      val tif = MediaFixtures.tiffPixelMediaFor(id)
      val want = histogram(Tiff.decodePixels(tif).get, 12)
      val got = graft.functions.MediaFeatures.compute(tif, 12)
        .toFloatArray()
      assert(got.sameElements(want), s"tiff id=$id")
      val bmp = MediaFixtures.bmpMediaFor(id)
      val wantB = histogram(Bmp.decode(bmp).get, 12)
      val gotB = graft.functions.MediaFeatures.compute(bmp, 12)
        .toFloatArray()
      assert(gotB.sameElements(wantB), s"bmp id=$id")
    }
  }

  test("parse_media dispatches the tiff format; fixtures follow the " +
    "closed forms the oracle re-derives") {
    for (id <- 0L to 10L) {
      val m = MediaCodec.parse(MediaFixtures.tiffMediaFor(id)).get
      assert(m.format == "tiff")
      assert(m.width == 20 + (id * 9) % 300)
      assert(m.height == 15 + (id * 4) % 200)
      assert(m.channels == 1 + id % 4)
      val e = Tiff.parseExif(MediaFixtures.jpegExifMediaFor(id)).get
      assert(e.orientation == 1 + id % 8)
      assert(e.make == s"Cam${id % 5}" && e.model == s"M${id % 7}")
      assert(e.exifW == 8 * (1 + id % 3) && e.exifH == 8 * (1 + id % 2))
    }
  }
}
