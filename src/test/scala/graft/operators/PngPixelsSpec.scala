package graft.operators

import graft.SparkTestBase

/** Real PNG pixel codec: every decoded byte must equal the pixel
  * contract after a genuine zlib round-trip, across all five scanline
  * filters and both color types; dirty bytes must be rejected, never
  * thrown on. */
class PngPixelsSpec extends SparkTestBase {

  test("decode(encode) recovers the exact pixel contract — all five " +
    "filters, both color types") {
    // ids 0..9 with h >= 8 cycle the (y+id)%5 filter through all types
    // in both gray (odd id) and truecolor (even id)
    (0L until 10L).foreach { id =>
      val bytes = MediaFixtures.pixelMediaFor(id)
      val d = PngPixels.decode(bytes).getOrElse(
        fail(s"id=$id did not decode"))
      assert(d.width == 8 + id % 40 && d.height == 8 + id % 30)
      assert(d.channels == (if (id % 2 == 0) 3 else 1))
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / d.channels) % d.width
        val y = i / (d.width * d.channels)
        val c = i % d.channels
        assert((d.pixels(i) & 0xff) == PngPixels.pix(id, x, y, c),
          s"id=$id x=$x y=$y c=$c")
        i += 1
      }
    }
  }

  test("large image round-trips (multi-buffer inflate)") {
    val bytes = PngPixels.pngWithPixels(7L, 200, 150, 2)
    val d = PngPixels.decode(bytes).get
    assert(d.width == 200 && d.height == 150 && d.channels == 3)
    assert(d.pixels.length == 200 * 150 * 3)
    assert((d.pixels(0) & 0xff) == PngPixels.pix(7L, 0, 0, 0))
    assert((d.pixels.last & 0xff) == PngPixels.pix(7L, 199, 149, 2))
  }

  test("adversarial header dims are rejected before allocation (Long " +
    "size math + decode cap — no OOM, no negative-size throw)") {
    def patchDims(png: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = png.clone()
      def be(o: Int, v: Int): Unit = {
        out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
        out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      }
      be(16, w); be(20, h) // IHDR body starts at 16 (8 sig + len + tag)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 12, 4 + 13)
      be(29, crc.getValue.toInt)
      out
    }
    val base = MediaFixtures.pixelMediaFor(3L)
    // (w*ch+1)*h overflows Int; must return None, not misdecode
    assert(PngPixels.decode(patchDims(base, 0x41000000, 0x2000)).isEmpty)
    // under Int.MaxValue but over the decode cap: reject BEFORE the
    // multi-hundred-MB allocation (OOM would be an uncatchable Error)
    assert(PngPixels.decode(patchDims(base, 1 << 20, 1 << 10)).isEmpty)
    // the patch helper itself is sound: identity patch still decodes
    assert(PngPixels.decode(patchDims(base, 11, 11)).isDefined)
  }

  test("dirty bytes are rejected, never thrown on") {
    val good = MediaFixtures.pixelMediaFor(4L)
    // flip one byte inside the IDAT payload → CRC mismatch
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x5a).toByte
    assert(PngPixels.decode(corrupt).isEmpty)
    // truncated stream
    assert(PngPixels.decode(good.take(good.length - 9)).isEmpty)
    // header-only PNG (no IDAT) — parseable header, no pixels
    assert(PngPixels.decode(MediaFixtures.png(16, 16, 2)).isEmpty)
    // not a PNG at all
    assert(PngPixels.decode(MediaFixtures.jpeg(16, 16, 3)).isEmpty)
    assert(PngPixels.decode(Array[Byte]()).isEmpty)
    assert(PngPixels.decode("hello".getBytes("UTF-8")).isEmpty)
  }

  test("seeded fuzz: 50 random (id, w, h, colorType) combos round-trip " +
    "bit-exactly") {
    val rnd = new scala.util.Random(20260813L)
    (0 until 50).foreach { _ =>
      val id = rnd.nextLong(1000000L)
      val w = 1 + rnd.nextInt(80)
      val h = 1 + rnd.nextInt(60)
      val ct = if (rnd.nextBoolean()) 2 else 0
      val d = PngPixels.decode(PngPixels.pngWithPixels(id, w, h, ct))
        .getOrElse(fail(s"id=$id ${w}x$h ct=$ct did not decode"))
      assert(d.width == w && d.height == h)
      val ch = d.channels
      var i = 0
      while (i < d.pixels.length) {
        assert((d.pixels(i) & 0xff) ==
          PngPixels.pix(id, (i / ch) % w, i / (w * ch), i % ch),
          s"id=$id ${w}x$h ct=$ct i=$i")
        i += 1
      }
    }
  }

  test("web subset: all five color types round-trip, interlaced and " +
    "sequential, and Adam7 is invisible to the pixel contract") {
    val types = Array(0, 2, 3, 4, 6)
    for (ct <- types; inter <- Seq(false, true); (w, h) <- Seq(
      (1, 1), (3, 2), (7, 5), (8, 8), (13, 11), (40, 23))) {
      val id = 11L + ct * 7 + w
      val d = PngPixels.decode(PngPixels.pngWithPixels(id, w, h, ct, inter))
        .getOrElse(fail(s"ct=$ct inter=$inter ${w}x$h did not decode"))
      assert(d.width == w && d.height == h)
      val expCh = ct match {
        case 0 => 1; case 2 => 3; case 3 => 3; case 4 => 2; case 6 => 4
      }
      assert(d.channels == expCh, s"ct=$ct")
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / expCh) % w; val y = i / (w * expCh); val c = i % expCh
        val want =
          if (ct == 3) PngPixels.pal(PngPixels.pix(id, x, y, 0), c)
          else PngPixels.pix(id, x, y, c)
        assert((d.pixels(i) & 0xff) == want,
          s"ct=$ct inter=$inter ${w}x$h x=$x y=$y c=$c")
        i += 1
      }
      // layout independence: interlaced bytes differ, pixels match
      if (inter) {
        val seq = PngPixels.decode(
          PngPixels.pngWithPixels(id, w, h, ct, interlaced = false)).get
        assert(java.util.Arrays.equals(seq.pixels, d.pixels))
      }
    }
  }

  test("palette spec violations are rejected: missing PLTE, " +
    "out-of-range index") {
    val good = PngPixels.pngWithPixels(5L, 12, 9, 3)
    // strip the PLTE chunk (starts after sig(8) + IHDR(12+13))
    val plteStart = 8 + 12 + 13
    val plteLen = 12 + 256 * 3
    val noPlte = good.take(plteStart) ++ good.drop(plteStart + plteLen)
    assert(PngPixels.decode(noPlte).isEmpty)
    // shrink PLTE to 16 entries (indices reach 255 -> out of range);
    // rebuild the chunk with a valid CRC so ONLY the range check fires
    val shortBody = new Array[Byte](4 + 16 * 3)
    System.arraycopy("PLTE".getBytes("US-ASCII"), 0, shortBody, 0, 4)
    var j = 0
    while (j < 16 * 3) {
      shortBody(4 + j) = PngPixels.pal(j / 3, j % 3).toByte; j += 1
    }
    val crc = new java.util.zip.CRC32(); crc.update(shortBody)
    val lenB = java.nio.ByteBuffer.allocate(4).putInt(16 * 3).array()
    val crcB = java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array()
    val shortPlte = good.take(plteStart) ++ lenB ++ shortBody ++ crcB ++
      good.drop(plteStart + plteLen)
    assert(PngPixels.decode(shortPlte).isEmpty)
  }

  test("web-subset fuzz: 60 random (id, w, h, type, interlace) combos " +
    "round-trip bit-exactly") {
    val rnd = new scala.util.Random(20260814L)
    val types = Array(0, 2, 3, 4, 6)
    (0 until 60).foreach { _ =>
      val id = rnd.nextLong(1000000L)
      val w = 1 + rnd.nextInt(50)
      val h = 1 + rnd.nextInt(40)
      val ct = types(rnd.nextInt(5))
      val inter = rnd.nextBoolean()
      val d = PngPixels.decode(PngPixels.pngWithPixels(id, w, h, ct, inter))
        .getOrElse(fail(s"id=$id ${w}x$h ct=$ct inter=$inter"))
      val ch = d.channels
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / ch) % w; val y = i / (w * ch); val c = i % ch
        val want =
          if (ct == 3) PngPixels.pal(PngPixels.pix(id, x, y, 0), c)
          else PngPixels.pix(id, x, y, c)
        assert((d.pixels(i) & 0xff) == want,
          s"id=$id ${w}x$h ct=$ct inter=$inter i=$i")
        i += 1
      }
    }
  }

  test("the header parse still reads pixel-bearing PNGs (same IHDR)") {
    val m = MediaCodec.parse(MediaFixtures.pixelMediaFor(6L)).get
    assert(m.format == "png" && m.width == 8 + 6 % 40 && m.channels == 3)
  }
}
