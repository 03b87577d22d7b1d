package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8L lossless WebP: round-trips through every coding feature
  * (plain literals, meta groups, color cache, LZ77 with the 2D
  * distance map, and all four transforms), spec-constant spot checks,
  * and the validator stance on corrupt bytes. */
class WebpSpec extends AnyFunSuite {

  private def argbImage(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  private def gradient(w: Int, h: Int, seed: Int): Array[Int] =
    argbImage(w, h, (x, y) => 0xff000000 |
      (((x * 3 + y * 5 + seed * 7) % 256) << 16) |
      (((x * 3 + y * 5 + seed * 7 + 11) % 256) << 8) |
      ((x * 3 + y * 5 + seed * 7 + 22) % 256))

  private def roundTrip(
      argb: Array[Int], w: Int, h: Int,
      opts: Webp.EncodeOptions = Webp.EncodeOptions()): Unit = {
    val bytes = Webp.encode(argb, w, h, opts)
    val d = Webp.decode(bytes).getOrElse(fail("decode returned None"))
    assert(d.width == w && d.height == h)
    val ch = if (opts.alphaHint) 4 else 3
    assert(d.channels == ch)
    var i = 0
    while (i < w * h) {
      val p = argb(i)
      assert((d.pixels(i * ch) & 0xff) == ((p >> 16) & 0xff),
        s"R at $i")
      assert((d.pixels(i * ch + 1) & 0xff) == ((p >> 8) & 0xff),
        s"G at $i")
      assert((d.pixels(i * ch + 2) & 0xff) == (p & 0xff), s"B at $i")
      if (ch == 4)
        assert((d.pixels(i * ch + 3) & 0xff) == ((p >>> 24) & 0xff),
          s"A at $i")
      i += 1
    }
  }

  test("plain literal coding round-trips (normal prefix codes)") {
    roundTrip(gradient(17, 11, 1), 17, 11)
  }

  test("1x1 and single-row/column images round-trip") {
    roundTrip(Array(0xff4080c0), 1, 1)
    roundTrip(gradient(9, 1, 2), 9, 1)
    roundTrip(gradient(1, 9, 3), 1, 9)
  }

  test("alpha channel round-trips when the hint is set") {
    val img = argbImage(13, 7, (x, y) =>
      (((x + y * 3) % 256) << 24) | (((x * 5) % 256) << 16) |
        (((y * 7) % 256) << 8) | ((x * 3 + y) % 256))
    roundTrip(img, 13, 7, Webp.EncodeOptions(alphaHint = true))
  }

  test("subtract-green transform round-trips") {
    roundTrip(gradient(16, 10, 4), 16, 10,
      Webp.EncodeOptions(subtractGreen = true))
  }

  test("predictor transform round-trips through ALL 14 modes") {
    // 4-px blocks over a 20x16 image = 5x4 blocks; (bx+by*5)%14
    // cycles every mode incl. Select and both ClampAddSubtract forms
    roundTrip(gradient(20, 16, 5), 20, 16,
      Webp.EncodeOptions(predictorBits = 2,
        predictorModeOf = (bx, by) => (bx + by * 5) % 14))
  }

  test("cross-color transform round-trips with signed multipliers") {
    roundTrip(gradient(18, 12, 6), 18, 12,
      Webp.EncodeOptions(colorBits = 2,
        cteOf = (bx, by) => ((bx * 37 + 100) % 256, (by * 53 + 200) % 256,
          ((bx + by) * 71 + 15) % 256)))
  }

  test("color cache round-trips and actually produces cache hits") {
    // few distinct colors → many cache hits
    val img = argbImage(20, 12, (x, y) =>
      0xff000000 | (((x + y) % 4) * 0x102030))
    roundTrip(img, 20, 12, Webp.EncodeOptions(cacheBits = 4))
    // the cached stream must be SMALLER than the literal one
    val withCache = Webp.encode(img, 20, 12,
      Webp.EncodeOptions(cacheBits = 4)).length
    val without = Webp.encode(img, 20, 12).length
    assert(withCache < without, s"$withCache !< $without")
  }

  test("LZ77 row copies round-trip (2D distance-map branch, dy=4)") {
    val img = argbImage(15, 13, (x, y) => 0xff000000 |
      (((x * 3 + (y % 4) * 5) % 256) << 16) |
      (((x * 7 + (y % 4) * 11) % 256) << 8) |
      ((x * 13 + (y % 4) * 17) % 256))
    roundTrip(img, 15, 13, Webp.EncodeOptions(lzRowPeriod = 4))
    // copies must compress vs literals
    val lz = Webp.encode(img, 15, 13,
      Webp.EncodeOptions(lzRowPeriod = 4)).length
    val lit = Webp.encode(img, 15, 13).length
    assert(lz < lit, s"$lz !< $lit")
  }

  test("meta prefix image with two groups round-trips") {
    roundTrip(gradient(16, 16, 7), 16, 16,
      Webp.EncodeOptions(metaSplit = true))
  }

  test("color indexing round-trips: packed (<=16 colors) and " +
    "byte-wide (>16) palettes") {
    // 7 colors → widthBits=1 (two 4-bit indices per green byte)
    val pal7 = Array.tabulate(7)(j =>
      0xff000000 | ((j * 7 + 36) << 16) | ((j * 7 + 5) << 8) | (j * 7 + 67))
    val img7 = argbImage(19, 9, (x, y) => pal7((x + 2 * y) % 7))
    roundTrip(img7, 19, 9, Webp.EncodeOptions(palette = Some(pal7)))
    // 2 colors → widthBits=3 (8 pixels per byte)
    val pal2 = Array(0xff102030, 0xffddccbb)
    val img2 = argbImage(21, 5, (x, y) => pal2((x + y) % 2))
    roundTrip(img2, 21, 5, Webp.EncodeOptions(palette = Some(pal2)))
    // 20 colors → no packing
    val pal20 = Array.tabulate(20)(j =>
      0xff000000 | ((j * 11 + 3) << 16) | ((j * 13 + 7) << 8) | (j * 17 + 9))
    val img20 = argbImage(11, 8, (x, y) => pal20((x * 3 + y) % 20))
    roundTrip(img20, 11, 8, Webp.EncodeOptions(palette = Some(pal20)))
  }

  test("spec constants: distance map entries and the cache hash") {
    // code 1 = pixel above, code 2 = left neighbor, code 23 = (0,4)
    assert(Webp.DistanceMap(0) == ((0, 1)))
    assert(Webp.DistanceMap(1) == ((1, 0)))
    assert(Webp.DistanceMap(22) == ((0, 4)))
    assert(Webp.DistanceMap.length == 120)
    // every entry unique and within the 8-wide neighborhood
    assert(Webp.DistanceMap.distinct.length == 120)
    Webp.DistanceMap.foreach { case (dx, dy) =>
      assert(dx >= -8 && dx <= 8 && dy >= 0 && dy <= 7)
    }
    // signed color delta: (t * c) >> 5 on int8 views
    assert(Webp.colorDelta(0, 100) == 0)
    assert(Webp.colorDelta(32, 64) == 64)    // 32*64>>5
    assert(Webp.colorDelta(224, 64) == -64)  // t=-32 as int8
    assert(Webp.colorDelta(32, 192) == -64)  // c=-64 as int8
  }

  test("validator stance: truncation, bad signature, bad version, " +
    "and bit corruption never throw — they decode to None or a " +
    "DIFFERENT valid image, never a crash") {
    val good = Webp.encode(gradient(12, 9, 8), 12, 9)
    assert(Webp.decode(good).isDefined)
    assert(Webp.decode(null).isEmpty)
    assert(Webp.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Webp.decode(good.take(20)).isEmpty)
    assert(Webp.decode(good.take(good.length / 2)).isEmpty)
    val badSig = good.clone(); badSig(12) = 'X'.toByte
    assert(Webp.decode(badSig).isEmpty)
    // flip every byte position one at a time — None or a decode, no
    // exception escapes (Webp.decode guards)
    var pos = 20
    while (pos < good.length) {
      val mut = good.clone()
      mut(pos) = (mut(pos) ^ 0x55).toByte
      Webp.decode(mut) // must not throw
      pos += 1
    }
  }

  test("lossy VP8 payloads return None (the documented seam)") {
    val lossy = MediaFixtures.webpMediaFor(0L) // id 0 → VP8 variant
    assert(new String(lossy.slice(12, 16), "US-ASCII") == "VP8 ")
    assert(Webp.decode(lossy).isEmpty)
  }
}
