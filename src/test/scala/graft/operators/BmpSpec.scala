package graft.operators

import graft.SparkTestBase

/** Real BMP codec: decoded RGB must equal the shared pixel contract
  * through both row orders and every padding residue; out-of-subset
  * and corrupt bytes reject; the format dispatches through the shared
  * image kernels. */
class BmpSpec extends SparkTestBase {

  test("decode(encode) recovers the contract — both row orders, every " +
    "row-padding residue") {
    for (w <- 5 to 8; topDown <- Seq(false, true)) { // w*3 mod 4 cycles
      val id = 3L + w
      val h = 6
      val d = Bmp.decode(Bmp.bmpWithPixels(id, w, h, topDown))
        .getOrElse(fail(s"w=$w topDown=$topDown did not decode"))
      assert(d.width == w && d.height == h && d.channels == 3)
      var i = 0
      while (i < d.pixels.length) {
        val x = (i / 3) % w; val y = i / (w * 3); val c = i % 3
        assert((d.pixels(i) & 0xff) == PngPixels.pix(id, x, y, c),
          s"w=$w topDown=$topDown x=$x y=$y c=$c")
        i += 1
      }
      // the two storage orders produce identical rasters
      if (topDown) {
        val up = Bmp.decode(Bmp.bmpWithPixels(id, w, h, topDown = false)).get
        assert(java.util.Arrays.equals(up.pixels, d.pixels))
      }
    }
  }

  test("out-of-subset and corrupt bytes reject; adversarial dims are " +
    "capped before allocation") {
    val good = MediaFixtures.bmpMediaFor(7L)
    assert(Bmp.decode(good).isDefined)
    assert(Bmp.decode(good.take(40)).isEmpty)           // truncated header
    assert(Bmp.decode(good.take(good.length - 5)).isEmpty) // short pixels
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(Bmp.decode(bpp8).isEmpty)                    // depth out of subset
    val rle = good.clone(); rle(30) = 1
    assert(Bmp.decode(rle).isEmpty)                     // compressed
    // huge header dims must reject before allocating
    val big = good.clone()
    big(18) = -1; big(19) = -1; big(20) = -1; big(21) = 0x7f
    assert(Bmp.decode(big).isEmpty)
    assert(Bmp.decode("BMnope".getBytes("US-ASCII")).isEmpty)
    assert(Bmp.decode(MediaFixtures.pixelMediaFor(1L)).isEmpty)
  }

  test("BMP dispatches through the shared image kernels: header parse, " +
    "pixel_stats, dHash, resize") {
    val b = MediaFixtures.bmpMediaFor(12L) // 17x16
    val m = MediaCodec.parse(b).get
    assert(m.format == "bmp" && m.width == 17 && m.height == 16 &&
      m.channels == 3)
    assert(graft.functions.PixelStats.statsToRow(b) != null)
    assert(graft.functions.ImageDhash.compute(b) != null)
    val resized = graft.functions.ImageResize.compute(b, 8, 6)
    val rd = PngPixels.decode(resized).get
    assert(rd.width == 8 && rd.height == 6 && rd.channels == 3)
    // a BMP and a PNG carrying the SAME contract pixels hash identically
    // (the perceptual hash sees content, not container)
    val pngTwin = PngPixels.pngWithPixels(12L, 17, 16, 2)
    val hb = graft.functions.ImageDhash.compute(b)
    val hp = graft.functions.ImageDhash.compute(pngTwin)
    assert(hb.getLong(0) == hp.getLong(0) && hb.getLong(1) == hp.getLong(1))
  }
}
