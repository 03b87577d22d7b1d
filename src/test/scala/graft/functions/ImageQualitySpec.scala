package graft.functions

import graft.operators.{MediaFixtures, PngPixels}
import org.scalatest.funsuite.AnyFunSuite

/** image_quality: the integer curation moments agree with a
  * brute-force reference over the decoded raster, the dispatch covers
  * every pixel-decoder family, degenerate images are flagged, and
  * dirty bytes null out. */
class ImageQualitySpec extends AnyFunSuite {

  /** Independent reference: same definition, straight off a decoded
    * raster (the kernel instead walks its own luminance plane). */
  private def reference(d: PngPixels.Decoded)
      : (Long, Long, Long, Int) = {
    val lum = Array.tabulate(d.width * d.height) { p =>
      val o = p * d.channels
      if (d.channels >= 3)
        (299 * (d.pixels(o) & 0xff) + 587 * (d.pixels(o + 1) & 0xff) +
          114 * (d.pixels(o + 2) & 0xff)) / 1000
      else d.pixels(o) & 0xff
    }
    val lumSum = lum.map(_.toLong).sum
    val lumSq = lum.map(v => v.toLong * v).sum
    var lapSq = 0L
    for (y <- 1 until d.height - 1; x <- 1 until d.width - 1) {
      val lap = 4 * lum(y * d.width + x) - lum(y * d.width + x - 1) -
        lum(y * d.width + x + 1) - lum((y - 1) * d.width + x) -
        lum((y + 1) * d.width + x)
      lapSq += lap.toLong * lap
    }
    (lumSum, lumSq, lapSq, lum.distinct.length)
  }

  test("moments match the brute-force reference across all five " +
    "decoder families (PNG, JPEG, BMP, VP8L WebP, TIFF)") {
    val fixtures = Seq(
      MediaFixtures.pixelMediaFor(4L), MediaFixtures.pixelMediaFor(7L),
      MediaFixtures.jpegPixelMediaFor(4L),
      MediaFixtures.jpegPixelMediaFor(9L),
      MediaFixtures.bmpMediaFor(3L),
      MediaFixtures.webpPixelMediaFor(5L),
      MediaFixtures.tiffPixelMediaFor(2L))
    fixtures.foreach { bytes =>
      val row = ImageQuality.statsToRow(bytes)
      assert(row != null)
      val d = ImageQuality.decodeAny(bytes).get
      val (ls, lq, lp, ng) = reference(d)
      assert(row.getInt(0) == d.width && row.getInt(1) == d.height &&
        row.getInt(2) == d.channels)
      assert(row.getLong(3) == ls && row.getLong(4) == lq &&
        row.getLong(5) == lp && row.getInt(6) == ng)
    }
  }

  /** Gray raster → BMP via the general-purpose writer (r=g=b keeps
    * the 299/587/114 luminance equal to the gray value exactly). */
  private def grayBmp(gray: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < gray.length) {
      rgb(3 * i) = gray(i); rgb(3 * i + 1) = gray(i)
      rgb(3 * i + 2) = gray(i); i += 1
    }
    graft.operators.Bmp.bmpFromRaster(rgb, w, h)
  }

  test("a flat image is degenerate: n_gray = 1, zero Laplacian " +
    "energy, and the derived scores land where a curator expects") {
    // a solid-gray image: every pixel 77
    val w = 12; val h = 9
    val bytes = grayBmp(Array.fill[Byte](w * h)(77.toByte), w, h)
    val row = ImageQuality.statsToRow(bytes)
    assert(row != null)
    assert(row.getInt(6) == 1, "n_gray")
    assert(row.getLong(5) == 0L, "lap_sq_sum")
    val n = w.toLong * h
    val brightness = row.getLong(3).toDouble / n
    assert(math.abs(brightness - 77.0) < 1e-9)
    val contrast = row.getLong(4).toDouble / n - brightness * brightness
    assert(math.abs(contrast) < 1e-9)
  }

  test("sharp edges carry more Laplacian energy than a smooth ramp — " +
    "the blur-scoring direction is right") {
    val w = 16; val h = 16
    val ramp = Array.tabulate[Byte](w * h)(i => (i % w * 8).toByte)
    val checker = Array.tabulate[Byte](w * h) { i =>
      if ((i % w + i / w) % 2 == 0) 0.toByte else 200.toByte
    }
    val rampRow = ImageQuality.statsToRow(grayBmp(ramp, w, h))
    val checkerRow = ImageQuality.statsToRow(grayBmp(checker, w, h))
    assert(checkerRow.getLong(5) > rampRow.getLong(5) * 100)
  }

  test("dirty bytes and unknown formats null out, never throw") {
    assert(ImageQuality.statsToRow(Array[Byte](1, 2, 3)) == null)
    assert(ImageQuality.statsToRow("not an image at all".getBytes) == null)
    val good = MediaFixtures.pixelMediaFor(6L)
    var i = 0
    while (i < good.length) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x7f).toByte
      ImageQuality.statsToRow(bad) // null or a row — never a throw
      i += 5
    }
  }
}
