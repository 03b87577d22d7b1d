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
