package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function codec tests: generator → parser round trips plus the
  * dirty-byte tolerance a 100 TB decode stage needs. */
class MediaCodecSpec extends AnyFunSuite {

  test("PNG round trip across every color type") {
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      val m = MediaCodec.parse(MediaFixtures.png(1234, 987, ct))
      assert(m.contains(MediaCodec.Meta(1234, 987, ch, "png")), s"ct=$ct")
    }
  }

  test("JPEG round trip, 1 and 3 components; SOF0 found past APP0") {
    assert(MediaCodec.parse(MediaFixtures.jpeg(320, 200, 3))
      .contains(MediaCodec.Meta(320, 200, 3, "jpeg")))
    assert(MediaCodec.parse(MediaFixtures.jpeg(65535, 1, 1))
      .contains(MediaCodec.Meta(65535, 1, 1, "jpeg")))
  }

  test("JPEG marker walk skips extra segments (comment before SOF0)") {
    val base = MediaFixtures.jpeg(100, 50, 3)
    // splice a COM segment (FF FE, len 4, 2 payload bytes) after APP0
    val insertAt = 2 + 18 // SOI + APP0
    val com = Array(0xff, 0xfe, 0x00, 0x04, 0x41, 0x42).map(_.toByte)
    val spliced = base.take(insertAt) ++ com ++ base.drop(insertAt)
    assert(MediaCodec.parse(spliced)
      .contains(MediaCodec.Meta(100, 50, 3, "jpeg")))
  }

  test("dirty bytes: truncated, corrupt, wrong-signature, null → None") {
    assert(MediaCodec.parse(null).isEmpty)
    assert(MediaCodec.parse(Array.empty[Byte]).isEmpty)
    assert(MediaCodec.parse("plain text".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.parse(MediaFixtures.png(10, 10, 2).take(20)).isEmpty)
    assert(MediaCodec.parse(MediaFixtures.jpeg(10, 10, 3).take(6)).isEmpty)
    // PNG signature but a non-IHDR first chunk
    val bad = MediaFixtures.png(10, 10, 2)
    bad(12) = 'X'.toByte
    assert(MediaCodec.parse(bad).isEmpty)
    // zero dimensions are rejected, not emitted
    assert(MediaCodec.parse(MediaFixtures.png(0, 10, 2)).isEmpty)
  }

  test("CRCs in generated PNGs are real (any compliant reader accepts)") {
    val b = MediaFixtures.png(33, 44, 2)
    // IHDR chunk: type+data at bytes 12..28, CRC at 29..32
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 17)
    val stored = ((b(29) & 0xffL) << 24) | ((b(30) & 0xffL) << 16) |
      ((b(31) & 0xffL) << 8) | (b(32) & 0xffL)
    assert(stored == (crc.getValue & 0xffffffffL))
  }
}
