package graft.operators

import graft.SparkTestBase

/** VP8 keyframe decode — EXTERNAL conformance: YUV planes must equal
  * system libwebp's decode of real libwebp-encoded files byte-for-byte
  * (VP8 decode is bit-exact by spec, so "close" is just "wrong"). */
class Vp8Spec extends SparkTestBase {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/external/$name")
    require(in != null, s"missing resource $name")
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Locate the VP8 chunk payload inside a RIFF/WEBP container. */
  private def vp8Chunk(b: Array[Byte]): (Int, Int) = {
    def le32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    var off = 12
    while (off + 8 <= b.length) {
      val tag = new String(b.slice(off, off + 4), "US-ASCII")
      val size = le32(off + 4)
      if (tag == "VP8 ") return (off + 8, size)
      off += 8 + size + (size & 1)
    }
    fail("no VP8 chunk")
  }

  private def check(name: String): Unit = {
    val Array(w, h) = new String(res(s"$name.meta"), "US-ASCII")
      .trim.split(" ").map(_.toInt)
    val want = res(s"$name.yuv")
    val file = res(s"$name.webp")
    val (off, len) = vp8Chunk(file)
    val got = Vp8.decodeFrame(file, off, len)
      .getOrElse(fail(s"$name: decode returned None"))
    assert((got.width, got.height) == ((w, h)), name)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val wy = want.slice(0, w * h)
    val wu = want.slice(w * h, w * h + cw * ch)
    val wv = want.slice(w * h + cw * ch, w * h + 2 * cw * ch)
    def diffStats(a: Array[Byte], b: Array[Byte], plane: String): Unit = {
      val diffs = a.indices.count(i => a(i) != b(i))
      val first = a.indices.find(i => a(i) != b(i)).getOrElse(-1)
      assert(diffs == 0,
        s"$name $plane: $diffs/${a.length} bytes differ; first at $first")
    }
    diffStats(got.y, wy, "Y")
    diffStats(got.u, wu, "U")
    diffStats(got.v, wv, "V")
  }

  test("vp8_tiny (16x16, q20): single-MB keyframe decodes " +
    "byte-exactly vs libwebp") { check("vp8_tiny") }

  test("vp8_smooth (48x32, q75): multi-MB, loop filter across MB " +
    "edges, byte-exact") { check("vp8_smooth") }

  test("vp8_odd (37x21, q60): non-multiple-of-16 crop, byte-exact") {
    check("vp8_odd")
  }

  test("vp8_detail (80x48, q90): B_PRED-rich content, all 10 sub-modes " +
    "territory, byte-exact") { check("vp8_detail") }

  test("python.webp (CPython fixture, VP8X+ALPH+VP8): the lossy color " +
    "chunk decodes byte-exactly vs libwebp") {
    val file = res("python.webp")
    val want = res("python_webp.yuv")
    val (off, len) = vp8Chunk(file)
    val got = Vp8.decodeFrame(file, off, len).getOrElse(fail("None"))
    assert((got.width, got.height) == ((16, 16)))
    assert(got.y.toSeq == want.slice(0, 256).toSeq, "Y differs")
    assert(got.u.toSeq == want.slice(256, 320).toSeq, "U differs")
    assert(got.v.toSeq == want.slice(320, 384).toSeq, "V differs")
  }

  test("dirty bytes reject: truncation, bad start code, inter frame " +
    "bit — None, never a throw") {
    val file = res("vp8_tiny.webp")
    val (off, len) = vp8Chunk(file)
    assert(Vp8.decodeFrame(file, off, 5).isEmpty)
    val bad = file.clone(); bad(off + 3) = 0x00
    assert(Vp8.decodeFrame(bad, off, len).isEmpty)
    val inter = file.clone(); inter(off) = (inter(off) | 1).toByte
    assert(Vp8.decodeFrame(inter, off, len).isEmpty)
    assert(Vp8.decodeFrame(file, off, len).isDefined) // control
  }
}
