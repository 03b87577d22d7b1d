package graft.operators

import graft.SparkTestBase

/** EXTERNAL conformance: every fixture here was produced by an
  * independent real-world encoder, never by this repo's code —
  * the CPython test-suite images (`python.{png,bmp,gif,jpg,tiff,
  * webp}`, the same 16×16 logo through five independent encoders)
  * and system libwebp 1.2.4 encodes of known pixels
  * (tools/gen_webp_fixtures.py). A decoder that merely round-trips
  * its own fixture encoder cannot pass these: the bytes on the wire
  * come from foreign implementations of the public specs. */
class ExternalFixturesSpec extends SparkTestBase {

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

  private lazy val pngPx: PngPixels.Decoded =
    PngPixels.decode(res("python.png")).get

  test("CPython png: palette+tRNS PNG from a real encoder decodes " +
    "(16x16 RGBA)") {
    assert(pngPx.width == 16 && pngPx.height == 16 && pngPx.channels == 4)
    // spot-pin a known pixel (independently derived with stdlib zlib)
    val i = (8 * 16 + 6) * 4
    assert((pngPx.pixels(i) & 0xff, pngPx.pixels(i + 1) & 0xff,
      pngPx.pixels(i + 2) & 0xff, pngPx.pixels(i + 3) & 0xff) ==
      ((253, 233, 106, 247)))
  }

  test("cross-encoder agreement: BMP (32-bit BI_BITFIELDS, bottom-up) " +
    "and TIFF (RGBA, ExtraSamples) decode to the PNG's exact bytes — " +
    "three foreign encoders, three in-repo decoders, one pixel answer") {
    val bmp = Bmp.decode(res("python.bmp")).get
    assert((bmp.width, bmp.height, bmp.channels) == ((16, 16, 4)))
    assert(bmp.pixels.toSeq == pngPx.pixels.toSeq, "bmp != png")
    val tiff = Tiff.decodePixels(res("python.tiff")).get
    assert((tiff.width, tiff.height, tiff.channels) == ((16, 16, 4)))
    assert(tiff.pixels.toSeq == pngPx.pixels.toSeq, "tiff != png")
  }

  test("CPython gif: the 64-color quantized variant's luma raster " +
    "tracks the PNG's BT.709 luma on the fully-opaque region within " +
    "the quantizer's measured bound (GIF colors differ by <= 3/channel)") {
    val gif = Gif.decode(res("python.gif")).get
    assert((gif.width, gif.height) == ((16, 16)))
    assert(gif.frames.size == 1)
    val luma = gif.frames.head.luma
    var maxDiff = 0
    (0 until 256).foreach { i =>
      if ((pngPx.pixels(i * 4 + 3) & 0xff) == 255) {
        val r = pngPx.pixels(i * 4) & 0xff
        val g = pngPx.pixels(i * 4 + 1) & 0xff
        val b = pngPx.pixels(i * 4 + 2) & 0xff
        val want = (2126 * r + 7152 * g + 722 * b) / 10000
        maxDiff = math.max(maxDiff, math.abs((luma(i) & 0xff) - want))
      }
    }
    assert(maxDiff <= 4, s"max luma diff $maxDiff")
  }

  test("CPython jpg: a real JFIF baseline 4:2:0 file decodes (raw " +
    "YCbCr contract) and after the standard JFIF color transform " +
    "tracks the PNG on the opaque region (mean abs diff < 16)") {
    val jpg = JpegDc.decode(res("python.jpg")).get
    assert((jpg.width, jpg.height, jpg.channels) == ((16, 16, 3)))
    var sum = 0L; var n = 0L
    (0 until 256).foreach { i =>
      if ((pngPx.pixels(i * 4 + 3) & 0xff) == 255) {
        val y = jpg.pixels(i * 3) & 0xff
        val cb = (jpg.pixels(i * 3 + 1) & 0xff) - 128
        val cr = (jpg.pixels(i * 3 + 2) & 0xff) - 128
        def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v))).toInt
        val rgb = Seq(clamp(y + 1.402 * cr),
          clamp(y - 0.344136 * cb - 0.714136 * cr),
          clamp(y + 1.772 * cb))
        (0 until 3).foreach { c =>
          sum += math.abs(rgb(c) - (pngPx.pixels(i * 4 + c) & 0xff)); n += 1
        }
      }
    }
    assert(n > 0 && sum.toDouble / n < 16.0, s"mean abs diff ${sum.toDouble / n}")
  }

  test("CPython webp: the ALPH chunk's VP8L-coded alpha plane decodes " +
    "to the PNG's tRNS alpha EXACTLY (cwebp encodes alpha losslessly " +
    "— a cross-encoder byte-equality pin on the headerless VP8L path)") {
    val full = Webp.decodeRgba(res("python.webp")).get
    assert((full.width, full.height, full.channels) == ((16, 16, 4)))
    (0 until 256).foreach { i =>
      assert(full.pixels(i * 4 + 3) == pngPx.pixels(i * 4 + 3),
        s"alpha differs at $i")
    }
    // and the color planes came through the byte-exact VP8 path: spot
    // the full RGBA against libwebp's own decode, allowing only the
    // YUV->RGB policy difference (libwebp: fancy upsampler; ours:
    // nearest + integer JFIF) on non-transparent pixels
    val ref = res("python_webp.rgba")
    var sum = 0L; var n = 0L
    (0 until 256).foreach { i =>
      if ((ref(i * 4 + 3) & 0xff) == 255) (0 until 3).foreach { c =>
        sum += math.abs((full.pixels(i * 4 + c) & 0xff) -
          (ref(i * 4 + c) & 0xff))
        n += 1
      }
    }
    assert(n > 0 && sum.toDouble / n < 12.0,
      s"mean abs diff vs libwebp RGBA ${sum.toDouble / n}")
  }

  test("animated WebP: ANIM/ANMF containers around real libwebp frame " +
    "payloads (lossless AND lossy+ALPH) composite byte-exactly — " +
    "blend, overwrite, dispose-to-background, odd canvas") {
    Seq("anim_lossless", "anim_lossy").foreach { name =>
      val Array(w, h, n) = new String(res(s"$name.meta"), "US-ASCII")
        .trim.split(" ").map(_.toInt)
      val want = res(s"$name.frames")
      val (gw, gh, frames) = Webp.decodeAnimation(res(s"$name.webp"))
        .getOrElse(fail(s"$name: decode returned None"))
      assert((gw, gh, frames.size) == ((w, h, n)), name)
      frames.zipWithIndex.foreach { case (f, i) =>
        val snap = want.slice(i * w * h * 4, (i + 1) * w * h * 4)
        assert(f.pixels.toSeq == snap.toSeq, s"$name frame $i differs")
        assert(f.durationMs == 40, name)
      }
    }
    // stills are not animations; dirty frame rects fail the file
    assert(Webp.decodeAnimation(res("python.webp")).isEmpty)
    val bad = res("anim_lossless.webp").clone()
    // grow the first frame's width past the canvas (ANMF hdr byte 6)
    val anmf = {
      var i = 12
      var at = -1
      while (at < 0) {
        val tag = new String(bad.slice(i, i + 4), "US-ASCII")
        if (tag == "ANMF") at = i
        else i += 8 + ((bad(i + 4) & 0xff) | ((bad(i + 5) & 0xff) << 8)) +
          (((bad(i + 4) & 0xff)) & 1)
      }
      at
    }
    bad(anmf + 8 + 6) = 0x7f
    assert(Webp.decodeAnimation(bad).isEmpty)
  }

  test("LAME-encoded MPEG-2 Layer III (gsutil test.mp3, a real " +
    "foreign MP3 encoder): 45 frames walk with the full LSF side-info " +
    "+ reservoir chain bit-exact, and the payload decodes to exactly " +
    "45x576 samples of digital silence") {
    val b = res("lame_silence.mp3")
    assert(b.length == 9436)
    // LAME writes its tag inside the first frame's stuffing
    assert(new String(b, 45, 4, "US-ASCII") == "LAME")
    val (dec, st) = Mp3Pcm.decodeWithStats(b).get
    assert(st == Mp3Pcm.Stats(45, 45, 45, 0, 22050, 1, 25920))
    assert(dec.pcm.forall(_ == 0),
      "a LAME silence encode must decode to true digital silence")
    // the triage layer agrees with the payload decoder on structure
    val m = Mp3.meta(b).get
    assert(m.version == "MPEG2" && m.layer == 3 && m.nFrames == 45 &&
      m.sampleRate == 22050 && m.channels == 1 && m.hasId3)
  }

  test("libtiff-encoded CCITT G4 files (real fax encoder, five " +
    "patterns incl. multi-strip) decode bit-exactly: MMR modes, T.4 " +
    "run codes, and per-strip reference-line resets all pinned by " +
    "foreign bytes") {
    Seq("g4_text", "g4_diag", "g4_multistrip", "g4_allwhite", "g4_checker")
      .foreach { name =>
        val want = res(s"$name.bits")
        val d = Tiff.decodePixels(res(s"$name.tif"))
          .getOrElse(fail(s"$name: decode returned None"))
        assert(d.channels == 1, name)
        assert(d.pixels.length == want.length, name)
        // fixture photometric is 0 (WhiteIsZero): bit 1 -> intensity 0
        var diffs = 0
        want.indices.foreach { i =>
          val wantPx = if (want(i) == 1) 0 else 255
          if ((d.pixels(i) & 0xff) != wantPx) diffs += 1
        }
        assert(diffs == 0, s"$name: $diffs/${want.length} pixels differ")
      }
  }

  test("G4 validator stance: truncated strips and corrupt code bits " +
    "fail the file (None, never a throw), and a corruption sweep " +
    "never crashes") {
    val good = res("g4_text.tif")
    assert(Tiff.decodePixels(good.take(good.length / 2)).isEmpty)
    // flip bits through the strip area: either None or a successful
    // decode of different bits — never an exception
    (good.length - 200 until good.length by 7).foreach { i =>
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x44).toByte
      Tiff.decodePixels(bad) // must not throw
    }
  }

  test("libwebp-encoded VP8L files (real cwebp-family encoder, four " +
    "content shapes) decode byte-exactly to the encoded pixels — the " +
    "external conformance pin the self-round-trip could not give") {
    Seq("vp8l_gradient", "vp8l_palette", "vp8l_noise", "vp8l_alpha_noise")
      .foreach { name =>
        val Array(w, h) = new String(res(s"$name.meta"), "US-ASCII")
          .trim.split(" ").map(_.toInt)
        val want = res(s"$name.rgba")
        val got = Webp.decode(res(s"$name.webp"))
          .getOrElse(fail(s"$name: decode returned None"))
        assert((got.width, got.height) == ((w, h)), name)
        val gotRgba =
          if (got.channels == 4) got.pixels
          else { // opaque-encoded: compare against RGBA by inserting 255
            val out = new Array[Byte](w * h * 4)
            (0 until w * h).foreach { i =>
              out(i * 4) = got.pixels(i * 3)
              out(i * 4 + 1) = got.pixels(i * 3 + 1)
              out(i * 4 + 2) = got.pixels(i * 3 + 2)
              out(i * 4 + 3) = 0xff.toByte
            }
            out
          }
        assert(gotRgba.toSeq == want.toSeq, s"$name: pixels differ")
      }
  }
}
