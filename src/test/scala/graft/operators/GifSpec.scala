package graft.operators

import graft.SparkTestBase

/** Real animated-GIF codec: decoded frames must equal the pixel
  * contract after a genuine LZW round-trip (including 12-bit
  * dictionary growth and mid-stream resets), extensions skip, dirty
  * and out-of-subset bytes are rejected, never thrown on — and
  * [[Multimodal.sampleFrames]] serves REAL decoded frames for GIF. */
class GifSpec extends SparkTestBase {

  private def checkFrames(id: Long, d: Gif.Decoded): Unit =
    d.frames.zipWithIndex.foreach { case (fr, f) =>
      var y = 0
      while (y < fr.height) {
        var x = 0
        while (x < fr.width) {
          assert((fr.luma(y * fr.width + x) & 0xff) == Gif.pix(id, f, x, y),
            s"id=$id f=$f x=$x y=$y")
          x += 1
        }
        y += 1
      }
    }

  test("decode(encode) recovers the exact pixel contract for every " +
    "frame — varied dims and frame counts") {
    (0L until 10L).foreach { id =>
      val d = Gif.decode(MediaFixtures.gifMediaFor(id)).getOrElse(
        fail(s"id=$id did not decode"))
      assert(d.frames.length == 2 + id % 3)
      assert(d.frames.head.width == 8 + (id * 5 % 25))
      assert(d.frames.head.height == 6 + (id * 7 % 20))
      checkFrames(id, d)
    }
  }

  test("seeded fuzz: 50 random (id, w, h, frames) combos round-trip " +
    "bit-exact through real LZW — half in the interlaced row layout") {
    val rnd = new scala.util.Random(4242)
    (0 until 50).foreach { _ =>
      val id = rnd.nextInt(100000).toLong
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(40)
      val nf = 1 + rnd.nextInt(5)
      val il = rnd.nextBoolean()
      val d = Gif.decode(Gif.gifWithFrames(id, w, h, nf, il)).getOrElse(
        fail(s"id=$id w=$w h=$h nf=$nf interlaced=$il did not decode"))
      assert(d.frames.length == nf && d.frames.head.width == w &&
        d.frames.head.height == h)
      checkFrames(id, d)
    }
  }

  test("interlaced and sequential forms of the same frames store " +
    "DIFFERENT bytes but decode to IDENTICAL rasters — the four-pass " +
    "permutation round-trips exactly at every height including h < 8") {
    (1 to 11).foreach { h =>
      val seq = Gif.gifWithFrames(7L, 13, h, 2, interlaced = false)
      val il = Gif.gifWithFrames(7L, 13, h, 2, interlaced = true)
      if (h > 1) assert(!seq.sameElements(il), s"h=$h layouts must differ")
      val a = Gif.decode(seq).get
      val b = Gif.decode(il).get
      a.frames.zip(b.frames).foreach { case (fa, fb) =>
        assert(fa.luma.sameElements(fb.luma), s"h=$h")
      }
      checkFrames(7L, b)
    }
  }

  test("a large frame drives the LZW dictionary through 12-bit growth " +
    "and a clear/reset, still bit-exact") {
    // 300x200 = 60k pixels: the greedy dictionary exceeds 4096 entries,
    // so the stream contains width-10/11/12 codes AND a mid-stream
    // clear — the decoder paths a small fixture never touches
    val d = Gif.decode(Gif.gifWithFrames(99L, 300, 200, 1)).getOrElse(
      fail("large frame did not decode"))
    assert(d.frames.head.width == 300 && d.frames.head.height == 200)
    checkFrames(99L, d)
  }

  test("raw LZW round-trips pathological inputs: constant runs (KwKwK " +
    "chains) and a 0-260 ramp (width growth at the boundary)") {
    // constant run: immediately exercises the code==next (KwKwK) case
    val run = Array.fill[Byte](5000)(7)
    assert(Gif.lzwDecode(Gif.lzwEncode(run, 8), 8, run.length).toSeq
      == run.toSeq)
    // sawtooth over the full byte alphabet
    val saw = Array.tabulate[Byte](9000)(i => (i % 256).toByte)
    assert(Gif.lzwDecode(Gif.lzwEncode(saw, 8), 8, saw.length).toSeq
      == saw.toSeq)
    // tiny alphabet with minimum code size 2 (the spec's own example size)
    val quad = Array.tabulate[Byte](400)(i => (i % 4).toByte)
    assert(Gif.lzwDecode(Gif.lzwEncode(quad, 2), 2, quad.length).toSeq
      == quad.toSeq)
    // seeded random bytes: incompressible, so emissions far exceed the
    // 4096-entry dictionary — GUARANTEES the mid-stream clear/reset path
    val rnd = new scala.util.Random(31337)
    val noise = Array.fill[Byte](60000)(rnd.nextInt(256).toByte)
    assert(Gif.lzwDecode(Gif.lzwEncode(noise, 8), 8, noise.length).toSeq
      == noise.toSeq)
  }

  test("extensions (comment + graphic control) and GIF87a headers are " +
    "handled; local color tables override the global one") {
    // fixture already carries comment + per-frame GCE blocks — decoded
    // above; here: GIF87a, no GCT, local grayscale table on the frame
    val base = Gif.gifWithFrames(5L, 10, 8, 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    out.write(Array[Byte](10, 0, 8, 0)) // screen 10x8
    out.write(0x00); out.write(0); out.write(0) // NO global color table
    // image descriptor with local table flag, 256 entries
    out.write(0x2c)
    out.write(Array[Byte](0, 0, 0, 0, 10, 0, 8, 0))
    out.write(0x87) // LCT present, 256 entries
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // reuse the fixture's LZW payload for frame 0: find it in `base`
    // (fixture layout: 6+7+768 header/GCT, comment ext, GCE, descriptor)
    val descriptorAt = base.indexOfSlice(Array[Byte](0x2c, 0, 0, 0, 0, 10, 0, 8, 0))
    assert(descriptorAt > 0, "fixture descriptor not found")
    out.write(base, descriptorAt + 10, base.length - (descriptorAt + 10) - 1)
    out.write(0x3b)
    val d = Gif.decode(out.toByteArray).getOrElse(fail("87a did not decode"))
    assert(d.frames.length == 1)
    checkFrames(5L, d)
  }

  test("out-of-subset and corrupt bytes are rejected, never thrown on") {
    val good = Gif.gifWithFrames(1L, 12, 9, 2)
    assert(Gif.decode(Array[Byte]()).isEmpty)
    assert(Gif.decode("GIF90a".getBytes("US-ASCII")).isEmpty)
    assert(Gif.decode(good.take(good.length / 2)).isEmpty) // truncated
    assert(Gif.decode(good.dropRight(1)).isEmpty) // missing trailer
    // the interlace flag is HONORED, not rejected: flipping it on a
    // sequentially-stored stream decodes fine but lands the stored
    // rows on their four-pass positions — stored row 1 of an h=9
    // frame becomes raster row 8 (order 0,8,4,2,6,1,3,5,7)
    val descriptorAt = good.indexOfSlice(Array[Byte](0x2c, 0, 0, 0, 0, 12, 0, 9, 0))
    val inter = good.clone(); inter(descriptorAt + 9) = 0x40.toByte
    val permuted = Gif.decode(inter).getOrElse(fail("flag flip must decode"))
    val seqRow1 = (0 until 12).map(x => Gif.pix(1L, 0, x, 1).toByte)
    assert(permuted.frames.head.luma.slice(8 * 12, 9 * 12).sameElements(seqRow1))
    // a WAV is not a GIF
    assert(Gif.decode(MediaFixtures.wavMediaFor(2L)).isEmpty)
    // huge declared dims must refuse before allocating
    val wide = good.clone()
    wide(descriptorAt + 5) = 0xff.toByte; wide(descriptorAt + 6) = 0xff.toByte
    wide(descriptorAt + 7) = 0xff.toByte; wide(descriptorAt + 8) = 0xff.toByte
    assert(Gif.decode(wide).isEmpty)
  }

  test("sampleFrames serves REAL decoded GIF frames (n-spaced, all " +
    "when n >= count) and falls back to byte windows elsewhere") {
    import org.apache.spark.sql.functions._
    val gif = MediaFixtures.gifMediaFor(7L) // 3 frames
    val decoded = Gif.decode(gif).get
    // n >= frames: every decoded frame, in order
    val all = Multimodal.sampleFramesKernel(gif, 5, 64)
    assert(all.length == decoded.frames.length)
    all.zip(decoded.frames).foreach { case (a, fr) =>
      assert(a.toSeq == fr.luma.toSeq)
    }
    // n < frames: evenly spaced subset — first frame always included
    val two = Multimodal.sampleFramesKernel(gif, 2, 64)
    assert(two.length == 2 && two.head.toSeq == decoded.frames.head.luma.toSeq)
    // non-GIF bytes keep the documented byte-window fallback
    val fake = Multimodal.sampleFramesKernel(Array[Byte](1, 2, 3, 4), 2, 2)
    assert(fake.length == 2 && fake.head.toSeq == Seq[Byte](1, 2))
    // and the DataFrame surface wires the kernel in
    val df = spark.range(3, 4).selectExpr("id AS doc_id",
      "gif_media_for_id(id) AS media")
    val rows = Multimodal.sampleFrames(df, "media", 8)
      .select(size(col("frames")).as("n")).head()
    assert(rows.getInt(0) == (2 + 3 % 3))
  }

  test("gif_frame_diffs (scene-cut SAD) matches a direct fold over " +
    "adjacent decoded frames and skips unequal-dim pairs") {
    graft.Graft.init(spark)
    (0L until 6L).foreach { id =>
      val d = Gif.decode(MediaFixtures.gifMediaFor(id)).get
      val rows = spark.sql(
        s"""SELECT d.frame, d.sad
           |FROM (SELECT explode(gif_frame_diffs(
           |        gif_media_for_id(CAST($id AS BIGINT)))) AS d)"""
          .stripMargin).collect()
      assert(rows.length == d.frames.length - 1, s"id=$id")
      rows.zipWithIndex.foreach { case (r, i) =>
        val f = i + 1
        val sad = d.frames(f).luma.zip(d.frames(f - 1).luma)
          .map { case (b, a) => math.abs((b & 0xff) - (a & 0xff)).toLong }.sum
        assert(r.getInt(0) == f && r.getLong(1) == sad, s"id=$id f=$f")
      }
    }
    // dirty bytes null out; a single-frame GIF has zero pairs
    assert(spark.sql("SELECT gif_frame_diffs(CAST('x' AS BINARY)) AS d")
      .head().isNullAt(0))
    val one = Gif.gifWithFrames(11L, 9, 7, 1)
    assert(graft.functions.GifFrameDiffs.compute(one).numElements() == 0)
  }

  test("gif_frame_stats kernel matches a direct fold over decoded " +
    "frames and is callable from verbatim SQL") {
    graft.Graft.init(spark)
    val rows = spark.sql(
      """SELECT f.frame, f.width, f.height, f.pix_sum
        |FROM (SELECT explode(gif_frame_stats(
        |        gif_media_for_id(CAST(4 AS BIGINT)))) AS f)""".stripMargin)
      .collect()
    val d = Gif.decode(MediaFixtures.gifMediaFor(4L)).get
    assert(rows.length == d.frames.length)
    rows.zipWithIndex.foreach { case (r, f) =>
      val fr = d.frames(f)
      assert(r.getInt(0) == f && r.getInt(1) == fr.width &&
        r.getInt(2) == fr.height)
      assert(r.getLong(3) == fr.luma.map(_ & 0xff).map(_.toLong).sum)
    }
  }

  // ---- composited animation model (r8) ----

  /** Minimal hand-rolled GIF: 4x2 canvas, 4-entry GCT (luma 0,1,2,3),
    * frames described as (left, top, w, h, disposal, transparentIdx,
    * indices). minCodeSize 2. */
  private def miniGif(frames: Seq[(Int, Int, Int, Int, Int, Int,
      Array[Byte])], sw: Int = 4, sh: Int = 2, bg: Int = 0)
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    le16(sw); le16(sh)
    bos.write(0x80 | 1) // GCT, 4 entries
    bos.write(bg); bos.write(0)
    (0 until 4).foreach { i => bos.write(i); bos.write(i); bos.write(i) }
    frames.foreach { case (l, t, w, h, disp, tr, idx) =>
      bos.write(0x21); bos.write(0xf9); bos.write(4)
      bos.write((disp << 2) | (if (tr >= 0) 1 else 0))
      le16(0); bos.write(math.max(tr, 0)); bos.write(0)
      bos.write(0x2c); le16(l); le16(t); le16(w); le16(h); bos.write(0)
      bos.write(2)
      val lzw = Gif.lzwEncode(idx, 2)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        bos.write(n); bos.write(lzw, off, n); off += n
      }
      bos.write(0)
    }
    bos.write(0x3b)
    bos.toByteArray
  }

  private def canvases(b: Array[Byte]): Seq[Seq[Int]] =
    Gif.decodeComposited(b).get.frames.map(_.luma.map(_ & 0xff).toSeq)

  test("composited decode: sub-rect placement, transparency " +
    "show-through, and all three disposal methods") {
    // frame 0: full canvas of 1s; frame 1: 2x1 rect of 3s at (1,1)
    val full = Array.fill[Byte](8)(1)
    val patch = Array.fill[Byte](2)(3)
    // disposal 1 (leave): frame 2 transparent patch shows frame 1 state
    val transparent = Array.fill[Byte](2)(2) // idx 2 declared transparent
    val leave = canvases(miniGif(Seq(
      (0, 0, 4, 2, 1, -1, full),
      (1, 1, 2, 1, 1, -1, patch),
      (1, 1, 2, 1, 0, 2, transparent))))
    assert(leave(0) == Seq(1, 1, 1, 1, 1, 1, 1, 1))
    assert(leave(1) == Seq(1, 1, 1, 1, 1, 3, 3, 1))
    assert(leave(2) == Seq(1, 1, 1, 1, 1, 3, 3, 1),
      "transparent pixels over disposal-1 show the prior canvas")
    // disposal 2 (restore to background, bg index 0 -> luma 0)
    val toBg = canvases(miniGif(Seq(
      (0, 0, 4, 2, 1, -1, full),
      (1, 1, 2, 1, 2, -1, patch),
      (0, 0, 1, 1, 0, 2, Array[Byte](2))))) // all-transparent probe
    assert(toBg(1) == Seq(1, 1, 1, 1, 1, 3, 3, 1))
    assert(toBg(2) == Seq(1, 1, 1, 1, 1, 0, 0, 1),
      "disposal 2 restores the frame rect to background")
    // disposal 3 (restore to previous)
    val toPrev = canvases(miniGif(Seq(
      (0, 0, 4, 2, 1, -1, full),
      (1, 1, 2, 1, 3, -1, patch),
      (0, 0, 1, 1, 0, 2, Array[Byte](2)))))
    assert(toPrev(1) == Seq(1, 1, 1, 1, 1, 3, 3, 1))
    assert(toPrev(2) == Seq(1, 1, 1, 1, 1, 1, 1, 1),
      "disposal 3 restores the pre-frame canvas")
    // a frame rect outside the canvas is dirty, not a paint-over
    assert(Gif.decodeComposited(miniGif(Seq(
      (3, 1, 2, 1, 0, -1, patch)))).isEmpty)
  }

  test("composited delta-frame fixtures match the closed-form contract " +
    "(latest opaque covering frame per pixel)") {
    (0L until 12L).foreach { id =>
      val w = (8 + (id * 5) % 17).toInt
      val h = (6 + (id * 7) % 13).toInt
      val nf = (2 + id % 3).toInt
      val d = Gif.decodeComposited(MediaFixtures.gifDeltaMediaFor(id))
        .getOrElse(fail(s"id=$id did not decode"))
      assert(d.frames.length == nf)
      def rect(f: Int): (Int, Int, Int, Int) =
        if (f == 0) (0, 0, w, h)
        else {
          val fw = w - math.floorMod(3L * f + id, (w / 2).toLong).toInt
          val fh = h - math.floorMod(5L * f + id, (h / 2).toLong).toInt
          val lf = math.floorMod(7L * f + id, (w - fw + 1).toLong).toInt
          val tp = math.floorMod(11L * f + id, (h - fh + 1).toLong).toInt
          (lf, tp, fw, fh)
        }
      (0 until nf).foreach { f =>
        val fr = d.frames(f)
        assert(fr.width == w && fr.height == h)
        (0 until h).foreach { y =>
          (0 until w).foreach { x =>
            val g = (0 to f).reverse.find { gg =>
              val (lf, tp, fw, fh) = rect(gg)
              x >= lf && x < lf + fw && y >= tp && y < tp + fh &&
                Gif.pix(id, gg, x, y) % 7 != 0
            }
            val want = g.map(Gif.pix(id, _, x, y)).getOrElse(0)
            assert((fr.luma(y * w + x) & 0xff) == want,
              s"id=$id f=$f x=$x y=$y")
          }
        }
      }
    }
  }
}
