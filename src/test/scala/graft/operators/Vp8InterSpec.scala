package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8 inter-frame conformance for a container with NO VP8 video
  * encoder (libwebp emits only keyframes; libvpx is absent):
  *
  *  1. the sub-pixel filter tables re-verify STRUCTURALLY (each
  *     kernel sums to 128, kernel k mirrors kernel 8-k, position 0
  *     is the identity) — the printed-anchor pattern that pinned the
  *     MP3 synthesis window;
  *  2. the boolean encoder is pinned against the DECODER by
  *     round-trip over adversarial prob/bit sequences (they share no
  *     code — the encoder lives in Vp8Inter, the decoder in Vp8);
  *  3. MV component coding round-trips over the full value range
  *     including the implicit-bit-3 family;
  *  4. whole-pipeline: writer-assembled interframes over a REAL
  *     libwebp keyframe (whose decode is byte-exact against system
  *     libwebp in Vp8Spec/ExternalFixturesSpec) must reproduce an
  *     INDEPENDENT spec-math motion compensation written in this
  *     spec from RFC 6386 §18 — shared tables only, no decoder code —
  *     across ZERO/NEAREST/NEW/SPLIT modes, sub-pel positions,
  *     out-of-frame clamped reads, the golden-reference routing and
  *     the bilinear (version 3... versions 1-3) filter;
  *  5. the validator stance: a standalone interframe and an IVF whose
  *     first frame is not a keyframe both return None.
  */
class Vp8InterSpec extends AnyFunSuite {

  // ---- 1. filter table structure ------------------------------------

  test("six-tap and bilinear kernels: unit DC gain (sum 128), mirror " +
    "symmetry across the half-pel, identity at position 0") {
    val f = Vp8Inter.SubpelFilters
    assert(f.length == 8)
    f.foreach(k => assert(k.sum == 128, k.mkString(",")))
    assert(f(0).toSeq == Seq(0, 0, 128, 0, 0, 0))
    var i = 1
    while (i < 8) {
      assert(f(i).reverse.toSeq == f(8 - i).toSeq, s"mirror $i")
      i += 1
    }
    val b = Vp8Inter.BilinearFilters
    b.foreach(k => assert(k.sum == 128))
    assert(b(0).toSeq == Seq(128, 0))
    i = 1
    while (i < 8) {
      assert(b(i).reverse.toSeq == b(8 - i).toSeq, s"bilinear mirror $i")
      i += 1
    }
  }

  // ---- 2. bool encoder vs the decoder --------------------------------

  test("bool encoder round-trips against the decoder over adversarial " +
    "prob/bit sequences (carry chains, extreme probs)") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { trial =>
      val n = 1 + rnd.nextInt(4000)
      val probs = Array.fill(n)(rnd.nextInt(254) + 1)
      val bits = Array.fill(n)(rnd.nextInt(2))
      // bias some trials toward carry-heavy streams
      if (trial % 3 == 0) {
        var i = 0
        while (i < n) { probs(i) = 1 + (i % 2) * 253; bits(i) = 1; i += 1 }
      }
      val e = new Vp8Inter.BoolEnc
      var i = 0
      while (i < n) { e.put(bits(i), probs(i)); i += 1 }
      val bytes = e.finish()
      val d = new Vp8.Bool(bytes, 0, bytes.length)
      i = 0
      while (i < n) {
        assert(d.bool(probs(i)) == bits(i), s"trial $trial bit $i")
        i += 1
      }
    }
  }

  // ---- 3. MV component round-trip ------------------------------------

  test("MV component coding round-trips over 0..1023 both signs " +
    "(short tree, long bits, the implicit bit 3)") {
    val vals = ((0 to 20) ++ Seq(31, 32, 63, 64, 127, 255, 256, 511,
      512, 1000, 1023)).flatMap(v => Seq(v, -v)).distinct
    val e = new Vp8Inter.BoolEnc
    vals.foreach { v =>
      Vp8Inter.writeMvComponent(e, v, Vp8Inter.MvDefaultProbs(0), 0)
      Vp8Inter.writeMvComponent(e, v, Vp8Inter.MvDefaultProbs(1), 0)
    }
    val bytes = e.finish()
    val d = new Vp8.Bool(bytes, 0, bytes.length)
    vals.foreach { v =>
      assert(Vp8.readMvComponent(d, Vp8Inter.MvDefaultProbs(0)) == v, s"$v row")
      assert(Vp8.readMvComponent(d, Vp8Inter.MvDefaultProbs(1)) == v, s"$v col")
    }
  }

  // ---- shared E2E harness --------------------------------------------

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

  private def vp8Chunk(b: Array[Byte]): Array[Byte] = {
    def le32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    var off = 12
    while (off + 8 <= b.length) {
      val tag = new String(b.slice(off, off + 4), "US-ASCII")
      val size = le32(off + 4)
      if (tag == "VP8 ") return b.slice(off + 8, off + 8 + size)
      off += 8 + size + (size & 1)
    }
    fail("no VP8 chunk")
  }

  /** The 48x32 libwebp keyframe: dimensions are multiples of 16, so
    * the cropped output planes ARE the reference buffers. */
  private lazy val keyPayload: Array[Byte] = vp8Chunk(res("vp8_smooth.webp"))
  private lazy val key: Vp8.Yuv =
    Vp8.decodeFrame(keyPayload, 0, keyPayload.length).get

  /** INDEPENDENT spec-math MC (RFC 6386 §18), written against the
    * cropped keyframe planes with replicated-edge reads: two-pass
    * filtering with 8-bit clamped intermediates — shares only the
    * kernel tables with the decoder. */
  private def refMc(src: Array[Byte], w: Int, h: Int,
      dx0: Int, dy0: Int, bw: Int, bh: Int, mvr: Int, mvc: Int,
      sixtap: Boolean): Array[Int] = {
    def at(x: Int, y: Int): Int = {
      val cx = math.max(0, math.min(w - 1, x))
      val cy = math.max(0, math.min(h - 1, y))
      src(cy * w + cx) & 0xff
    }
    val ix = dx0 + (mvc >> 3); val iy = dy0 + (mvr >> 3)
    val xf = mvc & 7; val yf = mvr & 7
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    val out = new Array[Int](bw * bh)
    if (sixtap) {
      val fx = Vp8Inter.SubpelFilters(xf)
      val fy = Vp8Inter.SubpelFilters(yf)
      // horizontal into an (bh+5)-row intermediate, then vertical;
      // single-pass shortcuts when a fraction is zero
      if (xf == 0 && yf == 0) {
        for (y <- 0 until bh; x <- 0 until bw)
          out(y * bw + x) = at(ix + x, iy + y)
      } else if (yf == 0) {
        for (y <- 0 until bh; x <- 0 until bw)
          out(y * bw + x) = clamp(
            ((0 until 6).map(k => fx(k) * at(ix + x - 2 + k, iy + y)).sum
              + 64) >> 7)
      } else if (xf == 0) {
        for (y <- 0 until bh; x <- 0 until bw)
          out(y * bw + x) = clamp(
            ((0 until 6).map(k => fy(k) * at(ix + x, iy + y - 2 + k)).sum
              + 64) >> 7)
      } else {
        val tmp = Array.ofDim[Int](bh + 5, bw)
        for (y <- 0 until bh + 5; x <- 0 until bw)
          tmp(y)(x) = clamp(
            ((0 until 6).map(k => fx(k) * at(ix + x - 2 + k, iy + y - 2)).sum
              + 64) >> 7)
        for (y <- 0 until bh; x <- 0 until bw)
          out(y * bw + x) = clamp(
            ((0 until 6).map(k => fy(k) * tmp(y + k)(x)).sum + 64) >> 7)
      }
    } else {
      val fx = Vp8Inter.BilinearFilters(xf)
      val fy = Vp8Inter.BilinearFilters(yf)
      if (xf == 0 && yf == 0) {
        for (y <- 0 until bh; x <- 0 until bw)
          out(y * bw + x) = at(ix + x, iy + y)
      } else if (yf == 0) {
        for (y <- 0 until bh; x <- 0 until bw)
          out(y * bw + x) = clamp((fx(0) * at(ix + x, iy + y) +
            fx(1) * at(ix + x + 1, iy + y) + 64) >> 7)
      } else if (xf == 0) {
        for (y <- 0 until bh; x <- 0 until bw)
          out(y * bw + x) = clamp((fy(0) * at(ix + x, iy + y) +
            fy(1) * at(ix + x, iy + y + 1) + 64) >> 7)
      } else {
        val tmp = Array.ofDim[Int](bh + 1, bw)
        for (y <- 0 until bh + 1; x <- 0 until bw)
          tmp(y)(x) = clamp((fx(0) * at(ix + x, iy + y) +
            fx(1) * at(ix + x + 1, iy + y) + 64) >> 7)
        for (y <- 0 until bh; x <- 0 until bw)
          out(y * bw + x) = clamp(
            (fy(0) * tmp(y)(x) + fy(1) * tmp(y + 1)(x) + 64) >> 7)
      }
    }
    out
  }

  private def assertPlane(got: Array[Byte], want: Array[Int], w: Int,
      tag: String): Unit = {
    val diffs = got.indices.count(i => (got(i) & 0xff) != want(i))
    val first = got.indices.find(i => (got(i) & 0xff) != want(i))
    assert(diffs == 0, s"$tag: $diffs/${got.length} differ, first " +
      s"$first (${first.map(i => (i % w, i / w))})")
  }

  // mb grid of vp8_smooth: 48x32 -> 3x2 MBs
  private val MbW = 3; private val MbH = 2
  import Vp8Inter.{WMb, packMv, ModeZero, ModeNearest, ModeNew, ModeSplit}

  private def expectedFullMc(
      mvOfMb: Int => Int, sixtap: Boolean): (Array[Int], Array[Int], Array[Int]) = {
    val w = key.width; val h = key.height
    val cw = w / 2; val ch = h / 2
    val ey = new Array[Int](w * h)
    val eu = new Array[Int](cw * ch)
    val ev = new Array[Int](cw * ch)
    for (m <- 0 until MbW * MbH) {
      val mbx = m % MbW; val mby = m / MbW
      val mv = mvOfMb(m)
      val mr = Vp8Inter.mvRow(mv); val mc = Vp8Inter.mvCol(mv)
      val by = refMc(key.y, w, h, mbx * 16, mby * 16, 16, 16, mr, mc, sixtap)
      for (y <- 0 until 16; x <- 0 until 16)
        ey((mby * 16 + y) * w + mbx * 16 + x) = by(y * 16 + x)
      val cmr = Vp8Inter.chromaMv(mr); val cmc = Vp8Inter.chromaMv(mc)
      val bu = refMc(key.u, cw, ch, mbx * 8, mby * 8, 8, 8, cmr, cmc, sixtap)
      val bv = refMc(key.v, cw, ch, mbx * 8, mby * 8, 8, 8, cmr, cmc, sixtap)
      for (y <- 0 until 8; x <- 0 until 8) {
        eu((mby * 8 + y) * cw + mbx * 8 + x) = bu(y * 8 + x)
        ev((mby * 8 + y) * cw + mbx * 8 + x) = bv(y * 8 + x)
      }
    }
    (ey, eu, ev)
  }

  /** Spec-math §14.4 inverse DCT (restated independently of the
    * decoder; shared by the residual and the r13 persistence
    * pins). */
  private def idct4(in: Array[Int]): Array[Int] = {
    val S = 35468; val C = 20091
    val tmp = new Array[Int](16)
    for (i <- 0 until 4) {
      val a1 = in(i) + in(8 + i)
      val b1 = in(i) - in(8 + i)
      val c1 = ((in(4 + i) * S) >> 16) -
        (in(12 + i) + ((in(12 + i) * C) >> 16))
      val d1 = (in(4 + i) + ((in(4 + i) * C) >> 16)) +
        ((in(12 + i) * S) >> 16)
      tmp(i) = a1 + d1; tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1; tmp(8 + i) = b1 - c1
    }
    val out = new Array[Int](16)
    for (i <- 0 until 4) {
      val a1 = tmp(4 * i) + tmp(4 * i + 2)
      val b1 = tmp(4 * i) - tmp(4 * i + 2)
      val c1 = ((tmp(4 * i + 1) * S) >> 16) -
        (tmp(4 * i + 3) + ((tmp(4 * i + 3) * C) >> 16))
      val d1 = (tmp(4 * i + 1) + ((tmp(4 * i + 1) * C) >> 16)) +
        ((tmp(4 * i + 3) * S) >> 16)
      out(4 * i) = (a1 + d1 + 4) >> 3
      out(4 * i + 3) = (a1 - d1 + 4) >> 3
      out(4 * i + 1) = (b1 + c1 + 4) >> 3
      out(4 * i + 2) = (b1 - c1 + 4) >> 3
    }
    out
  }

  // ---- 4. whole-pipeline pins ----------------------------------------

  test("NEW/ZERO/NEAREST motion over a real keyframe: the decoded " +
    "interframe equals the independent spec-math MC byte-for-byte " +
    "(integer, quarter-pel, mixed-fraction and clamped out-of-frame " +
    "MVs)") {
    // per-MB MVs (eighth-pel, even = quarter-pel luma):
    //  mb0 ZERO, mb1 integer (+3px, +1px), mb2 pure sub-pel x,
    //  mb3 mixed fractions, mb4 NEAREST (the survey's first distinct
    //  candidate is the ABOVE neighbor mb1 — left mb3 ties at weight
    //  2 and a tie does not swap), mb5 out-of-frame (clamped
    //  replicated reads)
    val mvs = Array(
      packMv(0, 0), packMv(8, 24), packMv(0, 2), packMv(4, 6),
      packMv(8, 24), packMv(40, 40))
    val wmbs = Array(
      WMb(ModeZero),
      WMb(ModeNew, mv = mvs(1)),
      WMb(ModeNew, mv = mvs(2)),
      WMb(ModeNew, mv = mvs(3)),
      WMb(ModeNearest),
      WMb(ModeNew, mv = mvs(5)))
    val inter = Vp8Inter.buildInterFrame(MbW, MbH, wmbs)
    val ivf = Vp8Inter.buildIvf(key.width, key.height,
      Seq(keyPayload, inter))
    val frames = Vp8Inter.decodeIvf(ivf).getOrElse(fail("decode None"))
    assert(frames.length == 2)
    assert(java.util.Arrays.equals(frames(0).y, key.y), "keyframe Y")
    val (ey, eu, ev) = expectedFullMc(mvs, sixtap = true)
    assertPlane(frames(1).y, ey, key.width, "Y")
    assertPlane(frames(1).u, eu, key.width / 2, "U")
    assertPlane(frames(1).v, ev, key.width / 2, "V")
  }

  test("SPLITMV quarters: per-4x4 luma MVs and the averaged chroma " +
    "MVs match the spec-math MC") {
    // mb0 splits into quarters with four distinct MVs; the rest ZERO
    val q = Array(packMv(0, 0), packMv(8, 16), packMv(-8, 8),
      packMv(4, 2))
    val map = Vp8Inter.MbSplits(2)
    val sub = Array.tabulate(16)(k => q(map(k)))
    val wmbs = Array(
      WMb(ModeSplit, splitKind = 2, subMvs = sub),
      WMb(ModeZero), WMb(ModeZero), WMb(ModeZero), WMb(ModeZero),
      WMb(ModeZero))
    val inter = Vp8Inter.buildInterFrame(MbW, MbH, wmbs)
    val ivf = Vp8Inter.buildIvf(key.width, key.height,
      Seq(keyPayload, inter))
    val frames = Vp8Inter.decodeIvf(ivf).getOrElse(fail("decode None"))
    val w = key.width; val h = key.height; val cw = w / 2; val ch = h / 2
    // expected: mb0 per-4x4; other MBs are identity copies
    val ey = new Array[Int](w * h)
    val eu = new Array[Int](cw * ch)
    val ev = new Array[Int](cw * ch)
    for (y <- 0 until h; x <- 0 until w) ey(y * w + x) = key.y(y * w + x) & 0xff
    for (y <- 0 until ch; x <- 0 until cw) {
      eu(y * cw + x) = key.u(y * cw + x) & 0xff
      ev(y * cw + x) = key.v(y * cw + x) & 0xff
    }
    for (k <- 0 until 16) {
      val bx = (k & 3) * 4; val by = (k >> 2) * 4
      val mv = sub(k)
      val blk = refMc(key.y, w, h, bx, by, 4, 4,
        Vp8Inter.mvRow(mv), Vp8Inter.mvCol(mv), sixtap = true)
      for (y <- 0 until 4; x <- 0 until 4)
        ey((by + y) * w + bx + x) = blk(y * 4 + x)
    }
    for (cb <- 0 until 4) {
      val r = cb >> 1; val c = cb & 1
      val yo = r * 8 + c * 2
      val sr = Seq(yo, yo + 1, yo + 4, yo + 5).map(j => Vp8Inter.mvRow(sub(j))).sum
      val sc = Seq(yo, yo + 1, yo + 4, yo + 5).map(j => Vp8Inter.mvCol(sub(j))).sum
      val cmr = Vp8Inter.chromaMvSplit(sr); val cmc = Vp8Inter.chromaMvSplit(sc)
      val bu = refMc(key.u, cw, ch, c * 4, r * 4, 4, 4, cmr, cmc, sixtap = true)
      val bv = refMc(key.v, cw, ch, c * 4, r * 4, 4, 4, cmr, cmc, sixtap = true)
      for (y <- 0 until 4; x <- 0 until 4) {
        eu((r * 4 + y) * cw + c * 4 + x) = bu(y * 4 + x)
        ev((r * 4 + y) * cw + c * 4 + x) = bv(y * 4 + x)
      }
    }
    assertPlane(frames(1).y, ey, w, "split Y")
    assertPlane(frames(1).u, eu, cw, "split U")
    assertPlane(frames(1).v, ev, cw, "split V")
  }

  test("golden reference routing: a frame that refreshed golden is " +
    "still reachable after last moves on") {
    val shift = Array.fill(MbW * MbH)(packMv(0, 16)) // +2px right
    // frame 1: shift, refresh golden AND last
    val f1 = Vp8Inter.buildInterFrame(MbW, MbH,
      shift.map(mv => WMb(ModeNew, mv = mv)), refreshGolden = true)
    // frame 2: shift again (so last != golden afterwards)
    val f2 = Vp8Inter.buildInterFrame(MbW, MbH,
      shift.map(mv => WMb(ModeNew, mv = mv)))
    // frame 3: ZERO MVs against GOLDEN -> must reproduce frame 1
    val f3 = Vp8Inter.buildInterFrame(MbW, MbH,
      Array.fill(MbW * MbH)(WMb(ModeZero, refFrame = 2)))
    val ivf = Vp8Inter.buildIvf(key.width, key.height,
      Seq(keyPayload, f1, f2, f3))
    val frames = Vp8Inter.decodeIvf(ivf).getOrElse(fail("decode None"))
    assert(frames.length == 4)
    assert(java.util.Arrays.equals(frames(3).y, frames(1).y), "Y via golden")
    assert(java.util.Arrays.equals(frames(3).u, frames(1).u), "U via golden")
    assert(!java.util.Arrays.equals(frames(2).y, frames(1).y),
      "frame 2 must differ (the routing would vacuously pass)")
  }

  test("bilinear filter path (version 3, full-pel chroma mask off at " +
    "even MVs): decoded planes equal the bilinear spec math") {
    // quarter-pel MVs under version 3 are masked to full-pel by the
    // spec; use MVs whose masked values still exercise the copy path
    // plus a version-1-style check of the bilinear kernels via the
    // chroma derivation (odd eighth-pel chroma MVs)
    val mvs = Array(packMv(0, 0), packMv(8, 24), packMv(16, 8),
      packMv(24, 16), packMv(8, 8), packMv(16, 16))
    val wmbs = mvs.map(mv =>
      if (mv == 0) WMb(ModeZero) else WMb(ModeNew, mv = mv))
    val inter = Vp8Inter.buildInterFrame(MbW, MbH, wmbs, version = 3)
    val ivf = Vp8Inter.buildIvf(key.width, key.height,
      Seq(keyPayload, inter))
    val frames = Vp8Inter.decodeIvf(ivf).getOrElse(fail("decode None"))
    // full-pel mask: luma offsets are integral; chroma = mv/2 (round
    // away from zero) then masked to full pel
    val w = key.width; val h = key.height; val cw = w / 2; val ch = h / 2
    val ey = new Array[Int](w * h)
    val eu = new Array[Int](cw * ch)
    val ev = new Array[Int](cw * ch)
    for (m <- 0 until MbW * MbH) {
      val mbx = m % MbW; val mby = m / MbW
      val mr = Vp8Inter.mvRow(mvs(m)) & ~7
      val mc = Vp8Inter.mvCol(mvs(m)) & ~7
      val by = refMc(key.y, w, h, mbx * 16, mby * 16, 16, 16, mr, mc,
        sixtap = false)
      for (y <- 0 until 16; x <- 0 until 16)
        ey((mby * 16 + y) * w + mbx * 16 + x) = by(y * 16 + x)
      val cmr = Vp8Inter.chromaMv(mr) & ~7
      val cmc = Vp8Inter.chromaMv(mc) & ~7
      val bu = refMc(key.u, cw, ch, mbx * 8, mby * 8, 8, 8, cmr, cmc,
        sixtap = false)
      val bv = refMc(key.v, cw, ch, mbx * 8, mby * 8, 8, 8, cmr, cmc,
        sixtap = false)
      for (y <- 0 until 8; x <- 0 until 8) {
        eu((mby * 8 + y) * cw + mbx * 8 + x) = bu(y * 8 + x)
        ev((mby * 8 + y) * cw + mbx * 8 + x) = bv(y * 8 + x)
      }
    }
    assertPlane(frames(1).y, ey, w, "v3 Y")
    assertPlane(frames(1).u, eu, cw, "v3 U")
    assertPlane(frames(1).v, ev, cw, "v3 V")
  }

  test("multi-partition token streams (§9.5): 2 and 4 partitions " +
    "with per-row EOB tokens decode identically to the skip stream, " +
    "and corrupting the second partition changes only what it feeds " +
    "— the first partitions-are-load-bearing pin in this container " +
    "(libwebp never emits more than one)") {
    val mvs = Array(packMv(0, 0), packMv(8, 16), packMv(0, 2),
      packMv(4, 4), packMv(16, 8), packMv(8, 8))
    val wmbs = mvs.map(mv =>
      if (mv == 0) WMb(ModeZero) else WMb(ModeNew, mv = mv))
    def frames(inter: Array[Byte]): Seq[Vp8.Yuv] =
      Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width, key.height,
        Seq(keyPayload, inter))).getOrElse(fail("decode None"))
    val base = frames(Vp8Inter.buildInterFrame(MbW, MbH, wmbs))(1)
    Seq(2, 4).foreach { np =>
      val multi = Vp8Inter.buildInterFrame(MbW, MbH, wmbs, nParts = np)
      val got = frames(multi)(1)
      assert(java.util.Arrays.equals(got.y, base.y), s"np=$np Y")
      assert(java.util.Arrays.equals(got.u, base.u), s"np=$np U")
      assert(java.util.Arrays.equals(got.v, base.v), s"np=$np V")
      // the second partition must be READ, not skipped over: flip a
      // bit in its first byte and row 1's tokens change (EOB becomes
      // a coefficient read), so the decoded planes must differ
      val part0Len = (((multi(0) & 0xff) | ((multi(1) & 0xff) << 8) |
        ((multi(2) & 0xff) << 16)) >> 5)
      val sizesAt = 3 + part0Len
      val p0len = (multi(sizesAt) & 0xff) |
        ((multi(sizesAt + 1) & 0xff) << 8) |
        ((multi(sizesAt + 2) & 0xff) << 16)
      val p1At = sizesAt + 3 * (np - 1) + p0len
      val tampered = multi.clone()
      tampered(p1At) = (tampered(p1At) ^ 0x80).toByte
      val td = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
        key.height, Seq(keyPayload, tampered)))
      assert(td.isEmpty || !java.util.Arrays.equals(td.get(1).y, base.y),
        s"np=$np: partition 2 tamper must be visible")
    }
  }

  test("inter residuals: a content-bearing token stream (one quantized " +
    "AC coefficient per chosen MB) decodes to MC prediction + the " +
    "spec-math inverse DCT — the predict/residue composition and the " +
    "inter-path dequant, pinned with real coefficients") {
    val mvs = Array(packMv(0, 0), packMv(8, 16), packMv(0, 2),
      packMv(4, 4), packMv(16, 8), packMv(8, 8))
    val wmbs = mvs.zipWithIndex.map { case (mv, i) =>
      val ac = if (i == 0) 1 else if (i == 4) -1 else 0
      if (mv == 0) WMb(ModeZero, acY = ac)
      else WMb(ModeNew, mv = mv, acY = ac)
    }
    val inter = Vp8Inter.buildInterFrame(MbW, MbH, wmbs, nParts = 2)
    val frames = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
      key.height, Seq(keyPayload, inter))).getOrElse(fail("decode None"))
    val w = key.width; val h = key.height
    // expected: the full MC (the writer resolves each MB's effective
    // MV the same way the NEW/ZERO test already pinned)...
    def mvOf(m: Int): Int = mvs(m)
    val (ey, eu, ev) = expectedFullMc(mvOf, sixtap = true)
    // ...plus the spec-math §14.4 inverse DCT of ONE coefficient at
    // zigzag position 1 (coeffs index 1), dequantized with the AC
    // factor of the frame's y_ac_qi = 40, added into luma block 0 of
    // MBs 0 and 4
    val acq = graft.functions.Vp8Tables.AcQLookup(40)
    Seq((0, 1), (4, -1)).foreach { case (m, sgn) =>
      val coefs = new Array[Int](16)
      coefs(1) = sgn * acq
      val d = idct4(coefs)
      val bx = (m % MbW) * 16; val by = (m / MbW) * 16
      for (y <- 0 until 4; x <- 0 until 4)
        ey((by + y) * w + bx + x) = math.max(0, math.min(255,
          ey((by + y) * w + bx + x) + d(y * 4 + x)))
    }
    assertPlane(frames(1).y, ey, w, "residue Y")
    assertPlane(frames(1).u, eu, w / 2, "residue U")
    assertPlane(frames(1).v, ev, w / 2, "residue V")
    // the residue genuinely changed pixels vs the pure-MC frame
    val pure = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
      key.height, Seq(keyPayload,
        Vp8Inter.buildInterFrame(MbW, MbH, wmbs.map(_.copy(acY = 0)),
          nParts = 2)))).get(1)
    assert(!java.util.Arrays.equals(frames(1).y, pure.y),
      "residue must be visible")
  }

  test("intra MBs inside an interframe (§11.3 frame-level mode " +
    "probabilities): a top row of DC_PRED MBs over fresh borders " +
    "decodes to the spec's flat 128 while the bottom row ZERO-MVs " +
    "the reference through untouched") {
    // top row intra DC (above row is the 127/129 frame border, left
    // neighbors are themselves flat): every Y/U/V sample is exactly
    // 128. Bottom row ZERO-mv inter: the keyframe's pixels.
    val wmbs = Array.tabulate(MbW * MbH)(m =>
      if (m < MbW) WMb(ModeZero, intraYMode = 0) else WMb(ModeZero))
    val inter = Vp8Inter.buildInterFrame(MbW, MbH, wmbs)
    val frames = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
      key.height, Seq(keyPayload, inter))).getOrElse(fail("decode None"))
    val w = key.width; val h = key.height; val cw = w / 2; val ch = h / 2
    val got = frames(1)
    for (y <- 0 until h; x <- 0 until w) {
      val want = if (y < 16) 128 else key.y(y * w + x) & 0xff
      assert((got.y(y * w + x) & 0xff) == want, s"Y ($x,$y)")
    }
    for (y <- 0 until ch; x <- 0 until cw) {
      val wu = if (y < 8) 128 else key.u(y * cw + x) & 0xff
      val wv = if (y < 8) 128 else key.v(y * cw + x) & 0xff
      assert((got.u(y * cw + x) & 0xff) == wu, s"U ($x,$y)")
      assert((got.v(y * cw + x) & 0xff) == wv, s"V ($x,$y)")
    }
  }

  // ---- 5. validator stance -------------------------------------------

  test("validator stance: a standalone interframe and an IVF that " +
    "does not open with a keyframe both reject; truncation rejects") {
    val inter = Vp8Inter.buildInterFrame(MbW, MbH,
      Array.fill(MbW * MbH)(WMb(ModeZero)))
    assert(Vp8.decodeFrame(inter, 0, inter.length).isEmpty,
      "standalone interframe must reject")
    val badIvf = Vp8Inter.buildIvf(key.width, key.height, Seq(inter))
    assert(Vp8Inter.decodeIvf(badIvf).isEmpty, "inter-first IVF")
    val okIvf = Vp8Inter.buildIvf(key.width, key.height,
      Seq(keyPayload, inter))
    assert(Vp8Inter.decodeIvf(okIvf).isDefined)
    assert(Vp8Inter.decodeIvf(okIvf.dropRight(5)).isEmpty, "truncated")
    assert(Vp8Inter.decodeIvf(null).isEmpty)
  }

  // ---- 6. persistent frame features + ref plumbing (r13) -------------

  /** clamp-add the acY residual (a ONE at coefficient index 1,
    * dequantized with `acq`) into luma block 0 of MB `m`. */
  private def addAcResidual(ey: Array[Int], w: Int, m: Int,
      acq: Int): Unit = {
    val coefs = new Array[Int](16)
    coefs(1) = acq
    val d = idct4(coefs)
    val bx = (m % MbW) * 16; val by = (m / MbW) * 16
    for (y <- 0 until 4; x <- 0 until 4)
      ey((by + y) * w + bx + x) = math.max(0, math.min(255,
        ey((by + y) * w + bx + x) + d(y * 4 + x)))
  }

  private def clampQ(q: Int): Int = math.max(0, math.min(127, q))

  test("segmentation persists across interframes (RFC 6386 \u00a79.3): " +
    "an update frame codes the map + per-segment quant deltas; the " +
    "next frame keeps segmentation enabled WITHOUT any update and " +
    "must dequantize with the inherited map and feature data") {
    val map = Array(0, 1, 2, 0, 1, 2)
    val quant = Array(0, 60, -20, 0)
    val wmbs = Array.fill(MbW * MbH)(WMb(ModeZero, acY = 1))
    val f1 = Vp8Inter.buildInterFrame(MbW, MbH, wmbs, nParts = 2,
      seg = Vp8Inter.WSeg(updateMap = true, updateData = true,
        quant = quant, map = map))
    val f2 = Vp8Inter.buildInterFrame(MbW, MbH, wmbs, nParts = 2,
      seg = Vp8Inter.WSeg()) // enabled, nothing recoded: inherit
    val frames = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
      key.height, Seq(keyPayload, f1, f2))).getOrElse(fail("decode None"))
    val w = key.width
    def segAcq(m: Int): Int =
      graft.functions.Vp8Tables.AcQLookup(clampQ(40 + quant(map(m))))
    // load-bearing only if the segment quantizers actually differ
    assert(segAcq(0) != segAcq(1) && segAcq(0) != segAcq(2))
    val ey = key.y.map(_ & 0xff)
    for (m <- 0 until MbW * MbH) addAcResidual(ey, w, m, segAcq(m))
    assertPlane(frames(1).y, ey, w, "update-frame Y")
    for (m <- 0 until MbW * MbH) addAcResidual(ey, w, m, segAcq(m))
    assertPlane(frames(2).y, ey, w, "inherited-segmentation Y")
    // chroma carries no residual: both frames pass it through
    assertPlane(frames(2).u, key.u.map(_ & 0xff), w / 2, "U untouched")
  }

  test("loop-filter deltas persist across interframes (\u00a79.4): an " +
    "update frame sets ref deltas that cancel the frame filter " +
    "level; the next frame enables deltas WITHOUT an update and " +
    "must stay unfiltered; a control frame without deltas shows " +
    "the filter would otherwise have changed pixels") {
    val wmbs = Array.fill(MbW * MbH)(WMb(ModeZero, acY = 1))
    val lfd = Array(-63, -63, -63, -63, 0, 0, 0, 0)
    def fr(enabled: Boolean, upd: Array[Int]) =
      Vp8Inter.buildInterFrame(MbW, MbH, wmbs, nParts = 2,
        filterLevel = 32, lfDeltaEnabled = enabled, lfDeltaUpdate = upd)
    val frames = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
      key.height, Seq(keyPayload, fr(true, lfd), fr(true, null),
        fr(false, null)))).getOrElse(fail("decode None"))
    val w = key.width
    val acq = graft.functions.Vp8Tables.AcQLookup(40)
    val ey = key.y.map(_ & 0xff)
    for (m <- 0 until MbW * MbH) addAcResidual(ey, w, m, acq)
    assertPlane(frames(1).y, ey, w, "cancelled-filter Y (update)")
    for (m <- 0 until MbW * MbH) addAcResidual(ey, w, m, acq)
    assertPlane(frames(2).y, ey, w, "cancelled-filter Y (inherited)")
    // control: the same content with lf deltas DISABLED runs the
    // level-32 filter and must differ from the unfiltered math
    for (m <- 0 until MbW * MbH) addAcResidual(ey, w, m, acq)
    val gotY = frames(3).y.map(_ & 0xff)
    assert(gotY.toSeq != ey.toSeq,
      "control frame must actually be filtered")
  }

  test("reference-buffer copy ordering (\u00a79.7 / libvpx " +
    "swap_frame_buffers): copyAlt=1 + copyGolden=2 in one frame " +
    "lands the PRE-frame last in golden, because golden's copy " +
    "reads the JUST-UPDATED altref") {
    val resid = Array.fill(MbW * MbH)(WMb(ModeZero, acY = 1))
    val f1 = Vp8Inter.buildInterFrame(MbW, MbH, resid, nParts = 2)
    val skip = Array.fill(MbW * MbH)(WMb(ModeZero))
    val f2 = Vp8Inter.buildInterFrame(MbW, MbH, skip,
      refreshLast = false, copyAlt = 1, copyGolden = 2)
    val fromGold = Array.fill(MbW * MbH)(WMb(ModeZero, refFrame = 2))
    val f3 = Vp8Inter.buildInterFrame(MbW, MbH, fromGold)
    val frames = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
      key.height, Seq(keyPayload, f1, f2, f3)))
      .getOrElse(fail("decode None"))
    assert(!java.util.Arrays.equals(frames(1).y, frames(0).y),
      "f1 must differ from the keyframe for the pin to bite")
    // under pre-frame-resolved copies golden would be the KEYFRAME
    assert(java.util.Arrays.equals(frames(3).y, frames(1).y), "Y")
    assert(java.util.Arrays.equals(frames(3).u, frames(1).u), "U")
    assert(java.util.Arrays.equals(frames(3).v, frames(1).v), "V")
  }

  test("B_PRED inside an interframe (§11.3 FIXED sub-mode " +
    "probabilities, r13): the top-left MB codes 16 B_DC sub-modes " +
    "over fresh frame borders and reconstructs the spec's CHAINED " +
    "per-4x4 DC values (row 0 = 128, rows 1-3 = 129) while the rest " +
    "ZERO-mvs the reference through; with 2 token partitions the " +
    "MB's no-Y2 block layout is load-bearing in the token stream") {
    val wmbs = Array.tabulate(MbW * MbH)(m =>
      if (m == 0) WMb(ModeZero, intraYMode = 4,
        bModes = Array.fill(16)(0)) // all B_DC
      else WMb(ModeZero))
    // spec-math chained B_DC (§12.3: dc = (4 above + 4 left + 4) >> 3)
    // over the frame borders: above row 127, left column 129
    val mbPix = Array.ofDim[Int](16, 16)
    for (r <- 0 until 4; c <- 0 until 4) {
      var sum = 4
      for (k <- 0 until 4) {
        sum += (if (r == 0) 127 else mbPix(4 * r - 1)(4 * c + k))
        sum += (if (c == 0) 129 else mbPix(4 * r + k)(4 * c - 1))
      }
      val dc = sum >> 3
      for (y <- 0 until 4; x <- 0 until 4)
        mbPix(4 * r + y)(4 * c + x) = dc
    }
    // the chain must actually produce structure, not one flat value
    assert(mbPix(0)(0) == 128 && mbPix(15)(0) == 129,
      s"chained DC shape: ${mbPix(0)(0)}/${mbPix(15)(0)}")
    for (parts <- Seq(1, 2)) {
      val inter = Vp8Inter.buildInterFrame(MbW, MbH, wmbs,
        nParts = parts)
      val frames = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
        key.height, Seq(keyPayload, inter)))
        .getOrElse(fail(s"decode None (parts=$parts)"))
      val got = frames(1)
      val w = key.width
      for (y <- 0 until key.height; x <- 0 until w) {
        val want = if (y < 16 && x < 16) mbPix(y)(x)
          else key.y(y * w + x) & 0xff
        assert((got.y(y * w + x) & 0xff) == want,
          s"Y ($x,$y) parts=$parts")
      }
      // the B_PRED MB's chroma is DC over the same fresh borders: 128
      val cw = w / 2
      for (y <- 0 until key.height / 2; x <- 0 until cw) {
        val wu = if (y < 8 && x < 8) 128 else key.u(y * cw + x) & 0xff
        val wv = if (y < 8 && x < 8) 128 else key.v(y * cw + x) & 0xff
        assert((got.u(y * cw + x) & 0xff) == wu, s"U ($x,$y) parts=$parts")
        assert((got.v(y * cw + x) & 0xff) == wv, s"V ($x,$y) parts=$parts")
      }
    }
  }

  test("ivf_meta triage: header + frame tag bits only — the census " +
    "fixture reads 1 keyframe + 2 interframes without decoding") {
    val m = graft.functions.IvfMeta.compute(Vp8Fixtures.ivfFor(0L))
    assert(m != null)
    assert((m.getInt(0), m.getInt(1), m.getInt(2), m.getInt(3),
      m.getInt(4)) == ((48, 32, 3, 1, 2)))
    // a re-keyed stream counts both keyframes
    val tinyPayload2 = vp8Chunk(res("vp8_tiny.webp"))
    val two = Vp8Inter.buildIvf(48, 32, Seq(keyPayload,
      Vp8Inter.buildInterFrame(MbW, MbH,
        Array.fill(MbW * MbH)(WMb(ModeZero))), tinyPayload2))
    val m2 = graft.functions.IvfMeta.compute(two)
    assert(m2.getInt(2) == 3 && m2.getInt(3) == 2 && m2.getInt(4) == 1)
    assert(graft.functions.IvfMeta.compute("nope".getBytes) == null)
  }

  test("a mid-sequence keyframe may change dimensions (r13): the " +
    "sequence re-keys at 16x16 after 48x32 frames, and an " +
    "interframe after the new keyframe predicts from it") {
    val tinyPayload = vp8Chunk(res("vp8_tiny.webp"))
    val tiny = Vp8.decodeFrame(tinyPayload, 0, tinyPayload.length).get
    assert(tiny.width == 16 && tiny.height == 16)
    val inter48 = Vp8Inter.buildInterFrame(MbW, MbH,
      Array.fill(MbW * MbH)(WMb(ModeZero)))
    val inter16 = Vp8Inter.buildInterFrame(1, 1, Array(WMb(ModeZero)))
    val frames = Vp8Inter.decodeIvf(Vp8Inter.buildIvf(key.width,
      key.height, Seq(keyPayload, inter48, tinyPayload, inter16)))
      .getOrElse(fail("decode None"))
    assert(frames(2).width == 16 && frames(2).height == 16)
    assert(java.util.Arrays.equals(frames(2).y, tiny.y), "re-key Y")
    assert(java.util.Arrays.equals(frames(3).y, tiny.y), "inter Y")
    assert(java.util.Arrays.equals(frames(3).u, tiny.u), "inter U")
    assert(java.util.Arrays.equals(frames(3).v, tiny.v), "inter V")
  }

}
