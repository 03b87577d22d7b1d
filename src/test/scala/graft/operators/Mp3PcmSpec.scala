package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp3Tables
import graft.operators.Mp3FramesWriter.Gr

/** Layer III decoder conformance, built for a container with NO
  * foreign MP3 decoder: (1) the one foreign file (LAME silence) pins
  * framing/side-info/reservoir/zero-path externally; (2) a REFERENCE
  * PIPELINE in this spec — built straight from the fixtures' chosen
  * side-info/scalefactor/spectrum values, never touching the
  * decoder's bitstream, LUT, or state code — must reproduce the
  * decoder's PCM to the int16 LSB on every content fixture (long,
  * short, mixed, LSF, preflag, reservoir); (3) MS stereo is pinned by
  * linearity against two mono decodes; (4) the tables re-verify as
  * complete prefix codes and the synthesis window as a symmetric
  * prototype, in Scala, independently of the generator. */
class Mp3PcmSpec extends AnyFunSuite {

  private def lameBytes: Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/external/lame_silence.mp3").toURI))

  // ------------------------------------------------ external fixture

  test("FOREIGN fixture: the LAME MPEG-2 silence encode decodes to " +
    "exactly 45x576 zero samples with every granule bit-exact") {
    val (dec, st) = Mp3Pcm.decodeWithStats(lameBytes).get
    assert(st == Mp3Pcm.Stats(45, 45, 45, 0, 22050, 1, 25920))
    assert(dec.pcm.length == 25920 && dec.pcm.forall(_ == 0))
  }

  test("a cut stream (first frames sliced off) decodes with the " +
    "unreachable-reservoir granules silent, not an error") {
    val b = Mp3Fixtures.mono1(1L)
    // find the 3rd frame boundary by walking headers
    var pos = 0
    var k = 0
    while (k < 2) {
      val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320)((b(pos + 2) >> 4) & 0xf)
      pos += 144000 * kbps / 44100
      k += 1
    }
    val cut = b.drop(pos)
    val st = Mp3Pcm.stats(cut).get
    assert(st.frames == 2)
    assert(st.reservoirSilent > 0, "expected silent reservoir granules")
  }

  // ------------------------------------------------- table integrity

  test("every shipped Huffman table is a complete prefix code " +
    "(its flat LUT covers each slot exactly once)") {
    (Mp3Tables.Huff.map { case (id, (xl, yl, packed)) =>
      (s"t$id", packed)
    } ++ Seq(("count1A", Mp3Tables.Count1A), ("count1B", Mp3Tables.Count1B)))
      .foreach { case (name, packed) =>
        val maxLen = packed.map(_ >>> 16).max
        val hits = new Array[Int](1 << maxLen)
        packed.foreach { e =>
          val len = e >>> 16
          val code = e & 0xffff
          assert(len > 0, s"$name: zero-length code")
          var f = 0
          while (f < (1 << (maxLen - len))) {
            hits((code << (maxLen - len)) | f) += 1
            f += 1
          }
        }
        assert(hits.forall(_ == 1),
          s"$name: LUT coverage ${hits.count(_ == 0)} holes, " +
            s"${hits.count(_ > 1)} overlaps")
      }
  }

  test("the synthesis window unbakes to a symmetric prototype with " +
    "the printed spec anchors") {
    val d = Mp3Tables.SynthWindow
    assert(d.length == 512)
    def h(n: Int): Double =
      (if ((n / 64) % 2 == 1) -1 else 1) * (if (n == 512) d(0) else d(n))
    (1 until 512).foreach(n => assert(h(n) == h(512 - n), s"h($n)"))
    assert(d(256) == 75038.0 / 65536.0)
    assert(d(32) == -29.0 / 65536.0 && d(416) == 459.0 / 65536.0)
  }

  // ---------------------------------------- reference-pipeline pins

  /** The reference chain: spectrum assembled from the Gr SPEC (not
    * the bitstream), requantize / reorder / alias / IMDCT / overlap /
    * inversion / synthesis evaluated directly from the ISO formulas.
    * Persistent per-channel state mirrors granule chaining. */
  private final class RefChain(rate: Int) {
    private val overlap = Array.ofDim[Double](32, 36)
    private val v = new Array[Double](1024)
    private val sfbL = Mp3Tables.SfbLong(rate)
    private val sfbS = Mp3Tables.SfbShort(rate)

    def granulePcm(gr: Gr, scalefacEff: Array[Int], lsf: Boolean): Array[Int] = {
      // 1. spectrum in huffman order
      val is = new Array[Double](576)
      var i = 0
      gr.bigPairs.foreach { case (x, y) =>
        is(i) = x; is(i + 1) = y; i += 2
      }
      gr.quads.foreach { case (a, b, c, d) =>
        is(i) = a; is(i + 1) = b; is(i + 2) = c; is(i + 3) = d; i += 4
      }
      // 2. requantize
      val xr = new Array[Double](576)
      val mul = if (gr.scalefacScale == 1) 1.0 else 0.5
      val gg = gr.globalGain - 210
      val preflag =
        if (lsf) (if (gr.scalefacCompress >= 500) 1 else 0) else gr.preflag
      if (gr.blockType == 2) {
        val longEnd = if (gr.mixedBlock) 36 else 0
        var j = 0
        var band = 0
        while (j < longEnd) {
          if (j == sfbL(band + 1)) band += 1
          val pre = if (preflag == 1) Mp3Tables.Pretab(band) else 0
          xr(j) = sgnPow43(is(j)) *
            math.pow(2.0, gg / 4.0 - mul * (scalefacEff(band) + pre))
          j += 1
        }
        var sband = if (gr.mixedBlock) 3 else 0
        while (j < 576 && sband < 13) {
          val width = sfbS(sband + 1) - sfbS(sband)
          var w = 0
          while (w < 3) {
            val sf = if (sband < 12) gr.scalefacS(sband)(w) else 0
            val f = math.pow(2.0,
              (gg - 8 * gr.subblockGain(w)) / 4.0 - mul * sf)
            var l = 0
            while (l < width && j < 576) {
              xr(j) = sgnPow43(is(j)) * f; j += 1; l += 1
            }
            w += 1
          }
          sband += 1
        }
      } else {
        var j = 0
        var band = 0
        while (j < 576) {
          if (band < 21 && j == sfbL(band + 1)) band += 1
          val pre = if (preflag == 1) Mp3Tables.Pretab(band) else 0
          xr(j) = sgnPow43(is(j)) *
            math.pow(2.0, gg / 4.0 - mul * (scalefacEff(band) + pre))
          j += 1
        }
      }
      // 3. reorder (short region): huffman order (sfb, window, line)
      //    -> interleaved-by-line order
      if (gr.blockType == 2) {
        val start = if (gr.mixedBlock) 36 else 0
        val startBand = if (gr.mixedBlock) 3 else 0
        val tmp = new Array[Double](576 - start)
        var src = start
        var band = startBand
        while (band < 13) {
          val lo = sfbS(band)
          val width = sfbS(band + 1) - lo
          var w = 0
          while (w < 3) {
            var l = 0
            while (l < width) {
              tmp(3 * lo + 3 * l + w - start) = xr(src)
              src += 1; l += 1
            }
            w += 1
          }
          band += 1
        }
        System.arraycopy(tmp, 0, xr, start, tmp.length)
      }
      // 4. alias reduction on long boundaries
      val ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
        -0.0142, -0.0037)
      val nB =
        if (gr.blockType == 2) (if (gr.mixedBlock) 1 else 0) else 31
      var b = 0
      while (b < nB) {
        var k = 0
        while (k < 8) {
          val cs = 1.0 / math.sqrt(1.0 + ci(k) * ci(k))
          val ca = ci(k) / math.sqrt(1.0 + ci(k) * ci(k))
          val lo = 18 * b + 17 - k
          val hi = 18 * b + 18 + k
          val x0 = xr(lo); val x1 = xr(hi)
          xr(lo) = x0 * cs - x1 * ca
          xr(hi) = x1 * cs + x0 * ca
          k += 1
        }
        b += 1
      }
      // 5. IMDCT per subband + overlap + inversion
      val ts = Array.ofDim[Double](18, 32)
      var sb = 0
      while (sb < 32) {
        val bt =
          if (gr.blockType == 2 && gr.mixedBlock && sb < 2) 0
          else gr.blockType
        val x = new Array[Double](36)
        if (bt == 2) {
          var w = 0
          while (w < 3) {
            var n = 0
            while (n < 12) {
              var s = 0.0
              var k = 0
              while (k < 6) {
                s += xr(18 * sb + 3 * k + w) *
                  math.cos(math.Pi / 24.0 * (2 * n + 1 + 6) * (2 * k + 1))
                k += 1
              }
              x(6 + 6 * w + n) += s * math.sin(math.Pi / 12.0 * (n + 0.5))
              n += 1
            }
            w += 1
          }
        } else {
          var n = 0
          while (n < 36) {
            var s = 0.0
            var k = 0
            while (k < 18) {
              s += xr(18 * sb + k) *
                math.cos(math.Pi / 72.0 * (2 * n + 1 + 18) * (2 * k + 1))
              k += 1
            }
            val win = bt match {
              case 0 => math.sin(math.Pi / 36.0 * (n + 0.5))
              case 1 =>
                if (n < 18) math.sin(math.Pi / 36.0 * (n + 0.5))
                else if (n < 24) 1.0
                else if (n < 30) math.sin(math.Pi / 12.0 * (n - 18 + 0.5))
                else 0.0
              case 3 =>
                if (n < 6) 0.0
                else if (n < 12) math.sin(math.Pi / 12.0 * (n - 6 + 0.5))
                else if (n < 18) 1.0
                else math.sin(math.Pi / 36.0 * (n + 0.5))
            }
            x(n) = s * win
            n += 1
          }
        }
        var t = 0
        while (t < 18) {
          var sVal = x(t) + overlap(sb)(t)
          overlap(sb)(t) = x(18 + t)
          if ((sb & 1) == 1 && (t & 1) == 1) sVal = -sVal
          ts(t)(sb) = sVal
          t += 1
        }
        sb += 1
      }
      // 6. polyphase synthesis
      val out = new Array[Int](576)
      var t = 0
      while (t < 18) {
        System.arraycopy(v, 0, v, 64, 960)
        var ii = 0
        while (ii < 64) {
          var acc = 0.0
          var k = 0
          while (k < 32) {
            acc += math.cos((16 + ii) * (2 * k + 1) * math.Pi / 64.0) *
              ts(t)(k)
            k += 1
          }
          v(ii) = acc
          ii += 1
        }
        var j = 0
        while (j < 32) {
          var acc = 0.0
          var bb = 0
          while (bb < 8) {
            acc += v(128 * bb + j) * Mp3Tables.SynthWindow(64 * bb + j)
            acc += v(128 * bb + 96 + j) * Mp3Tables.SynthWindow(64 * bb + 32 + j)
            bb += 1
          }
          out(32 * t + j) = math.max(-32768.0,
            math.min(32767.0, math.rint(acc * 32768.0))).toInt
          j += 1
        }
        t += 1
      }
      out
    }
  }

  private def sgnPow43(x: Double): Double = {
    val m = math.pow(math.abs(x), 4.0 / 3.0)
    if (x < 0) -m else m
  }

  /** Rebuild the fixtures' Gr matrices exactly as [[Mp3Fixtures]]
    * does (same code path — the POINT is the reference chain below,
    * which never sees the bitstream). */
  private def refPcmMono(
      grs: Seq[Seq[Seq[Gr]]], rate: Int, scfsi: Array[Int]): Array[Int] = {
    val lsf = rate != 44100
    val chain = new RefChain(rate)
    val out = Array.newBuilder[Int]
    grs.foreach { frame =>
      var gr0Sf: Array[Int] = null
      frame.zipWithIndex.foreach { case (grSeq, g) =>
        val gr = grSeq.head
        val eff = new Array[Int](22)
        var b0 = 0
        while (b0 < 21) { eff(b0) = gr.scalefacL(b0); b0 += 1 }
        if (!lsf && g == 1 && gr.blockType == 0 && gr0Sf != null) {
          var b = 0
          while (b < 21) {
            val group = if (b < 6) 0 else if (b < 11) 1
            else if (b < 16) 2 else 3
            if (scfsi(group) == 1) eff(b) = gr0Sf(b)
            b += 1
          }
        }
        if (g == 0 && gr.blockType == 0) gr0Sf = eff.clone()
        out ++= chain.granulePcm(gr, eff, lsf)
      }
    }
    out.result()
  }

  private def assertPcmClose(
      got: Array[Short], want: Array[Int], tag: String): Unit = {
    assert(got.length == want.length, s"$tag: length")
    var worst = 0
    var i = 0
    while (i < got.length) {
      worst = math.max(worst, math.abs(got(i) - want(i)))
      i += 1
    }
    assert(worst <= 1, s"$tag: worst PCM delta $worst LSB")
  }

  test("reference chain reproduces the decoder on the long-block " +
    "mono fixture (reservoir + scfsi + preflag live)") {
    val grsSpec = (0 until 4).map { f =>
      Seq(Seq(fixLongGr(1L * 17 + f * 2, 168 + f, 0)),
        Seq(fixLongGr(1L * 17 + f * 2 + 1, 170 - f, 1)))
    }
    val dec = Mp3Pcm.decode(Mp3Fixtures.mono1(1L)).get
    val want = refPcmMono(grsSpec, 44100, scfsiPerFixture(grsSpec))
    assertPcmClose(dec.pcm, want, "mono1")
  }

  // replicate Mp3Fixtures' granule constructions so the reference
  // chain consumes the SPEC values, not anything decoded
  private def fv(seed: Long, i: Int, m: Int): Int = {
    val x = (((seed * 31 + i * 7 + 3) % (m + 1)) + (m + 1)) % (m + 1)
    if (((seed + i) & 1) == 0) x.toInt else -x.toInt
  }
  private def fixLongGr(seed: Long, gain: Int, c1sel: Int): Gr = {
    val pairs = (0 until 72).map { p =>
      val m = if (p < 22) 5 else if (p < 45) 7 else 5
      (fv(seed, 2 * p, m), fv(seed + 1, 2 * p + 1, m))
    }
    val quads = (0 until 12).map { q =>
      (fv(seed, 4 * q, 1), fv(seed, 4 * q + 1, 1),
        fv(seed, 4 * q + 2, 1), fv(seed, 4 * q + 3, 1))
    }
    Gr(globalGain = gain, scalefacCompress = 15,
      tableSelect = Seq(7, 10, 9), region0 = 8, region1 = 3,
      preflag = (seed % 2).toInt, scalefacScale = ((seed / 2) % 2).toInt,
      count1Sel = c1sel,
      scalefacL = (0 until 21).map(b =>
        (b * 3 + seed).toInt.abs % (if (b < 11) 16 else 8)),
      bigPairs = pairs, quads = quads)
  }
  private def scfsiPerFixture(grs: Seq[Seq[Seq[Gr]]]): Array[Int] =
    Array(0, 1, 1, 0)

  // the scfsi contract requires granule-1 bands in shared groups to
  // REUSE granule-0 values; the writer simply skips them and the
  // decoder copies — the reference chain models the same rule above.

  test("reference chain reproduces the decoder on short and mixed " +
    "blocks (subblock gains, window interleave, 12-point IMDCT)") {
    val grsSpec = (0 until 3).map { f =>
      Seq(Seq(fixLongGr(3L * 7 + f, 166, 0)),
        Seq(fixShortGr(3L * 7 + f + 1, 168, f == 1)))
    }
    val dec = Mp3Pcm.decode(Mp3Fixtures.shortBlocks(3L)).get
    val want = refPcmMono(grsSpec, 44100, Array(0, 0, 0, 0))
    assertPcmClose(dec.pcm, want, "shortBlocks")
  }

  private def fixShortGr(seed: Long, gain: Int, mixed: Boolean): Gr = {
    val pairs = (0 until 54).map { p =>
      val m = if (2 * p < 36) 5 else 7
      (fv(seed, 2 * p, m), fv(seed + 2, 2 * p + 1, m))
    }
    Gr(globalGain = gain, scalefacCompress = 15, blockType = 2,
      mixedBlock = mixed, tableSelect = Seq(7, 10, 0),
      subblockGain = Seq((seed % 3).toInt.abs, 1, 0),
      scalefacL = (0 until 21).map(b => if (b < 8) (b + 1) % 8 else 0),
      scalefacS = (0 until 13).map(s => (0 until 3).map(w =>
        ((s * 2 + w + seed).toInt.abs % (if (s < 6) 16 else 8)))),
      bigPairs = pairs,
      quads = (0 until 8).map(q =>
        (fv(seed, q, 1), fv(seed, q + 9, 1), fv(seed, q + 17, 1),
          fv(seed, q + 25, 1))))
  }

  test("reference chain reproduces the decoder on LSF content " +
    "(22.05 kHz bands, scalefac_compress ranges incl. forced preflag)") {
    val id = 4L
    def gr(f: Int): Gr = {
      val seed = id * 11 + f
      val (sfc, caps) = f % 3 match {
        case 0 => (250, Seq((6, 7), (5, 0), (5, 3), (5, 3)))
        case 1 => (430, Seq((6, 1), (5, 3), (7, 3), (3, 0)))
        case _ => (505, Seq((11, 1), (10, 3), (0, 0), (0, 0)))
      }
      val sf = caps.flatMap { case (n, cap) =>
        (0 until n).map(i => if (cap == 0) 0
        else ((seed + i).toInt.abs % (cap + 1)))
      }
      val pairs = (0 until 60).map { p =>
        val m = if (p < 33) 5 else 7
        (fv(seed, 2 * p, m), fv(seed + 3, 2 * p + 1, m))
      }
      Gr(globalGain = 170, scalefacCompress = sfc,
        tableSelect = Seq(7, 10, 9), region0 = 8, region1 = 3,
        scalefacL = sf.take(21), count1Sel = (f % 2),
        bigPairs = pairs,
        quads = (0 until 6).map(q =>
          (fv(seed, q, 1), fv(seed, q + 7, 1), fv(seed, q + 13, 1),
            fv(seed, q + 19, 1))))
    }
    val grsSpec = (0 until 3).map(f => Seq(Seq(gr(f))))
    val dec = Mp3Pcm.decode(Mp3Fixtures.lsfContent(id)).get
    val want = refPcmMono(grsSpec, 22050, Array(0, 0, 0, 0))
    assertPcmClose(dec.pcm, want, "lsf")
  }

  test("MS stereo is the exact linear mid/side mix of the two mono " +
    "decodes (the whole post-requantize chain is linear)") {
    val grs = (0 until 3).map { f =>
      (0 until 2).map { g =>
        (0 until 2).map { c =>
          fixLongGr(2L * 13 + f * 4 + g * 2 + c, 165 + c, g)
        }
      }
    }
    val ms = Mp3Pcm.decode(Mp3Fixtures.stereoMs(2L)).get
    assert(ms.channels == 2)
    val mid = Mp3Pcm.decode(Mp3FramesWriter.stream(
      mpeg1 = true, brIdx = 11, stereo = false, modeExt = 0,
      grs = grs.map(_.map(gs => Seq(gs(0)))),
      mainDataBegin = Seq(0, 0, 0))).get
    val side = Mp3Pcm.decode(Mp3FramesWriter.stream(
      mpeg1 = true, brIdx = 11, stereo = false, modeExt = 0,
      grs = grs.map(_.map(gs => Seq(gs(1)))),
      mainDataBegin = Seq(0, 0, 0))).get
    val inv = 1.0 / math.sqrt(2.0)
    var worst = 0.0
    var i = 0
    while (i < mid.pcm.length) {
      val l = ms.pcm(2 * i).toDouble
      val r = ms.pcm(2 * i + 1).toDouble
      worst = math.max(worst,
        math.abs(l - (mid.pcm(i) + side.pcm(i)) * inv))
      worst = math.max(worst,
        math.abs(r - (mid.pcm(i) - side.pcm(i)) * inv))
      i += 1
    }
    assert(worst <= 2.0, s"MS linearity drift $worst LSB")
  }

  test("single spectral line: PCM equals the closed-form requantize " +
    "through the reference filterbank") {
    val gr = Gr(globalGain = 180, scalefacCompress = 0,
      tableSelect = Seq(7, 10, 9), region0 = 8, region1 = 3,
      bigPairs = Seq((3, 0)), quads = Seq.empty)
    val b = Mp3FramesWriter.stream(mpeg1 = true, brIdx = 9,
      stereo = false, modeExt = 0,
      grs = Seq(Seq(Seq(gr), Seq(gr.copy(bigPairs = Seq.empty)))),
      mainDataBegin = Seq(0))
    val dec = Mp3Pcm.decode(b).get
    // xr[0] = 3^(4/3) * 2^((180-210)/4) = 4.3267... * 2^-7.5
    val xr0 = math.pow(3, 4.0 / 3.0) * math.pow(2.0, -7.5)
    val chain = new RefChain(44100)
    val want = chain.granulePcm(gr, new Array[Int](22), lsf = false) ++
      chain.granulePcm(gr.copy(bigPairs = Seq.empty),
        new Array[Int](22), lsf = false)
    assertPcmClose(dec.pcm, want, "single-line")
    assert(math.abs(xr0 - 0.0239021356) < 1e-8) // the visible closed form
  }

  // ------------------------------------------------ validator stance

  test("validator stance: truncation, garbage, Layer II, free " +
    "format and an unshipped-table select all yield None, never a throw") {
    val good = Mp3Fixtures.mono1(7L)
    assert(Mp3Pcm.decode(good).isDefined)
    assert(Mp3Pcm.decode(good.take(good.length - 9)).isEmpty) // truncated
    assert(Mp3Pcm.decode(Array.fill[Byte](64)(0x55)).isEmpty)
    assert(Mp3Pcm.decode(null).isEmpty)
    assert(Mp3Pcm.decode(Array[Byte]()).isEmpty)
    val l2 = good.clone()
    l2(1) = (l2(1) & ~0x06 | 0x04).toByte // layer bits -> Layer II
    assert(Mp3Pcm.decode(l2).isEmpty)
    val free = good.clone()
    free(2) = (free(2) & 0x0f).toByte // bitrate index 0 = free format
    assert(Mp3Pcm.decode(free).isEmpty)
    // patch granule 0's table_select(0) (bit offset 52 inside the
    // 17-byte mono side info at byte 6) from 7 to 13 — an unshipped
    // table: the decode must refuse the whole file
    val patched = good.clone()
    setBits(patched, (4 + 0) * 8 + 9 + 5 + 4 + 12 + 9 + 8 + 4 + 1, 5, 13)
    assert(Mp3Pcm.decode(patched).isEmpty,
      "unshipped table select must reject")
  }

  private def setBits(b: Array[Byte], bitOff: Int, n: Int, v: Int): Unit = {
    var k = 0
    while (k < n) {
      val bit = (v >>> (n - 1 - k)) & 1
      val p = bitOff + k
      val mask = 1 << (7 - (p & 7))
      if (bit == 1) b(p >>> 3) = (b(p >>> 3) | mask).toByte
      else b(p >>> 3) = (b(p >>> 3) & ~mask).toByte
      k += 1
    }
  }

  test("MPEG-1 intensity stereo: bands above the right channel's " +
    "zero tail pan the raw left spectrum by tan(is_pos*pi/12), MS " +
    "stays below the intensity border — verified by superposition " +
    "(the whole post-requantize chain is linear)") {
    // left = low lines (0..39) + one isolated band-9 block (44..51);
    // right = the same low lines only, so the intensity bound rounds
    // up to the band-9 border (44.1 kHz sfb boundary 44)
    val lowPairs = (0 until 20).map(p => (fv(11L, 2 * p, 5), fv(12L, 2 * p + 1, 5)))
    val band9Vals = (0 until 4).map(p => (2 + p % 3, 1 + p % 2))
    // the band-9 block must sit at LINES 44..51 in both the combined
    // and the isolated stream, so superposition compares like lines
    val combined = lowPairs ++ Seq.fill(2)((0, 0)) ++ band9Vals
    val band9Pairs = Seq.fill(22)((0, 0)) ++ band9Vals
    def gr(pairs: Seq[(Int, Int)], sf9: Int): Gr =
      Gr(globalGain = 175, scalefacCompress = 15,
        tableSelect = Seq(7, 10, 9), region0 = 8, region1 = 3,
        scalefacL = (0 until 21).map(b => if (b == 9) sf9 else 0),
        bigPairs = pairs)
    val isPos = 2 // ratio = tan(pi/6): kl ~ 0.366, kr ~ 0.634
    val ratio = math.tan(isPos * math.Pi / 12.0)
    val (kl, kr) = (ratio / (1 + ratio), 1.0 / (1 + ratio))
    def mono(pairs: Seq[(Int, Int)]) = Mp3Pcm.decode(
      Mp3FramesWriter.stream(mpeg1 = true, brIdx = 9, stereo = false,
        modeExt = 0,
        grs = Seq(Seq(Seq(gr(pairs, 0)), Seq(gr(Seq.empty, 0)))),
        mainDataBegin = Seq(0))).get.pcm
    val low = mono(lowPairs)
    val b9 = mono(band9Pairs)
    // intensity-only stereo stream (mode_ext = 1): right carries the
    // is_pos in its band-9 scalefactor slot
    val st = Mp3Pcm.decode(Mp3FramesWriter.stream(
      mpeg1 = true, brIdx = 11, stereo = true, modeExt = 1,
      grs = Seq(Seq(
        Seq(gr(combined, 0), gr(lowPairs, isPos)),
        Seq(gr(Seq.empty, 0), gr(Seq.empty, isPos)))),
      mainDataBegin = Seq(0))).get
    assert(st.channels == 2)
    var worst = 0.0
    var i = 0
    while (i < low.length) {
      val l = st.pcm(2 * i).toDouble
      val r = st.pcm(2 * i + 1).toDouble
      worst = math.max(worst, math.abs(l - (low(i) + kl * b9(i))))
      worst = math.max(worst, math.abs(r - (low(i) + kr * b9(i))))
      i += 1
    }
    assert(worst <= 2.0, s"intensity superposition drift $worst LSB")
    // is_pos 7 is the ILLEGAL marker: the band must pass through
    // unpanned (left keeps the spectrum, right keeps its zeros)
    val st7 = Mp3Pcm.decode(Mp3FramesWriter.stream(
      mpeg1 = true, brIdx = 11, stereo = true, modeExt = 1,
      grs = Seq(Seq(
        Seq(gr(combined, 0), gr(lowPairs, 7)),
        Seq(gr(Seq.empty, 0), gr(Seq.empty, 7)))),
      mainDataBegin = Seq(0))).get
    var worst7 = 0.0
    i = 0
    while (i < low.length) {
      worst7 = math.max(worst7,
        math.abs(st7.pcm(2 * i).toDouble - (low(i) + b9(i))))
      worst7 = math.max(worst7,
        math.abs(st7.pcm(2 * i + 1).toDouble - low(i)))
      i += 1
    }
    assert(worst7 <= 2.0, s"illegal-position passthrough drift $worst7")
  }

  test("MPEG-2.5 at 8 kHz: the rate-extension header parses, the " +
    "spec's oddest band table drives requantize, and the reference " +
    "chain reproduces the PCM") {
    def gr(f: Int): Gr = {
      val seed = 21L + f
      // 8 kHz long bands: region0_count=8 ends at line 132, so 55
      // pairs (110 lines) all ride table 7
      Gr(globalGain = 172, scalefacCompress = 250,
        tableSelect = Seq(7, 10, 9), region0 = 8, region1 = 3,
        scalefacL = (0 until 21).map(b =>
          if (b < 6) (b + f) % 8 else if (b < 11) 0 else (b + f) % 4),
        bigPairs = (0 until 55).map(p =>
          (fv(seed, 2 * p, 5), fv(seed + 3, 2 * p + 1, 5))),
        quads = (0 until 5).map(q =>
          (fv(seed, q, 1), fv(seed, q + 7, 1), fv(seed, q + 13, 1),
            fv(seed, q + 19, 1))))
    }
    val grsSpec = (0 until 3).map(f => Seq(Seq(gr(f))))
    val b = Mp3FramesWriter.stream(mpeg1 = false, brIdx = 8,
      stereo = false, modeExt = 0, grs = grsSpec,
      mainDataBegin = Seq(0, 16, 24), v25rate8 = true)
    val (dec, st) = Mp3Pcm.decodeWithStats(b).get
    assert(st.sampleRate == 8000 && st.frames == 3 &&
      st.bitsExact == 3 && st.reservoirSilent == 0)
    val want = refPcmMono(grsSpec, 8000, Array(0, 0, 0, 0))
    assertPcmClose(dec.pcm, want, "v2.5-8kHz")
  }

  test("CRC-protected frames: the crc_check routine matches the " +
    "independently-computed pin vectors, a protected stream " +
    "round-trips to the same PCM as its unprotected twin, and one " +
    "flipped side-info bit fails the file") {
    // vectors computed outside the JVM (python, same spec definition)
    assert(Mp3Pcm.crc16(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8).iterator)
      == 0xcf5e)
    assert(Mp3Pcm.crc16("graft".getBytes("US-ASCII").iterator) == 0x0ed5)
    val gr = fixLongGr(9L, 170, 0)
    def mk(protect: Boolean) = Mp3FramesWriter.stream(
      mpeg1 = true, brIdx = 9, stereo = false, modeExt = 0,
      grs = Seq(Seq(Seq(gr), Seq(gr.copy(count1Sel = 1)))),
      mainDataBegin = Seq(0), protect = protect)
    val plain = Mp3Pcm.decode(mk(false)).get
    val prot = Mp3Pcm.decode(mk(true)).get
    assert(java.util.Arrays.equals(plain.pcm, prot.pcm),
      "CRC framing must not change the decode")
    // corrupt one side-info bit: the CRC now disagrees -> None
    val bad = mk(true)
    bad(8) = (bad(8) ^ 0x10).toByte // inside side info (after 4+2 crc)
    assert(Mp3Pcm.decode(bad).isEmpty, "CRC mismatch must fail the file")
    // and corrupting the STORED crc itself also fails
    val bad2 = mk(true)
    bad2(4) = (bad2(4) ^ 0x01).toByte
    assert(Mp3Pcm.decode(bad2).isEmpty)
  }

  test("LSF n2-range mixed block: scalefactor routing is flat across " +
    "the {15,18} partitions (first 6 long, rest short from sfb 3) — " +
    "the reference chain consumes the FIELD values, so a partition-" +
    "aligned misroute would shift the requantize exponents and break " +
    "the PCM pin") {
    // scalefac_compress = 505 -> n2 row: slen {1,2,0,0}, mixed
    // partitions {15,18,0,0}. Partition 0 CROSSES the 6-band
    // long/short seam: values 0-5 are long sfb 0-5, values 6-14 are
    // short slots sfb3..5 x 3 windows, partition 1 fills sfb6..11.
    def gr(f: Int): Gr = {
      val seed = 31L + f
      Gr(globalGain = 172, scalefacCompress = 505, blockType = 2,
        mixedBlock = true, tableSelect = Seq(7, 10, 0),
        subblockGain = Seq(0, 1, 0),
        scalefacL = (0 until 21).map(b => if (b < 6) (b + f) % 2 else 0),
        scalefacS = (0 until 13).map(s => (0 until 3).map { w =>
          if (s < 3 || s > 11) 0
          else if (s < 6) (s + w + f) % 2 // partition 0 tail, 1 bit
          else (s + w + f) % 4 // partition 1, 2 bits
        }),
        // region boundary under window switching at LSF rates is
        // sfbLong(8) = 54 (not 36): lines 0..53 ride tableSelect(0)
        bigPairs = (0 until 54).map { p =>
          val m = if (2 * p < 54) 5 else 7
          (fv(seed, 2 * p, m), fv(seed + 4, 2 * p + 1, m))
        },
        quads = (0 until 4).map(q =>
          (fv(seed, q, 1), fv(seed, q + 5, 1), fv(seed, q + 9, 1),
            fv(seed, q + 13, 1))))
    }
    val grsSpec = (0 until 2).map(f => Seq(Seq(gr(f))))
    val b = Mp3FramesWriter.stream(mpeg1 = false, brIdx = 8,
      stereo = false, modeExt = 0, grs = grsSpec,
      mainDataBegin = Seq(0, 0))
    val (dec, st) = Mp3Pcm.decodeWithStats(b).get
    assert(st.bitsExact == 2, "n2 mixed granules must stay bit-exact")
    val want = refPcmMono(grsSpec, 22050, Array(0, 0, 0, 0))
    assertPcmClose(dec.pcm, want, "lsf-n2-mixed")
  }

  test("window-switching big-values boundary: start/stop blocks use " +
    "sfbLong(8) (54 at LSF rates, 36 at MPEG-1 rates; 72 for pure " +
    "short at 8 kHz), pinned structurally and by a bit-exact LSF " +
    "start/stop decode with content straddling lines 36..53") {
    // structural: the spec-derived implicit region0_count (2.4.2.7)
    assert(Mp3Pcm.wsRegion1Start(1, mixed = false, 44100) == 36)
    assert(Mp3Pcm.wsRegion1Start(3, mixed = false, 44100) == 36)
    assert(Mp3Pcm.wsRegion1Start(1, mixed = false, 22050) == 54)
    assert(Mp3Pcm.wsRegion1Start(3, mixed = false, 22050) == 54)
    assert(Mp3Pcm.wsRegion1Start(2, mixed = true, 22050) == 54)
    assert(Mp3Pcm.wsRegion1Start(2, mixed = false, 22050) == 36)
    assert(Mp3Pcm.wsRegion1Start(2, mixed = false, 8000) == 72)
    // behavioral: an LSF start (1) then stop (3) block whose lines
    // 36..53 carry values; the writer codes them with tableSelect(0)
    // under the 54 boundary, and the decoder must re-walk the exact
    // same split or the part2_3 accounting rejects the granule
    def gr(f: Int): Gr = {
      val seed = 41L + f
      Gr(globalGain = 170, scalefacCompress = 250,
        blockType = if (f == 0) 1 else 3,
        tableSelect = Seq(7, 10, 0),
        scalefacL = (0 until 21).map(b =>
          if (b < 6) (b + f) % 8 else if (b < 11) 0 else (b + f) % 4),
        bigPairs = (0 until 60).map { p =>
          val m = if (2 * p < 54) 5 else 7
          (fv(seed, 2 * p, m), fv(seed + 5, 2 * p + 1, m))
        },
        quads = (0 until 4).map(q =>
          (fv(seed, q, 1), fv(seed, q + 5, 1), fv(seed, q + 9, 1),
            fv(seed, q + 13, 1))))
    }
    val grsSpec = (0 until 2).map(f => Seq(Seq(gr(f))))
    val b = Mp3FramesWriter.stream(mpeg1 = false, brIdx = 8,
      stereo = false, modeExt = 0, grs = grsSpec,
      mainDataBegin = Seq(0, 0))
    val (dec, st) = Mp3Pcm.decodeWithStats(b).get
    assert(st.bitsExact == 2, "start/stop granules must stay bit-exact")
    val want = refPcmMono(grsSpec, 22050, Array(0, 0, 0, 0))
    assertPcmClose(dec.pcm, want, "lsf-startstop")
  }

  test("short-block intensity stereo: per-window bounds over the " +
    "short bands pan the raw left spectrum by scalefacS is_pos — " +
    "verified by superposition, with is_pos 7 passing through " +
    "unpanned") {
    // 44.1 kHz pure short. Left = bands 0..2 in all windows (lines
    // 0..35, shared with the right channel) + one isolated block in
    // band 9 WINDOW 1 (huffman lines 3*66+18 .. +17 = 216..233).
    // Right carries only the low bands, so every window's intensity
    // bound lands at band 3 and band 9 w1 pans by ITS window's is_pos.
    val lowPairs = (0 until 18).map(p =>
      (fv(51L, 2 * p, 5), fv(52L, 2 * p + 1, 5)))
    val b9Vals = (0 until 9).map(p => (2 + p % 3, 1 + p % 2))
    val combined = lowPairs ++ Seq.fill(90)((0, 0)) ++ b9Vals
    val b9Pairs = Seq.fill(108)((0, 0)) ++ b9Vals
    def gr(pairs: Seq[(Int, Int)], isPos9w1: Int): Gr =
      Gr(globalGain = 175, scalefacCompress = 15, blockType = 2,
        tableSelect = Seq(7, 10, 0), subblockGain = Seq(0, 1, 0),
        scalefacS = (0 until 13).map(s => (0 until 3).map(w =>
          if (s == 9 && w == 1) isPos9w1 else 0)),
        bigPairs = pairs)
    def mono(pairs: Seq[(Int, Int)]) = Mp3Pcm.decode(
      Mp3FramesWriter.stream(mpeg1 = true, brIdx = 9, stereo = false,
        modeExt = 0,
        grs = Seq(Seq(Seq(gr(pairs, 0)), Seq(gr(Seq.empty, 0)))),
        mainDataBegin = Seq(0))).get.pcm
    val low = mono(lowPairs)
    val b9 = mono(b9Pairs)
    val isPos = 2
    val ratio = math.tan(isPos * math.Pi / 12.0)
    val (kl, kr) = (ratio / (1 + ratio), 1.0 / (1 + ratio))
    def stereoPcm(pos: Int) = Mp3Pcm.decode(Mp3FramesWriter.stream(
      mpeg1 = true, brIdx = 11, stereo = true, modeExt = 1,
      grs = Seq(Seq(
        Seq(gr(combined, 0), gr(lowPairs, pos)),
        Seq(gr(Seq.empty, 0), gr(Seq.empty, pos)))),
      mainDataBegin = Seq(0))).get
    val st = stereoPcm(isPos)
    assert(st.channels == 2)
    var worst = 0.0
    var i = 0
    while (i < low.length) {
      val l = st.pcm(2 * i).toDouble
      val r = st.pcm(2 * i + 1).toDouble
      worst = math.max(worst, math.abs(l - (low(i) + kl * b9(i))))
      worst = math.max(worst, math.abs(r - (low(i) + kr * b9(i))))
      i += 1
    }
    assert(worst <= 2.0, s"short intensity superposition drift $worst")
    // illegal marker: band passes through on the left, right stays 0
    val st7 = stereoPcm(7)
    var worst7 = 0.0
    i = 0
    while (i < low.length) {
      worst7 = math.max(worst7,
        math.abs(st7.pcm(2 * i).toDouble - (low(i) + b9(i))))
      worst7 = math.max(worst7,
        math.abs(st7.pcm(2 * i + 1).toDouble - low(i)))
      i += 1
    }
    assert(worst7 <= 2.0, s"short illegal-position drift $worst7")
  }

  test("mixed-block intensity: a right channel that is zero through " +
    "the whole short region extends the intensity region into the " +
    "long head, panned by the long-band is_pos") {
    // left = content in the long head only (lines 0..35); right =
    // silent. allShortZero -> every short band pans (over zeros) and
    // the long bands 0..5 pan by scalefacL is_pos.
    val headPairs = (0 until 18).map(p =>
      (fv(61L, 2 * p, 5), fv(62L, 2 * p + 1, 5)))
    val isPos = 4
    def gr(pairs: Seq[(Int, Int)], pos: Int): Gr =
      Gr(globalGain = 175, scalefacCompress = 15, blockType = 2,
        mixedBlock = true, tableSelect = Seq(7, 10, 0),
        // the MPEG-1 mixed long head spans 8 bands (sfbL(8) = 36 at
        // 44.1 kHz) — all of them carry the same is_pos here so the
        // whole head pans by one (kl, kr)
        scalefacL = (0 until 21).map(b => if (b < 8) pos else 0),
        bigPairs = pairs)
    val leftMono = Mp3Pcm.decode(
      Mp3FramesWriter.stream(mpeg1 = true, brIdx = 9, stereo = false,
        modeExt = 0,
        grs = Seq(Seq(Seq(gr(headPairs, 0)), Seq(gr(Seq.empty, 0)))),
        mainDataBegin = Seq(0))).get.pcm
    val st = Mp3Pcm.decode(Mp3FramesWriter.stream(
      mpeg1 = true, brIdx = 11, stereo = true, modeExt = 1,
      grs = Seq(Seq(
        Seq(gr(headPairs, 0), gr(Seq.empty, isPos)),
        Seq(gr(Seq.empty, 0), gr(Seq.empty, isPos)))),
      mainDataBegin = Seq(0))).get
    val ratio = math.tan(isPos * math.Pi / 12.0)
    val (kl, kr) = (ratio / (1 + ratio), 1.0 / (1 + ratio))
    var worst = 0.0
    var i = 0
    while (i < leftMono.length) {
      worst = math.max(worst,
        math.abs(st.pcm(2 * i).toDouble - kl * leftMono(i)))
      worst = math.max(worst,
        math.abs(st.pcm(2 * i + 1).toDouble - kr * leftMono(i)))
      i += 1
    }
    assert(worst <= 2.0, s"mixed long-head intensity drift $worst")
  }

  test("MPEG-2.5 8 kHz mixed blocks are rejected, never decoded " +
    "wrong: no short-band boundary falls on the 36-line mixed seam " +
    "there (3*sfbS(3) = 72)") {
    def gr(mixed: Boolean): Gr =
      Gr(globalGain = 170, scalefacCompress = 250, blockType = 2,
        mixedBlock = mixed, tableSelect = Seq(7, 10, 0),
        bigPairs = (0 until 18).map(p =>
          (fv(71L, 2 * p, 5), fv(72L, 2 * p + 1, 5))))
    def stream(mixed: Boolean) = Mp3FramesWriter.stream(
      mpeg1 = false, brIdx = 8, stereo = false, modeExt = 0,
      grs = Seq(Seq(Seq(gr(mixed)))), mainDataBegin = Seq(0),
      v25rate8 = true)
    assert(Mp3Pcm.decode(stream(mixed = true)).isEmpty,
      "8 kHz mixed must reject")
    assert(Mp3Pcm.decode(stream(mixed = false)).isDefined,
      "8 kHz pure short must still decode")
  }

  test("coverage triage: per-granule table census matches the " +
    "fixture constructions, counts unshipped selections only in USED " +
    "regions, and agrees with the decoder's reject boundary") {
    def cov(id: Long) = Mp3Pcm.coverage(Mp3Fixtures.mp3CoverageMediaFor(id)).get
    // all-shipped conformance fixtures: everything decodable
    val expected = Seq(
      (0L, 45, 45, 45, 0, 0, 0, 0),
      (1L, 4, 8, 8, 0, 0, 0, 0),
      (2L, 3, 12, 12, 0, 0, 0, 0),
      (3L, 3, 6, 6, 0, 0, 0, 0),
      (4L, 3, 3, 3, 0, 0, 0, 0),
      (5L, 2, 4, 2, 1, 1, 1, 0),
      (6L, 2, 4, 2, 0, 0, 0, 2),
      (7L, 3, 3, 1, 0, 1, 1, 0))
    expected.foreach { case (id, fr, g, sh, a, b, c, i) =>
      val cv = cov(id)
      assert(cv == Mp3Pcm.Coverage(fr, g, sh, a, b, c, i), s"id $id: $cv")
    }
    // the triage fixtures are exactly the decoder's reject set: files
    // whose every granule is shipped decode, the others return None
    (0L to 7L).foreach { id =>
      val decodes = Mp3Pcm.decode(Mp3Fixtures.mp3CoverageMediaFor(id)).isDefined
      val cv = cov(id)
      val allShipped = cv.shipped == cv.granuleChannels
      assert(decodes == allShipped, s"id $id: decode=$decodes cov=$cv")
    }
  }

  test("decode is deterministic and the wav bridge carries the exact " +
    "PCM (stats match the wav header fields)") {
    (0L to 4L).foreach { id =>
      val b = Mp3Fixtures.mp3MediaFor(id)
      val d1 = Mp3Pcm.decode(b).get
      val d2 = Mp3Pcm.decode(b).get
      assert(java.util.Arrays.equals(d1.pcm, d2.pcm), s"id $id")
      val wav = graft.functions.Mp3Wav.compute(b)
      assert(wav != null)
      val dec = WavPcm.decode(wav).get
      assert(dec.sampleRate == d1.sampleRate && dec.channels == d1.channels)
      assert(java.util.Arrays.equals(dec.samples, d1.pcm), s"id $id wav")
    }
  }
}
