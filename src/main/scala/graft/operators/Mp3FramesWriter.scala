package graft.operators

import graft.functions.Mp3Tables

/** Spec-valid Layer III FRAME WRITER for the conformance fixtures:
  * packs chosen side info, scalefactors and Huffman-coded spectra
  * into real MPEG-1 / MPEG-2(LSF) frames — the only way to produce
  * content-bearing MP3 bitstreams in this container (no encoder
  * exists on the box; the one foreign file, gsutil's LAME encode, is
  * digital silence). It is NOT an encoder: no psychoacoustics, no
  * rate control — the caller picks every field and the writer just
  * serializes them per ISO 11172-3 §2.4.1.7/2.4.2.7.
  *
  * Decode round-trips of these streams pin the bit-accounting,
  * reservoir positioning, scalefactor layouts and Huffman LUT
  * construction of [[Mp3Pcm]] end to end; what they can NOT pin is
  * the transcription of the spec tables themselves (writer and
  * decoder share [[Mp3Tables]]) — FIXTURES.md states that residual
  * honestly. */
object Mp3FramesWriter {

  final class BitW {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    var bits = 0
    def put(v: Int, n: Int): Unit = {
      require(n >= 0 && n <= 24 && (n == 24 || (v >>> n) == 0),
        s"put($v, $n)")
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >>> k) & 1)
        nAcc += 1
        if (nAcc == 8) { buf.write(acc); acc = 0; nAcc = 0 }
        k -= 1
      }
      bits += n
    }
    def toBytes: Array[Byte] = {
      val out = buf.toByteArray
      if (nAcc == 0) out
      else out :+ ((acc << (8 - nAcc)) & 0xff).toByte
    }
  }

  /** One granule-channel's worth of user-chosen fields. */
  final case class Gr(
      globalGain: Int,
      scalefacCompress: Int,
      blockType: Int = 0, // 0 long, 2 short (windowSwitching set)
      mixedBlock: Boolean = false,
      tableSelect: Seq[Int] = Seq(7, 10, 9),
      subblockGain: Seq[Int] = Seq(0, 0, 0),
      region0: Int = 8, region1: Int = 3,
      preflag: Int = 0, scalefacScale: Int = 0, count1Sel: Int = 0,
      scalefacL: Seq[Int] = Seq.fill(21)(0),
      scalefacS: Seq[Seq[Int]] = Seq.fill(13)(Seq(0, 0, 0)),
      bigPairs: Seq[(Int, Int)] = Seq.empty, // signed (x, y) pairs
      quads: Seq[(Int, Int, Int, Int)] = Seq.empty, // signed 0/±1
      // triage-only: claim this many big-value pairs in the side info
      // WITHOUT emitting their codes — produces a granule that
      // SELECTS its tableSelect ids (for mp3_coverage fixtures of the
      // unshipped families) while being deliberately undecodable.
      // Must stay 0 (and bigPairs empty when set) for decodable
      // fixtures: part2_3_length will not account for the claimed
      // pairs.
      rawBigValues: Int = 0)

  private def huffCode(tab: Int, x: Int, y: Int): (Int, Int) = {
    val (xl, yl, packed) = Mp3Tables.Huff(tab)
    require(x < xl && y < yl, s"t$tab has no ($x,$y)")
    val e = packed(x * yl + y)
    (e & 0xffff, e >>> 16)
  }

  /** Serialize one granule-channel's main data; returns its bit count
    * (= part2_3_length) after writing into `w`. MPEG-1 layout. */
  private def writeGranuleData(
      w: BitW, gr: Gr, lsf: Boolean, rate: Int,
      scfsiCopy: Array[Boolean]): Int = {
    val start = w.bits
    // --- scalefactors
    if (lsf) {
      // non-intensity LSF: partitions by scalefac_compress range
      val sfc = gr.scalefacCompress
      val (slen, rowKey) =
        if (sfc < 400)
          (Array((sfc >> 4) / 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3), "n0")
        else if (sfc < 500) {
          val s = sfc - 400
          (Array((s >> 2) / 5, (s >> 2) % 5, s & 3, 0), "n1")
        } else {
          val s = sfc - 500
          (Array(s / 3, s % 3, 0, 0), "n2")
        }
      val (nrN, nrS, nrM) = Mp3Tables.LsfNrOfSfb(rowKey)
      val nr =
        if (gr.blockType == 2) (if (gr.mixedBlock) nrM else nrS) else nrN
      var p = 0
      var longB = 0
      var slot = if (gr.blockType == 2 && !gr.mixedBlock) 0 else 9
      while (p < 4) {
        var k = 0
        while (k < nr(p)) {
          val v =
            if (gr.blockType == 2 && !gr.mixedBlock) {
              val x = gr.scalefacS(slot / 3)(slot % 3); slot += 1; x
            } else if (gr.blockType == 2 && gr.mixedBlock) {
              // flat counter, NOT "partition 0 == long": the n2 row's
              // mixed partitions {15,18,0,0} cross the 6-band
              // long/short boundary (mirrors Mp3Pcm.readScalefacLsf)
              if (longB < 6) { val x = gr.scalefacL(longB); longB += 1; x }
              else { val x = gr.scalefacS(slot / 3)(slot % 3); slot += 1; x }
            } else { val x = gr.scalefacL(longB); longB += 1; x }
          require(slen(p) == 0 || (v >>> slen(p)) == 0,
            s"scalefac $v too wide for slen ${slen(p)}")
          if (slen(p) > 0) w.put(v, slen(p))
          else require(v == 0, "nonzero scalefac with slen 0")
          k += 1
        }
        p += 1
      }
    } else if (gr.blockType == 2) {
      val s1 = Mp3Tables.Slen1(gr.scalefacCompress)
      val s2 = Mp3Tables.Slen2(gr.scalefacCompress)
      if (gr.mixedBlock) {
        var b = 0
        while (b < 8) { if (s1 > 0) w.put(gr.scalefacL(b), s1); b += 1 }
        var s = 3
        while (s < 12) {
          val len = if (s < 6) s1 else s2
          var ww = 0
          while (ww < 3) {
            if (len > 0) w.put(gr.scalefacS(s)(ww), len); ww += 1
          }
          s += 1
        }
      } else {
        var s = 0
        while (s < 12) {
          val len = if (s < 6) s1 else s2
          var ww = 0
          while (ww < 3) {
            if (len > 0) w.put(gr.scalefacS(s)(ww), len); ww += 1
          }
          s += 1
        }
      }
    } else {
      val s1 = Mp3Tables.Slen1(gr.scalefacCompress)
      val s2 = Mp3Tables.Slen2(gr.scalefacCompress)
      var b = 0
      while (b < 21) {
        val group = if (b < 6) 0 else if (b < 11) 1 else if (b < 16) 2 else 3
        val len = if (b < 11) s1 else s2
        if (!scfsiCopy(group) && len > 0) w.put(gr.scalefacL(b), len)
        b += 1
      }
    }
    // --- big values (region split mirrors the decoder)
    val windowSwitching = gr.blockType != 0
    val wsR1 = Mp3Pcm.wsRegion1Start(gr.blockType, gr.mixedBlock, rate)
    var i = 0
    gr.bigPairs.foreach { case (sx, sy) =>
      val region =
        if (windowSwitching) (if (i < wsR1) 0 else 1)
        else regionOf(i, gr, rate)
      val tab = gr.tableSelect(region)
      val ax = math.abs(sx); val ay = math.abs(sy)
      val (code, len) = huffCode(tab, ax, ay)
      w.put(code, len)
      if (ax != 0) w.put(if (sx < 0) 1 else 0, 1)
      if (ay != 0) w.put(if (sy < 0) 1 else 0, 1)
      i += 2
    }
    // --- count1 quadruples
    gr.quads.foreach { case (v0, v1, v2, v3) =>
      val vs = Array(v0, v1, v2, v3)
      val idx = vs.map(v => if (v != 0) 1 else 0)
        .foldLeft(0)((a, b) => (a << 1) | b)
      val packed =
        if (gr.count1Sel == 0) Mp3Tables.Count1A(idx)
        else Mp3Tables.Count1B(idx)
      w.put(packed & 0xffff, packed >>> 16)
      vs.foreach(v => if (v != 0) w.put(if (v < 0) 1 else 0, 1))
    }
    w.bits - start
  }

  /** The decoder's region boundaries at the stream's sample rate. */
  private def regionOf(line: Int, gr: Gr, rate: Int): Int = {
    val sfb = Mp3Tables.SfbLong(rate)
    val r1 = sfb(math.min(gr.region0 + 1, 22))
    val r2 = sfb(math.min(gr.region0 + 1 + gr.region1 + 1, 22))
    if (line < r1) 0 else if (line < r2) 1 else 2
  }

  /** Assemble a whole MPEG-1 (44.1 kHz) or LSF (22.05 kHz) stream from
    * per-frame granule matrices. `grs(f)(g)(c)`; MPEG-1 takes 2
    * granules, LSF 1. `mainDataBegin(f)` places frame f's granule
    * block that many bytes before its own slot (0 = aligned), letting
    * fixtures exercise the bit reservoir; the writer verifies the
    * placement fits the preceding stuffing. `scfsi(c)(band)` shares
    * granule-0 long scalefactors into granule 1 (MPEG-1 only). */
  def stream(
      mpeg1: Boolean,
      brIdx: Int,
      stereo: Boolean,
      modeExt: Int,
      grs: Seq[Seq[Seq[Gr]]],
      mainDataBegin: Seq[Int],
      scfsi: Array[Array[Int]] = null,
      protect: Boolean = false,
      v25rate8: Boolean = false): Array[Byte] = {
    // v25rate8 selects MPEG-2.5 at 8 kHz (version bits 00, sr index
    // 2) — the LSF machinery is identical, but the 8 kHz band table
    // is the spec's oddest (w=12 low bands, 2-line top bands)
    require(!v25rate8 || !mpeg1, "v25rate8 implies an LSF stream")
    val rate = if (mpeg1) 44100 else if (v25rate8) 8000 else 22050
    val kbps = (if (mpeg1)
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    else
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))(brIdx)
    val nCh = if (stereo) 2 else 1
    val nGr = if (mpeg1) 2 else 1
    val sideLen =
      if (mpeg1) (if (nCh == 1) 17 else 32)
      else (if (nCh == 1) 9 else 17)
    val scfsiA =
      if (scfsi != null) scfsi else Array.fill(nCh)(Array(0, 0, 0, 0))

    // 1. render every frame's granule block (bit-contiguous, padded
    //    to a byte), remembering each granule's part2_3_length
    val blocks = new Array[Array[Byte]](grs.length)
    val part23 = Array.ofDim[Int](grs.length, nGr, nCh)
    var f = 0
    while (f < grs.length) {
      val w = new BitW
      var g = 0
      while (g < nGr) {
        var c = 0
        while (c < nCh) {
          val copy = new Array[Boolean](4)
          if (g == 1 && grs(f)(g)(c).blockType == 0) {
            var k = 0
            while (k < 4) { copy(k) = scfsiA(c)(k) == 1; k += 1 }
          }
          part23(f)(g)(c) =
            writeGranuleData(w, grs(f)(g)(c), !mpeg1, rate, copy)
          c += 1
        }
        g += 1
      }
      blocks(f) = w.toBytes
      f += 1
    }

    // 2. lay the main-data stream out: block f must start exactly
    //    main_data_begin(f) bytes before frame f's slot begins, so
    //    stuffing zeros go BETWEEN blocks (they are part of frame
    //    f-1's main data per 2.4.2.7)
    val crcLen = if (protect) 2 else 0
    val frameLen = (if (mpeg1) 144000 * kbps / rate else 72000 * kbps / rate)
    val slot = frameLen - 4 - crcLen - sideLen
    val combined = new java.io.ByteArrayOutputStream()
    f = 0
    while (f < grs.length) {
      val desiredStart = f * slot - mainDataBegin(f)
      require(desiredStart >= combined.size(),
        s"frame $f: main_data_begin ${mainDataBegin(f)} would overlap " +
          s"the previous block (stream at ${combined.size()}, " +
          s"slot start ${f * slot})")
      while (combined.size() < desiredStart) combined.write(0)
      combined.write(blocks(f))
      f += 1
    }
    require(combined.size() <= grs.length * slot,
      s"main data ${combined.size()} overruns the ${grs.length * slot} " +
        "slot bytes — raise brIdx")
    while (combined.size() < grs.length * slot) combined.write(0)
    val md = combined.toByteArray

    // 3. frame assembly
    val out = new java.io.ByteArrayOutputStream()
    f = 0
    while (f < grs.length) {
      val mdb = mainDataBegin(f)
      // header (protection_bit = 1 means NO crc)
      val hdr2 = (brIdx << 4) | ((if (v25rate8) 2 else 0) << 2) |
        (0 << 1) // no padding
      val hdr3 = (if (stereo) (if (modeExt > 0) 1 else 0) else 3) << 6 |
        (modeExt << 4)
      out.write(0xff)
      out.write((0xe0 |
        ((if (mpeg1) 3 else if (v25rate8) 0 else 2) << 3) | (1 << 1) |
        (if (protect) 0 else 1)))
      out.write(hdr2)
      out.write(hdr3)
      // side info
      val si = new BitW
      si.put(mdb, if (mpeg1) 9 else 8)
      si.put(0, if (mpeg1) (if (nCh == 1) 5 else 3)
      else (if (nCh == 1) 1 else 2))
      if (mpeg1) {
        var c = 0
        while (c < nCh) {
          var k = 0
          while (k < 4) { si.put(scfsiA(c)(k), 1); k += 1 }
          c += 1
        }
      }
      var g = 0
      while (g < nGr) {
        var c = 0
        while (c < nCh) {
          val gr = grs(f)(g)(c)
          si.put(part23(f)(g)(c), 12)
          si.put(math.max(gr.bigPairs.length, gr.rawBigValues), 9)
          si.put(gr.globalGain, 8)
          si.put(gr.scalefacCompress, if (mpeg1) 4 else 9)
          if (gr.blockType != 0) {
            si.put(1, 1) // window switching
            si.put(gr.blockType, 2)
            si.put(if (gr.mixedBlock) 1 else 0, 1)
            si.put(huffIdOrZero(gr.tableSelect(0)), 5)
            si.put(huffIdOrZero(gr.tableSelect(1)), 5)
            si.put(gr.subblockGain(0), 3)
            si.put(gr.subblockGain(1), 3)
            si.put(gr.subblockGain(2), 3)
          } else {
            si.put(0, 1)
            si.put(huffIdOrZero(gr.tableSelect(0)), 5)
            si.put(huffIdOrZero(gr.tableSelect(1)), 5)
            si.put(huffIdOrZero(gr.tableSelect(2)), 5)
            si.put(gr.region0, 4)
            si.put(gr.region1, 3)
          }
          if (mpeg1) si.put(gr.preflag, 1)
          si.put(gr.scalefacScale, 1)
          si.put(gr.count1Sel, 1)
          c += 1
        }
        g += 1
      }
      val siBytes = si.toBytes
      require(siBytes.length == sideLen, s"side info ${siBytes.length}")
      if (protect) {
        // crc_check protects header bytes 2-3 + the side info (2.4.3.1)
        val crc = Mp3Pcm.crc16(
          Iterator(hdr2.toByte, hdr3.toByte) ++ siBytes.iterator)
        out.write((crc >> 8) & 0xff)
        out.write(crc & 0xff)
      }
      out.write(siBytes)
      out.write(md, f * slot, slot)
      f += 1
    }
    out.toByteArray
  }

  private def huffIdOrZero(t: Int): Int = t
}
