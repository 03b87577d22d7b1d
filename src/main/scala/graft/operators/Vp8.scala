package graft.operators

import graft.functions.Vp8Tables

/** VP8 lossy INTRA-frame (keyframe) decoder — RFC 6386, from scratch.
  *
  * Completes WebP end-to-end next to [[Webp]]'s VP8L path: boolean
  * entropy decoder (§7), keyframe header + per-macroblock mode parse
  * (§9–§11), token/residue decode over the coefficient probability
  * model (§13), dequantization (§14.1), inverse WHT/DCT (§14.3–.4),
  * intra prediction (§12), and the full normal/simple loop filter
  * (§15). Constant tables live in [[Vp8Tables]] (mechanically
  * transcribed spec constants).
  *
  * VP8 decode is bit-exact by construction — every conformant decoder
  * reproduces the reference decoder's output planes byte-for-byte —
  * so the conformance bar here is exact equality of Y/U/V planes
  * against system libwebp's decode of real libwebp-encoded files
  * (ExternalFixturesSpec), not a PSNR hand-wave.
  *
  * Inter frames (r12): full §16-§18 support behind [[decodeSequence]]
  * / [[Vp8Inter.decodeIvf]] — reference buffers (last/golden/altref
  * with refresh/copy/sign-bias plumbing), persistent entropy context,
  * the near-MV survey and contextual mv_ref coding, NEW/SPLIT motion
  * vectors, and two-pass 6-tap / bilinear sub-pixel motion
  * compensation. The single-frame WebP path ([[decodeFrame]]) remains
  * keyframe-only by the container's own rule. Inter conformance is
  * self-pinned (writer + independent MC spec-math + linearity — see
  * [[Vp8Inter]]'s scaladoc for what stays externally unpinned until a
  * libvpx encode exists).
  *
  * Conformance coverage note: the external fixtures pin single-token-
  * partition streams with segmentation (libwebp's default segments=4)
  * — libwebp's encoder never emits >1 token partition (its
  * `partitions` config field is documented as unused, verified
  * empirically against 1.2.4), so the multi-partition path here
  * (sizes table parse + per-MB-row partition selection, §9.5) is
  * spec-implemented but externally unpinned until a libvpx-encoded
  * sample is available.
  *
  * Output is the YUV 4:2:0 planes cropped to the frame size; RGB
  * conversion policy belongs to the caller ([[Webp.decodeRgba]] uses
  * the JFIF-style integer transform shared with [[JpegDc]] users).
  */
object Vp8 {

  final case class Yuv(width: Int, height: Int,
      y: Array[Byte], u: Array[Byte], v: Array[Byte])

  /** §7: the boolean arithmetic decoder. Reads zeros past the end
    * (a truncated stream decodes deterministically — callers bound
    * trust elsewhere). */
  private[operators] final class Bool(b: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = 0
    private var shift = 0 // bits consumed of the current byte window
    private var pos = start
    // prime with two bytes
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int =
      if (pos < end) { val v = b(pos) & 0xff; pos += 1; v } else 0

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      val ret = if (value >= bigSplit) {
        range -= split; value -= bigSplit; 1
      } else { range = split; 0 }
      while (range < 128) {
        value <<= 1; range <<= 1; shift += 1
        if (shift == 8) { shift = 0; value |= nextByte() }
      }
      ret
    }

    def literal(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** Flag-gated signed literal: RFC's `L(n)` + sign. */
    def signedLiteralIf(n: Int): Int =
      if (bool(128) == 0) 0
      else { val v = literal(n); if (bool(128) == 1) -v else v }

    /** Generic tree read (§8.2): negative entries are leaves. */
    def tree(t: Array[Int], probs: Array[Int], probOff: Int): Int = {
      var i = 0
      while (true) {
        i = t(i + bool(probs(probOff + (i >> 1))))
        if (i <= 0) return -i
      }
      0
    }
  }

  // ---- fixed trees (§11, §13.2; leaves stored negated) -------------
  // 16x16 modes: DC=0 V=1 H=2 TM=3 B_PRED=4
  private val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProbs = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProbs = Array(142, 114, 183)
  // 4x4 modes: DC=0 TM=1 VE=2 HE=3 RD=4 VR=5 LD=6 VL=7 HD=8 HU=9
  private[operators] val BModeTree = Array(
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9)
  private[operators] val SegmentTree = Array(2, 4, -0, -1, -2, -3)
  // tokens: 0..4 literal, 5..10 categories, 11 EOB
  private val TokenTree = Array(
    -11, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4, 14, 16, -5, -6,
    18, 20, -7, -8, -9, -10)
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val Bands =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private val Zigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clampQ(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v
  private def clampS(v: Int): Int = // signed-char clamp for the filters
    if (v < -128) -128 else if (v > 127) 127 else v

  /** One padded plane: row -1 = 127, col -1 = 129 (§12.2), plus a
    * 4-px right extension for B_PRED above-right reads. */
  private final class Plane(val w: Int, val h: Int) {
    val stride: Int = w + 1 + 4
    val buf = new Array[Byte]((h + 1) * stride)
    java.util.Arrays.fill(buf, 0, stride, 127.toByte) // row -1
    var r = 1
    while (r <= h) { buf(r * stride) = 129.toByte; r += 1 } // col -1
    @inline def get(x: Int, y: Int): Int =
      buf((y + 1) * stride + (x + 1)) & 0xff
    @inline def set(x: Int, y: Int, v: Int): Unit =
      buf((y + 1) * stride + (x + 1)) = v.toByte
    /** Replicate the right edge into the extension (called per
      * finished pixel row so above-right reads past the frame see the
      * edge pixel — row -1 is already 127 everywhere). */
    def extendRight(y: Int): Unit = {
      val edge = get(w - 1, y)
      var i = 0
      while (i < 4) { set(w + i, y, edge); i += 1 }
    }
  }

  private final class MbInfo {
    var segment = 0
    var skip = false // the coded mb_skip_coeff flag
    var yMode = 0 // intra 0-4; inter modes Vp8Inter.ModeNearest..Split
    var uvMode = 0
    val bModes = new Array[Int](16)
    var hasCoeffs = false // any nonzero coefficient actually decoded
    var filterLevel = 0
    // inter fields (r12): 0 intra, 1 last, 2 golden, 3 altref
    var refFrame = 0
    var mvPacked = 0 // eighth-pel (row << 16 | col), Vp8Inter packing
    val bMvs = new Array[Int](16) // per-4x4 MVs (split; else replicated)
  }

  /** Frame features that PERSIST across interframes (RFC 6386 §9.3,
    * §9.4; libvpx decodeframe.c + init_frame): segment feature data
    * (quantizer / loop-filter adjustments plus the abs-vs-delta
    * mode), segment tree probabilities, the per-macroblock segment
    * map, and the reference/mode loop-filter deltas. Keyframes reset
    * all of them to defaults; an interframe header only overwrites
    * the pieces whose update flags are set:
    *  - update_mb_segmentation_data = 1 zeroes then re-reads the
    *    feature data (absent entries become 0, per libvpx's memset);
    *  - update_mb_segmentation_map = 1 resets the tree probs to 255
    *    then re-reads them and recodes every MB's segment id;
    *  - segmentation enabled with update_mb_segmentation_map = 0
    *    reuses the previous frame's segment map (the normal output
    *    of real encoders on interframes);
    *  - mode_ref_lf_delta_update = 1 overwrites ONLY the delta
    *    entries whose per-entry flag is set; the rest persist. */
  private final class Features {
    var segAbsDelta = false
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    var segmentMap: Array[Int] = null // mbW*mbH ids; null = never coded
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    def reset(): Unit = {
      segAbsDelta = false
      java.util.Arrays.fill(segQuant, 0)
      java.util.Arrays.fill(segLf, 0)
      segTreeProbs(0) = 255; segTreeProbs(1) = 255; segTreeProbs(2) = 255
      segmentMap = null
      java.util.Arrays.fill(refLfDeltas, 0)
      java.util.Arrays.fill(modeLfDeltas, 0)
    }
  }

  /** Cross-frame state for inter-frame sequences (r12): the three
    * reference plane sets, the persistent entropy context
    * (coefficient, MV and intra-mode probabilities survive frames
    * whose refresh_entropy_probs is set; keyframes reset them) and
    * the persistent frame features (r13, [[Features]]). */
  private final class SeqState {
    var width = 0; var height = 0
    var lastY: Plane = null; var lastU: Plane = null; var lastV: Plane = null
    var goldY: Plane = null; var goldU: Plane = null; var goldV: Plane = null
    var altY: Plane = null; var altU: Plane = null; var altV: Plane = null
    val signBias = Array(0, 0, 0, 0) // by ref id (golden/altref coded)
    var coeffProbs: Array[Int] = null // null = spec defaults
    var mvProbs: Array[Array[Int]] = null
    var yModeProbs: Array[Int] = null
    var uvModeProbs: Array[Int] = null
    val features = new Features
    def resetEntropy(): Unit = {
      coeffProbs = null
      mvProbs = Array(Vp8Inter.MvDefaultProbs(0).clone(),
        Vp8Inter.MvDefaultProbs(1).clone())
      yModeProbs = Vp8Inter.InterYModeProbs.clone()
      uvModeProbs = Vp8Inter.InterUvModeProbs.clone()
    }
    resetEntropy()
  }

  /** Decode a sequence of frames (frame 0 must be a keyframe) sharing
    * reference buffers and entropy state — the IVF path
    * ([[Vp8Inter.decodeIvf]]). None if ANY frame fails (validator
    * stance: a stream is decoded whole or not at all). */
  private[operators] def decodeSequence(
      b: Array[Byte], frames: Seq[(Int, Int)]): Option[Seq[Yuv]] = {
    if (frames.isEmpty) return None
    val st = new SeqState
    val out = Seq.newBuilder[Yuv]
    var i = 0
    while (i < frames.length) {
      val (o, l) = frames(i)
      decode0(b, o, l, st) match {
        case Some(y) => out += y
        case None => return None
      }
      i += 1
    }
    Some(out.result())
  }

  /** Decode one keyframe from `b(off until off+len)`. None on
    * non-keyframes, version > 3, or any malformed stream. */
  def decodeFrame(b: Array[Byte], off: Int, len: Int): Option[Yuv] = {
    try decode0(b, off, len, null)
    catch { case _: Exception => None }
  }

  /** Spec-only variant that lets malformed-stream exceptions escape
    * (conformance debugging; production callers use [[decodeFrame]]). */
  private[operators] def decodeFrameUnsafe(
      b: Array[Byte], off: Int, len: Int): Option[Yuv] =
    decode0(b, off, len, null)

  private def decode0(b: Array[Byte], off: Int, len: Int,
      st: SeqState): Option[Yuv] = {
    if (len < 4 || off < 0 || off + len > b.length) return None
    val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16)
    val keyframe = (tag & 1) == 0
    val version = (tag >> 1) & 7
    val part0Len = tag >> 5
    if (version > 3) return None
    // an interframe needs a sequence context with a decoded keyframe
    if (!keyframe && (st == null || st.lastY == null)) return None
    var w = 0; var h = 0
    var part0 = 0
    if (keyframe) {
      if (len < 10) return None
      if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
        (b(off + 5) & 0xff) != 0x2a) return None
      w = ((b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)) & 0x3fff
      h = ((b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)) & 0x3fff
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
      part0 = off + 10
      if (st != null) {
        // a mid-sequence keyframe MAY resize (legal VP8, r13): it
        // refreshes all three reference buffers with the new frame,
        // so no stale-dimension plane survives it
        st.width = w; st.height = h
        st.resetEntropy()
        st.features.reset()
        st.signBias(2) = 0; st.signBias(3) = 0
      }
    } else {
      w = st.width; h = st.height
      part0 = off + 3
    }
    if (part0 + part0Len > off + len) return None
    val hd = new Bool(b, part0, part0 + part0Len)

    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16

    // ---- frame header (§9.2–§9.11) --------------------------------
    if (keyframe) {
      hd.literal(1) // color space (0 for WebP)
      hd.literal(1) // clamping type
    }
    // persistent features: the sequence's (interframes inherit) or a
    // fresh default set for a standalone keyframe decode
    val ft = if (st != null) st.features else new Features
    var segEnabled = false
    var segUpdateMap = false
    if (hd.bool(128) == 1) {
      segEnabled = true
      segUpdateMap = hd.bool(128) == 1
      val updateData = hd.bool(128) == 1
      if (updateData) {
        ft.segAbsDelta = hd.bool(128) == 1
        // entries without a coded value become 0 (libvpx memsets the
        // feature data before re-reading it on update)
        var i = 0
        while (i < 4) { ft.segQuant(i) = hd.signedLiteralIf(7); i += 1 }
        i = 0
        while (i < 4) { ft.segLf(i) = hd.signedLiteralIf(6); i += 1 }
      }
      if (segUpdateMap) {
        // tree probs reset to 255 on every map update, then coded
        var i = 0
        while (i < 3) {
          ft.segTreeProbs(i) =
            if (hd.bool(128) == 1) hd.literal(8) else 255
          i += 1
        }
      }
    }
    val simpleFilter = hd.literal(1) == 1
    val filterLevel = hd.literal(6)
    val sharpness = hd.literal(3)
    var lfDeltaEnabled = false
    if (hd.bool(128) == 1) {
      lfDeltaEnabled = true
      if (hd.bool(128) == 1) {
        // only the entries whose flag is set are overwritten; the
        // rest keep their inherited values (libvpx has no memset
        // here, unlike the segment feature data)
        var i = 0
        while (i < 4) {
          if (hd.bool(128) == 1) {
            val v = hd.literal(6)
            ft.refLfDeltas(i) = if (hd.bool(128) == 1) -v else v
          }
          i += 1
        }
        i = 0
        while (i < 4) {
          if (hd.bool(128) == 1) {
            val v = hd.literal(6)
            ft.modeLfDeltas(i) = if (hd.bool(128) == 1) -v else v
          }
          i += 1
        }
      }
    }
    val nParts = 1 << hd.literal(2)
    // token partition boundaries: (nParts-1) 3-byte sizes follow part0
    val sizesAt = part0 + part0Len
    if (sizesAt + 3 * (nParts - 1) > off + len) return None
    val partStart = new Array[Int](nParts)
    val partEnd = new Array[Int](nParts)
    var ps = sizesAt + 3 * (nParts - 1)
    var pi = 0
    while (pi < nParts) {
      val sz = if (pi == nParts - 1) (off + len) - ps
        else (b(sizesAt + 3 * pi) & 0xff) |
          ((b(sizesAt + 3 * pi + 1) & 0xff) << 8) |
          ((b(sizesAt + 3 * pi + 2) & 0xff) << 16)
      if (sz < 0 || ps + sz > off + len) return None
      partStart(pi) = ps; partEnd(pi) = ps + sz
      ps += sz
      pi += 1
    }
    val parts = Array.tabulate(nParts)(i =>
      new Bool(b, partStart(i), partEnd(i)))

    // ---- quantizers (§9.6, §14.1) ----------------------------------
    val yAcQi = hd.literal(7)
    val yDcDelta = hd.signedLiteralIf(4)
    val y2DcDelta = hd.signedLiteralIf(4)
    val y2AcDelta = hd.signedLiteralIf(4)
    val uvDcDelta = hd.signedLiteralIf(4)
    val uvAcDelta = hd.signedLiteralIf(4)
    // per segment: [y1dc, y1ac, y2dc, y2ac, uvdc, uvac]
    val dq = Array.ofDim[Int](4, 6)
    var s = 0
    while (s < 4) {
      val base = if (!segEnabled) yAcQi
        else if (ft.segAbsDelta) ft.segQuant(s)
        else yAcQi + ft.segQuant(s)
      val q = clampQ(base)
      dq(s)(0) = Vp8Tables.DcQLookup(clampQ(q + yDcDelta))
      dq(s)(1) = Vp8Tables.AcQLookup(q)
      dq(s)(2) = Vp8Tables.DcQLookup(clampQ(q + y2DcDelta)) * 2
      dq(s)(3) = {
        val v = Vp8Tables.AcQLookup(clampQ(q + y2AcDelta)) * 155 / 100
        if (v < 8) 8 else v
      }
      dq(s)(4) = {
        val v = Vp8Tables.DcQLookup(clampQ(q + uvDcDelta))
        if (v > 132) 132 else v
      }
      dq(s)(5) = Vp8Tables.AcQLookup(clampQ(q + uvAcDelta))
      s += 1
    }

    // ---- reference refresh plan (§9.7, interframes) ----------------
    var refreshGolden = keyframe
    var refreshAlt = keyframe
    var refreshLast = true
    var copyGolden = 0
    var copyAlt = 0
    if (!keyframe) {
      refreshGolden = hd.literal(1) == 1
      refreshAlt = hd.literal(1) == 1
      if (!refreshGolden) copyGolden = hd.literal(2)
      if (!refreshAlt) copyAlt = hd.literal(2)
      st.signBias(2) = hd.literal(1)
      st.signBias(3) = hd.literal(1)
    }
    val refreshEntropy = hd.literal(1) == 1
    if (!keyframe) refreshLast = hd.literal(1) == 1

    // ---- coefficient probability updates (§13.4) -------------------
    // base = the persistent context (defaults after a keyframe reset)
    val coeffProbs =
      if (st != null && st.coeffProbs != null) st.coeffProbs.clone()
      else Vp8Tables.CoeffProbs.clone()
    var ci = 0
    while (ci < 1056) {
      if (hd.bool(Vp8Tables.CoeffUpdateProbs(ci)) == 1)
        coeffProbs(ci) = hd.literal(8)
      ci += 1
    }
    val mbNoCoeffSkip = hd.bool(128) == 1
    val probSkipFalse = if (mbNoCoeffSkip) hd.literal(8) else 0

    // ---- interframe mode/MV probabilities (§9.10-§9.11, §17.2) -----
    var probIntra = 0; var probLast = 0; var probGf = 0
    val yModeProbs =
      if (st != null) st.yModeProbs.clone() else null
    val uvModeProbs =
      if (st != null) st.uvModeProbs.clone() else null
    val mvProbs =
      if (st != null) Array(st.mvProbs(0).clone(), st.mvProbs(1).clone())
      else null
    if (!keyframe) {
      probIntra = hd.literal(8)
      probLast = hd.literal(8)
      probGf = hd.literal(8)
      if (hd.bool(128) == 1) {
        var i = 0
        while (i < 4) { yModeProbs(i) = hd.literal(8); i += 1 }
      }
      if (hd.bool(128) == 1) {
        var i = 0
        while (i < 3) { uvModeProbs(i) = hd.literal(8); i += 1 }
      }
      var c = 0
      while (c < 2) {
        var i = 0
        while (i < 19) {
          if (hd.bool(Vp8Inter.MvUpdateProbs(c)(i)) == 1) {
            val x = hd.literal(7)
            mvProbs(c)(i) = if (x != 0) x << 1 else 1
          }
          i += 1
        }
        c += 1
      }
    }
    // persistence: refresh keeps this frame's context for the next
    if (st != null && refreshEntropy) {
      st.coeffProbs = coeffProbs.clone()
      if (!keyframe) {
        st.mvProbs = Array(mvProbs(0).clone(), mvProbs(1).clone())
        st.yModeProbs = yModeProbs.clone()
        st.uvModeProbs = uvModeProbs.clone()
      }
    } else if (st != null && keyframe) st.coeffProbs = null

    // ---- per-MB mode parse (first partition, §11) ------------------
    if (segEnabled && segUpdateMap &&
        (ft.segmentMap == null || ft.segmentMap.length != mbW * mbH))
      ft.segmentMap = new Array[Int](mbW * mbH)
    val mbs = Array.fill(mbW * mbH)(new MbInfo)
    // above/left 4x4 mode rows for the kf bmode contexts
    val aboveModes = Array.fill(4 * mbW)(0) // B_DC
    val leftModes = new Array[Int](4)
    val ymodeToB = Array(0, 2, 3, 1) // DC->B_DC, V->B_VE, H->B_HE, TM->B_TM
    // neighbor survey state for the near-MV search (out-of-frame
    // reads handled inside findNearMvs as the intra border)
    val nbRefs = new Array[Int](mbW * mbH)
    val nbModes = new Array[Int](mbW * mbH)
    val nbMvs = new Array[Int](mbW * mbH)
    var mby = 0
    while (mby < mbH) {
      java.util.Arrays.fill(leftModes, 0)
      var mbx = 0
      while (mbx < mbW) {
        val mb = mbs(mby * mbW + mbx)
        if (segEnabled) {
          if (segUpdateMap) {
            mb.segment = hd.tree(SegmentTree, ft.segTreeProbs, 0)
            ft.segmentMap(mby * mbW + mbx) = mb.segment
          } else if (ft.segmentMap != null)
            // map not recoded this frame: the previous frame's
            // segment assignment for this MB is reused (§9.3)
            mb.segment = ft.segmentMap(mby * mbW + mbx)
        }
        if (mbNoCoeffSkip) mb.skip = hd.bool(probSkipFalse) == 1
        val interMb = !keyframe && hd.bool(probIntra) == 1
        if (!interMb) {
          // intra: keyframes use the contextual kf trees; interframes
          // use the frame-level mode probabilities and the fixed
          // (non-contextual) B_PRED sub-mode distribution (§11.3)
          mb.yMode =
            if (keyframe) hd.tree(KfYModeTree, KfYModeProbs, 0)
            else hd.tree(Vp8Inter.InterYModeTree, yModeProbs, 0)
          if (mb.yMode == 4) { // B_PRED: 16 sub-modes
            var sb = 0
            while (sb < 16) {
              val r = sb >> 2; val c = sb & 3
              val m =
                if (keyframe) {
                  val above = if (r == 0) aboveModes(4 * mbx + c)
                    else mb.bModes(sb - 4)
                  val left = if (c == 0) leftModes(r) else mb.bModes(sb - 1)
                  hd.tree(BModeTree, Vp8Tables.KfBModeProbs,
                    (above * 10 + left) * 9)
                } else hd.tree(BModeTree, Vp8Inter.InterBModeProbs, 0)
              mb.bModes(sb) = m
              if (r == 3) aboveModes(4 * mbx + c) = m
              if (c == 3) leftModes(r) = m
              sb += 1
            }
          } else {
            val bm = ymodeToB(mb.yMode)
            java.util.Arrays.fill(mb.bModes, bm)
            var k = 0
            while (k < 4) {
              aboveModes(4 * mbx + k) = bm; leftModes(k) = bm; k += 1
            }
          }
          mb.uvMode =
            if (keyframe) hd.tree(UvModeTree, KfUvModeProbs, 0)
            else hd.tree(UvModeTree, uvModeProbs, 0)
          mb.refFrame = 0
          mb.mvPacked = 0
        } else {
          // ---- inter MB (§16): reference, mode, motion vectors ----
          mb.refFrame =
            if (hd.bool(probLast) == 0) 1
            else if (hd.bool(probGf) == 0) 2 else 3
          val idx = mby * mbW + mbx
          val (best, nearest, near, cnt) = Vp8Inter.findNearMvs(
            mbx, mby, mbW, mbH, mb.refFrame,
            nbRefs, nbModes, nbMvs, st.signBias)
          val p = Array(
            Vp8Inter.ModeContexts(cnt(0))(0),
            Vp8Inter.ModeContexts(cnt(1))(1),
            Vp8Inter.ModeContexts(cnt(2))(2),
            Vp8Inter.ModeContexts(cnt(3))(3))
          mb.yMode = hd.tree(Vp8Inter.MvRefTree, p, 0)
          mb.yMode match {
            case Vp8Inter.ModeZero => mb.mvPacked = 0
            case Vp8Inter.ModeNearest => mb.mvPacked = nearest
            case Vp8Inter.ModeNear => mb.mvPacked = near
            case Vp8Inter.ModeNew =>
              val dr = readMvComponent(hd, mvProbs(0)) * 2
              val dc = readMvComponent(hd, mvProbs(1)) * 2
              mb.mvPacked = Vp8Inter.packMv(
                Vp8Inter.mvRow(best) + dr, Vp8Inter.mvCol(best) + dc)
            case Vp8Inter.ModeSplit =>
              val kind = hd.tree(Vp8Inter.MbSplitTree,
                Vp8Inter.MbSplitProbs, 0)
              val map = Vp8Inter.MbSplits(kind)
              val nPart = Vp8Inter.MbSplitCount(kind)
              val done = new Array[Boolean](nPart)
              var k = 0
              while (k < 16) {
                val part = map(k)
                if (!done(part)) {
                  done(part) = true
                  val lmv = if ((k & 3) != 0) mb.bMvs(k - 1)
                    else if (mbx == 0) 0
                    else mbs(idx - 1).bMvs(k + 3)
                  val amv = if ((k >> 2) != 0) mb.bMvs(k - 4)
                    else if (mby == 0) 0
                    else mbs(idx - mbW).bMvs(k + 12)
                  val ctx = Vp8Inter.subMvContext(lmv, amv)
                  val leaf = hd.tree(Vp8Inter.SubMvRefTree,
                    Vp8Inter.SubMvRefProbs(ctx), 0)
                  val v = leaf match {
                    case Vp8Inter.SubLeft => lmv
                    case Vp8Inter.SubAbove => amv
                    case Vp8Inter.SubZero => 0
                    case _ =>
                      val dr = readMvComponent(hd, mvProbs(0)) * 2
                      val dc = readMvComponent(hd, mvProbs(1)) * 2
                      Vp8Inter.packMv(Vp8Inter.mvRow(best) + dr,
                        Vp8Inter.mvCol(best) + dc)
                  }
                  var j = 0
                  while (j < 16) {
                    if (map(j) == part) mb.bMvs(j) = v
                    j += 1
                  }
                }
                k += 1
              }
              mb.mvPacked = mb.bMvs(15)
            case other =>
              throw new IllegalStateException(s"mv mode $other")
          }
          if (mb.yMode != Vp8Inter.ModeSplit)
            java.util.Arrays.fill(mb.bMvs, mb.mvPacked)
          // the kf sub-mode context rows see an inter MB as B_DC
          var k = 0
          while (k < 4) {
            aboveModes(4 * mbx + k) = 0; leftModes(k) = 0; k += 1
          }
          mb.uvMode = 0
        }
        nbRefs(mby * mbW + mbx) = mb.refFrame
        nbModes(mby * mbW + mbx) = mb.yMode
        nbMvs(mby * mbW + mbx) = mb.mvPacked
        // loop-filter level for this MB (§15.1)
        var lvl = if (!segEnabled) filterLevel
          else if (ft.segAbsDelta) ft.segLf(mb.segment)
          else filterLevel + ft.segLf(mb.segment)
        lvl = math.max(0, math.min(63, lvl))
        if (lfDeltaEnabled) {
          lvl += ft.refLfDeltas(mb.refFrame)
          if (mb.yMode == 4) lvl += ft.modeLfDeltas(0)
          else if (mb.yMode == Vp8Inter.ModeZero)
            lvl += ft.modeLfDeltas(1)
          else if (mb.yMode == Vp8Inter.ModeSplit)
            lvl += ft.modeLfDeltas(3)
          else if (mb.yMode >= Vp8Inter.ModeNearest)
            lvl += ft.modeLfDeltas(2)
          lvl = math.max(0, math.min(63, lvl))
        }
        mb.filterLevel = lvl
        mbx += 1
      }
      mby += 1
    }

    // ---- reconstruction --------------------------------------------
    val yPlane = new Plane(mbW * 16, mbH * 16)
    val uPlane = new Plane(mbW * 8, mbH * 8)
    val vPlane = new Plane(mbW * 8, mbH * 8)

    // nonzero-coefficient contexts: above per MB column, left per MB.
    // layout per MB: 4 Y + 2 U + 2 V + 1 Y2
    val aboveNz = Array.ofDim[Int](mbW, 9)
    val leftNz = new Array[Int](9)
    val coeffs = new Array[Int](25 * 16) // 24 blocks + Y2 at index 24
    val lastNz = new Array[Int](25) // (last nonzero index)+1 per block

    // token decode of one 4x4 block; returns (lastNonzero+1)
    def decodeBlock(bd: Bool, blockType: Int, first: Int, ctx0: Int,
        dcq: Int, acq: Int, out: Array[Int], outOff: Int): Int = {
      var n = first
      var ctx = ctx0
      var last = 0
      var prevZero = false
      val base = blockType * 264 // 8 bands * 3 ctx * 11
      while (n < 16) {
        val probOff = base + (Bands(n) * 3 + ctx) * 11
        if (!prevZero) { if (bd.bool(coeffProbs(probOff)) == 0) return last }
        // ZERO?
        if (bd.bool(coeffProbs(probOff + 1)) == 0) {
          ctx = 0; prevZero = true; n += 1
        } else {
          // walk the remaining token tree from node 4 (-ONE branch)
          var v = 0
          if (bd.bool(coeffProbs(probOff + 2)) == 0) v = 1
          else {
            if (bd.bool(coeffProbs(probOff + 3)) == 0) {
              // TWO / THREE / FOUR
              if (bd.bool(coeffProbs(probOff + 4)) == 0) v = 2
              else {
                v = if (bd.bool(coeffProbs(probOff + 5)) == 0) 3 else 4
              }
            } else {
              // categories
              val cat =
                if (bd.bool(coeffProbs(probOff + 6)) == 0) {
                  if (bd.bool(coeffProbs(probOff + 7)) == 0) 0 else 1
                } else {
                  if (bd.bool(coeffProbs(probOff + 8)) == 0) {
                    if (bd.bool(coeffProbs(probOff + 9)) == 0) 2 else 3
                  } else {
                    if (bd.bool(coeffProbs(probOff + 10)) == 0) 4 else 5
                  }
                }
              var extra = 0
              val cp = CatProbs(cat)
              var k = 0
              while (k < cp.length) {
                extra = (extra << 1) | bd.bool(cp(k)); k += 1
              }
              v = CatBase(cat) + extra
            }
          }
          val signed = if (bd.bool(128) == 1) -v else v
          out(outOff + Zigzag(n)) =
            signed * (if (n == 0) dcq else acq)
          last = n + 1
          ctx = if (v > 1) 2 else 1
          prevZero = false
          n += 1
        }
      }
      last
    }

    // §14.3 inverse WHT: Y2 -> the 16 Y block DCs
    def iwht(in: Array[Int], inOff: Int, out: Array[Int]): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = in(inOff + i) + in(inOff + 12 + i)
        val b1 = in(inOff + 4 + i) + in(inOff + 8 + i)
        val c1 = in(inOff + 4 + i) - in(inOff + 8 + i)
        val d1 = in(inOff + i) - in(inOff + 12 + i)
        tmp(i) = a1 + b1
        tmp(4 + i) = c1 + d1
        tmp(8 + i) = a1 - b1
        tmp(12 + i) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = tmp(4 * i) + tmp(4 * i + 3)
        val b1 = tmp(4 * i + 1) + tmp(4 * i + 2)
        val c1 = tmp(4 * i + 1) - tmp(4 * i + 2)
        val d1 = tmp(4 * i) - tmp(4 * i + 3)
        val a2 = a1 + b1; val b2 = c1 + d1; val c2 = a1 - b1; val d2 = d1 - c1
        out(4 * i) = (a2 + 3) >> 3
        out(4 * i + 1) = (b2 + 3) >> 3
        out(4 * i + 2) = (c2 + 3) >> 3
        out(4 * i + 3) = (d2 + 3) >> 3
        i += 1
      }
    }

    // §14.4 inverse DCT (4x4), result added into the plane
    val IdctCos = 20091 // (sqrt(2)*cos(pi/8) - 1) << 16
    val IdctSin = 35468 // (sqrt(2)*sin(pi/8)) << 16
    def idctAdd(p: Plane, x0: Int, y0: Int,
        in: Array[Int], inOff: Int): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = in(inOff + i) + in(inOff + 8 + i)
        val b1 = in(inOff + i) - in(inOff + 8 + i)
        val t1 = ((in(inOff + 4 + i) * IdctSin) >> 16)
        val t2 = in(inOff + 12 + i) + ((in(inOff + 12 + i) * IdctCos) >> 16)
        val c1 = t1 - t2
        val t3 = in(inOff + 4 + i) + ((in(inOff + 4 + i) * IdctCos) >> 16)
        val t4 = ((in(inOff + 12 + i) * IdctSin) >> 16)
        val d1 = t3 + t4
        tmp(i) = a1 + d1
        tmp(12 + i) = a1 - d1
        tmp(4 + i) = b1 + c1
        tmp(8 + i) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = tmp(4 * i) + tmp(4 * i + 2)
        val b1 = tmp(4 * i) - tmp(4 * i + 2)
        val t1 = ((tmp(4 * i + 1) * IdctSin) >> 16)
        val t2 = tmp(4 * i + 3) + ((tmp(4 * i + 3) * IdctCos) >> 16)
        val c1 = t1 - t2
        val t3 = tmp(4 * i + 1) + ((tmp(4 * i + 1) * IdctCos) >> 16)
        val t4 = ((tmp(4 * i + 3) * IdctSin) >> 16)
        val d1 = t3 + t4
        p.set(x0, y0 + i, clamp255(p.get(x0, y0 + i) + ((a1 + d1 + 4) >> 3)))
        p.set(x0 + 3, y0 + i,
          clamp255(p.get(x0 + 3, y0 + i) + ((a1 - d1 + 4) >> 3)))
        p.set(x0 + 1, y0 + i,
          clamp255(p.get(x0 + 1, y0 + i) + ((b1 + c1 + 4) >> 3)))
        p.set(x0 + 2, y0 + i,
          clamp255(p.get(x0 + 2, y0 + i) + ((b1 - c1 + 4) >> 3)))
        i += 1
      }
    }

    // ---- intra predictors (§12) ------------------------------------
    def predBlock(p: Plane, x0: Int, y0: Int, n: Int, mode: Int,
        haveAbove: Boolean, haveLeft: Boolean): Unit = {
      mode match {
        case 0 => // DC: availability-sensitive
          var sum = 0; var cnt = 0
          if (haveAbove) { var i = 0
            while (i < n) { sum += p.get(x0 + i, y0 - 1); i += 1 }; cnt += n }
          if (haveLeft) { var i = 0
            while (i < n) { sum += p.get(x0 - 1, y0 + i); i += 1 }; cnt += n }
          val dcv = if (cnt == 0) 128 else (sum + cnt / 2) / cnt
          var y = 0
          while (y < n) { var x = 0
            while (x < n) { p.set(x0 + x, y0 + y, dcv); x += 1 }; y += 1 }
        case 1 => // V
          var y = 0
          while (y < n) { var x = 0
            while (x < n) { p.set(x0 + x, y0 + y, p.get(x0 + x, y0 - 1))
              x += 1 }; y += 1 }
        case 2 => // H
          var y = 0
          while (y < n) { val v = p.get(x0 - 1, y0 + y); var x = 0
            while (x < n) { p.set(x0 + x, y0 + y, v); x += 1 }; y += 1 }
        case 3 => // TM
          val tl = p.get(x0 - 1, y0 - 1)
          var y = 0
          while (y < n) {
            val l = p.get(x0 - 1, y0 + y)
            var x = 0
            while (x < n) {
              p.set(x0 + x, y0 + y, clamp255(l + p.get(x0 + x, y0 - 1) - tl))
              x += 1
            }
            y += 1
          }
      }
    }

    // 4x4 B_PRED predictors (§12.3). Neighborhood: A[0..7] = above and
    // above-right, L[0..3] = left, X = above-left.
    def predB(p: Plane, x0: Int, y0: Int, mode: Int): Unit = {
      val A = new Array[Int](8)
      var i = 0
      while (i < 4) { A(i) = p.get(x0 + i, y0 - 1); i += 1 }
      // above-right: for right-column subblocks below the MB's top row
      // the 4 pixels to the upper right are NOT yet reconstructed —
      // the spec substitutes the row above the MACROBLOCK (for the
      // frame's rightmost MB that row's 4-px extension replicates its
      // last pixel); interior columns read the already-reconstructed
      // subblock row directly
      val trRow = if ((x0 & 15) == 12) y0 - (y0 & 15) - 1 else y0 - 1
      while (i < 8) { A(i) = p.get(x0 + i, trRow); i += 1 }
      val L = new Array[Int](4)
      i = 0
      while (i < 4) { L(i) = p.get(x0 - 1, y0 + i); i += 1 }
      val X = p.get(x0 - 1, y0 - 1)
      @inline def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2
      @inline def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
      @inline def set(x: Int, y: Int, v: Int): Unit = p.set(x0 + x, y0 + y, v)
      mode match {
        case 0 => // B_DC
          var sum = 4
          i = 0
          while (i < 4) { sum += A(i) + L(i); i += 1 }
          val v = sum >> 3
          var y = 0
          while (y < 4) { var x = 0
            while (x < 4) { set(x, y, v); x += 1 }; y += 1 }
        case 1 => // B_TM
          var y = 0
          while (y < 4) { var x = 0
            while (x < 4) { set(x, y, clamp255(L(y) + A(x) - X)); x += 1 }
            y += 1 }
        case 2 => // B_VE: filtered vertical
          val f = Array(avg3(X, A(0), A(1)), avg3(A(0), A(1), A(2)),
            avg3(A(1), A(2), A(3)), avg3(A(2), A(3), A(4)))
          var y = 0
          while (y < 4) { var x = 0
            while (x < 4) { set(x, y, f(x)); x += 1 }; y += 1 }
        case 3 => // B_HE: filtered horizontal
          val f = Array(avg3(X, L(0), L(1)), avg3(L(0), L(1), L(2)),
            avg3(L(1), L(2), L(3)), avg3(L(2), L(3), L(3)))
          var y = 0
          while (y < 4) { var x = 0
            while (x < 4) { set(x, y, f(y)); x += 1 }; y += 1 }
        case 4 => // B_RD (down-right)
          val e = Array(
            avg3(L(3), L(2), L(1)), avg3(L(2), L(1), L(0)),
            avg3(L(1), L(0), X), avg3(L(0), X, A(0)),
            avg3(X, A(0), A(1)), avg3(A(0), A(1), A(2)),
            avg3(A(1), A(2), A(3)))
          var y = 0
          while (y < 4) { var x = 0
            while (x < 4) { set(x, y, e(3 + x - y)); x += 1 }; y += 1 }
        case 5 => // B_VR (vertical-right)
          set(0, 0, avg2(X, A(0))); set(1, 0, avg2(A(0), A(1)))
          set(2, 0, avg2(A(1), A(2))); set(3, 0, avg2(A(2), A(3)))
          set(0, 1, avg3(L(0), X, A(0))); set(1, 1, avg3(X, A(0), A(1)))
          set(2, 1, avg3(A(0), A(1), A(2))); set(3, 1, avg3(A(1), A(2), A(3)))
          set(0, 2, avg3(L(1), L(0), X))
          set(1, 2, p.get(x0, y0)); set(2, 2, p.get(x0 + 1, y0))
          set(3, 2, p.get(x0 + 2, y0))
          set(0, 3, avg3(L(2), L(1), L(0)))
          set(1, 3, p.get(x0, y0 + 1)); set(2, 3, p.get(x0 + 1, y0 + 1))
          set(3, 3, p.get(x0 + 2, y0 + 1))
        case 6 => // B_LD (down-left)
          val e = Array(
            avg3(A(0), A(1), A(2)), avg3(A(1), A(2), A(3)),
            avg3(A(2), A(3), A(4)), avg3(A(3), A(4), A(5)),
            avg3(A(4), A(5), A(6)), avg3(A(5), A(6), A(7)),
            avg3(A(6), A(7), A(7)))
          var y = 0
          while (y < 4) { var x = 0
            while (x < 4) { set(x, y, e(x + y)); x += 1 }; y += 1 }
        case 7 => // B_VL (vertical-left)
          set(0, 0, avg2(A(0), A(1))); set(1, 0, avg2(A(1), A(2)))
          set(2, 0, avg2(A(2), A(3))); set(3, 0, avg2(A(3), A(4)))
          set(0, 1, avg3(A(0), A(1), A(2))); set(1, 1, avg3(A(1), A(2), A(3)))
          set(2, 1, avg3(A(2), A(3), A(4))); set(3, 1, avg3(A(3), A(4), A(5)))
          set(0, 2, p.get(x0 + 1, y0)); set(1, 2, p.get(x0 + 2, y0))
          set(2, 2, p.get(x0 + 3, y0)); set(3, 2, avg3(A(4), A(5), A(6)))
          set(0, 3, p.get(x0 + 1, y0 + 1)); set(1, 3, p.get(x0 + 2, y0 + 1))
          set(2, 3, p.get(x0 + 3, y0 + 1)); set(3, 3, avg3(A(5), A(6), A(7)))
        case 8 => // B_HD (horizontal-down)
          set(0, 0, avg2(X, L(0))); set(1, 0, avg3(L(0), X, A(0)))
          set(2, 0, avg3(X, A(0), A(1))); set(3, 0, avg3(A(0), A(1), A(2)))
          set(0, 1, avg2(L(0), L(1))); set(1, 1, avg3(X, L(0), L(1)))
          set(2, 1, p.get(x0, y0)); set(3, 1, p.get(x0 + 1, y0))
          set(0, 2, avg2(L(1), L(2))); set(1, 2, avg3(L(0), L(1), L(2)))
          set(2, 2, p.get(x0, y0 + 1)); set(3, 2, p.get(x0 + 1, y0 + 1))
          set(0, 3, avg2(L(2), L(3))); set(1, 3, avg3(L(1), L(2), L(3)))
          set(2, 3, p.get(x0, y0 + 2)); set(3, 3, p.get(x0 + 1, y0 + 2))
        case 9 => // B_HU (horizontal-up)
          set(0, 0, avg2(L(0), L(1))); set(1, 0, avg3(L(0), L(1), L(2)))
          set(2, 0, avg2(L(1), L(2))); set(3, 0, avg3(L(1), L(2), L(3)))
          set(0, 1, p.get(x0 + 2, y0)); set(1, 1, p.get(x0 + 3, y0))
          set(2, 1, avg2(L(2), L(3))); set(3, 1, avg3(L(2), L(3), L(3)))
          set(0, 2, p.get(x0 + 2, y0 + 1)); set(1, 2, p.get(x0 + 3, y0 + 1))
          set(2, 2, L(3)); set(3, 2, L(3))
          set(0, 3, L(3)); set(1, 3, L(3)); set(2, 3, L(3)); set(3, 3, L(3))
      }
    }

    mby = 0
    while (mby < mbH) {
      java.util.Arrays.fill(leftNz, 0)
      val bd = parts(mby % nParts)
      var mbx = 0
      while (mbx < mbW) {
        val mb = mbs(mby * mbW + mbx)
        val hasY2 = mb.yMode != 4 && mb.yMode != Vp8Inter.ModeSplit
        java.util.Arrays.fill(coeffs, 0)
        java.util.Arrays.fill(lastNz, 0)
        if (mb.skip) {
          // §13: a skipped MB zeroes the contexts of the planes it
          // codes; a skipped B_PRED MB leaves the Y2 context alone
          var k = 0
          while (k < 8) { aboveNz(mbx)(k) = 0; leftNz(k) = 0; k += 1 }
          if (hasY2) { aboveNz(mbx)(8) = 0; leftNz(8) = 0 }
          mb.hasCoeffs = false
        } else {
          val d = dq(mb.segment)
          var any = false
          var firstY = 0
          if (hasY2) {
            val ctx = aboveNz(mbx)(8) + leftNz(8)
            lastNz(24) = decodeBlock(bd, 1, 0, ctx, d(2), d(3), coeffs,
              24 * 16)
            val nz = if (lastNz(24) > 0) 1 else 0
            aboveNz(mbx)(8) = nz; leftNz(8) = nz
            if (nz == 1) any = true
            firstY = 1
          }
          val yType = if (hasY2) 0 else 3
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2; val c = sb & 3
            val ctx = (if (r == 0) aboveNz(mbx)(c) else
              (if (lastNz(sb - 4) > 0) 1 else 0)) +
              (if (c == 0) leftNz(r) else (if (lastNz(sb - 1) > 0) 1 else 0))
            lastNz(sb) = decodeBlock(bd, yType, firstY, ctx, d(0), d(1),
              coeffs, sb * 16)
            if (lastNz(sb) > 0) any = true
            if (r == 3) aboveNz(mbx)(c) = if (lastNz(sb) > 0) 1 else 0
            if (c == 3) leftNz(r) = if (lastNz(sb) > 0) 1 else 0
            sb += 1
          }
          // chroma: U blocks 16..19, V blocks 20..23
          var pl = 0
          while (pl < 2) {
            var cb = 0
            while (cb < 4) {
              val blk = 16 + pl * 4 + cb
              val r = cb >> 1; val c = cb & 1
              val nzOff = 4 + pl * 2
              val ctx = (if (r == 0) aboveNz(mbx)(nzOff + c) else
                (if (lastNz(blk - 2) > 0) 1 else 0)) +
                (if (c == 0) leftNz(nzOff + r) else
                  (if (lastNz(blk - 1) > 0) 1 else 0))
              lastNz(blk) = decodeBlock(bd, 2, 0, ctx, d(4), d(5),
                coeffs, blk * 16)
              if (lastNz(blk) > 0) any = true
              if (r == 1) aboveNz(mbx)(nzOff + c) =
                if (lastNz(blk) > 0) 1 else 0
              if (c == 1) leftNz(nzOff + r) = if (lastNz(blk) > 0) 1 else 0
              cb += 1
            }
            pl += 1
          }
          mb.hasCoeffs = any
          if (hasY2 && lastNz(24) > 0) {
            val dcs = new Array[Int](16)
            iwht(coeffs, 24 * 16, dcs)
            var k = 0
            while (k < 16) { coeffs(k * 16) = dcs(k); k += 1 }
          } else if (hasY2) {
            var k = 0
            while (k < 16) { coeffs(k * 16) = 0; k += 1 }
          }
        }

        // ---- predict + add residue --------------------------------
        val bx = mbx * 16; val by = mby * 16
        val cx = mbx * 8; val cy = mby * 8
        if (mb.refFrame != 0) {
          // ---- inter prediction (§18): MC from the chosen reference
          val (ry, ru, rv) = mb.refFrame match {
            case 1 => (st.lastY, st.lastU, st.lastV)
            case 2 => (st.goldY, st.goldU, st.goldV)
            case _ => (st.altY, st.altU, st.altV)
          }
          val sixtap = version == 0
          val fpMask = if (version == 3) ~7 else ~0
          if (mb.yMode != Vp8Inter.ModeSplit) {
            val cl = Vp8Inter.clampMvMc(mb.mvPacked, mbx, mby, mbW, mbH)
            val mr = Vp8Inter.mvRow(cl) & fpMask
            val mc = Vp8Inter.mvCol(cl) & fpMask
            mcBlock(yPlane, ry, bx, by, 16, 16, mr, mc, sixtap)
            val cmr = Vp8Inter.chromaMv(mr) & fpMask
            val cmc = Vp8Inter.chromaMv(mc) & fpMask
            mcBlock(uPlane, ru, cx, cy, 8, 8, cmr, cmc, sixtap)
            mcBlock(vPlane, rv, cx, cy, 8, 8, cmr, cmc, sixtap)
          } else {
            // per-4x4 luma MVs; each 4x4 chroma block averages its
            // four covering luma sub-MVs (round away from zero)
            val clamped = new Array[Int](16)
            var k = 0
            while (k < 16) {
              clamped(k) =
                Vp8Inter.clampMvMc(mb.bMvs(k), mbx, mby, mbW, mbH)
              val mr = Vp8Inter.mvRow(clamped(k)) & fpMask
              val mc = Vp8Inter.mvCol(clamped(k)) & fpMask
              mcBlock(yPlane, ry, bx + (k & 3) * 4, by + (k >> 2) * 4,
                4, 4, mr, mc, sixtap)
              k += 1
            }
            var ci2 = 0
            while (ci2 < 4) {
              val r = ci2 >> 1; val c = ci2 & 1
              val yo = r * 8 + c * 2
              var sr = 0; var sc = 0
              Seq(yo, yo + 1, yo + 4, yo + 5).foreach { j =>
                sr += Vp8Inter.mvRow(clamped(j))
                sc += Vp8Inter.mvCol(clamped(j))
              }
              val cmr = Vp8Inter.chromaMvSplit(sr) & fpMask
              val cmc = Vp8Inter.chromaMvSplit(sc) & fpMask
              mcBlock(uPlane, ru, cx + c * 4, cy + r * 4, 4, 4,
                cmr, cmc, sixtap)
              mcBlock(vPlane, rv, cx + c * 4, cy + r * 4, 4, 4,
                cmr, cmc, sixtap)
              ci2 += 1
            }
          }
          var sb = 0
          while (sb < 16) {
            if (lastNz(sb) > 0 || (hasY2 && coeffs(sb * 16) != 0))
              idctAdd(yPlane, bx + (sb & 3) * 4, by + (sb >> 2) * 4,
                coeffs, sb * 16)
            sb += 1
          }
        } else if (mb.yMode == 4) {
          var sb = 0
          while (sb < 16) {
            val x0 = bx + (sb & 3) * 4; val y0 = by + (sb >> 2) * 4
            predB(yPlane, x0, y0, mb.bModes(sb))
            if (lastNz(sb) > 0) idctAdd(yPlane, x0, y0, coeffs, sb * 16)
            sb += 1
          }
        } else {
          predBlock(yPlane, bx, by, 16, mb.yMode, mby > 0, mbx > 0)
          var sb = 0
          while (sb < 16) {
            if (lastNz(sb) > 0 || coeffs(sb * 16) != 0)
              idctAdd(yPlane, bx + (sb & 3) * 4, by + (sb >> 2) * 4,
                coeffs, sb * 16)
            sb += 1
          }
        }
        if (mb.refFrame == 0) {
          predBlock(uPlane, cx, cy, 8, mb.uvMode, mby > 0, mbx > 0)
          predBlock(vPlane, cx, cy, 8, mb.uvMode, mby > 0, mbx > 0)
        }
        var cb = 0
        while (cb < 4) {
          val xo = (cb & 1) * 4; val yo = (cb >> 1) * 4
          if (lastNz(16 + cb) > 0)
            idctAdd(uPlane, cx + xo, cy + yo, coeffs, (16 + cb) * 16)
          if (lastNz(20 + cb) > 0)
            idctAdd(vPlane, cx + xo, cy + yo, coeffs, (20 + cb) * 16)
          cb += 1
        }
        // keep the right extension fresh for the NEXT row's
        // above-right reads (only this MB's rows need it now)
        if (mbx == mbW - 1) {
          var yy = by
          while (yy < by + 16) { yPlane.extendRight(yy); yy += 1 }
        }
        mbx += 1
      }
      mby += 1
    }

    // ---- loop filter (§15) -----------------------------------------
    if (filterLevel > 0) {
      filterFrame(yPlane, uPlane, vPlane, mbs, mbW, mbH, simpleFilter,
        sharpness)
    }

    // ---- reference buffer update (§9.7) -----------------------------
    if (st != null) {
      // libvpx swap_frame_buffers order (r13, was pre-frame-resolved):
      // 1. the ALTREF copy lands first (sources: pre-frame last or
      //    pre-frame golden);
      // 2. the GOLDEN copy lands second — source 2 (altref) reads the
      //    JUST-UPDATED altref, so copyAlt=1 + copyGolden=2 ends with
      //    golden == the pre-frame LAST frame;
      // 3. the refresh assignments (new frame) land after both
      //    copies. Copies are only coded when the matching refresh
      //    bit is 0, so the refresh-vs-copy interleaving is exactly
      //    the deployed decoders' sequence.
      if (copyAlt == 1) {
        st.altY = st.lastY; st.altU = st.lastU; st.altV = st.lastV
      } else if (copyAlt == 2) {
        st.altY = st.goldY; st.altU = st.goldU; st.altV = st.goldV
      }
      if (copyGolden == 1) {
        st.goldY = st.lastY; st.goldU = st.lastU; st.goldV = st.lastV
      } else if (copyGolden == 2) {
        st.goldY = st.altY; st.goldU = st.altU; st.goldV = st.altV
      }
      if (refreshGolden) {
        st.goldY = yPlane; st.goldU = uPlane; st.goldV = vPlane
      }
      if (refreshAlt) {
        st.altY = yPlane; st.altU = uPlane; st.altV = vPlane
      }
      if (refreshLast) {
        st.lastY = yPlane; st.lastU = uPlane; st.lastV = vPlane
      }
    }

    // ---- crop -------------------------------------------------------
    val y = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) { y(r * w + c) = yPlane.get(c, r).toByte; c += 1 }
      r += 1
    }
    val cw = (w + 1) / 2; val chh = (h + 1) / 2
    val u = new Array[Byte](cw * chh)
    val v = new Array[Byte](cw * chh)
    r = 0
    while (r < chh) {
      var c = 0
      while (c < cw) {
        u(r * cw + c) = uPlane.get(c, r).toByte
        v(r * cw + c) = vPlane.get(c, r).toByte
        c += 1
      }
      r += 1
    }
    Some(Yuv(w, h, y, u, v))
  }

  // ---- §17.2 MV component decode -------------------------------------

  /** One MV component in pre-doubling units: short values ride the
    * small tree (probs 2..8), long values spell bits 0-2 then 9..4
    * with bit 3 implicit when no higher bit is set, then the sign. */
  private[operators] def readMvComponent(bd: Bool, p: Array[Int]): Int = {
    var x = 0
    if (bd.bool(p(0)) == 1) { // long vector
      var i = 0
      while (i < 3) { x += bd.bool(p(9 + i)) << i; i += 1 }
      i = 9
      while (i > 3) { x += bd.bool(p(9 + i)) << i; i -= 1 }
      if ((x & 0xfff0) == 0 || bd.bool(p(9 + 3)) == 1) x += 8
    } else x = bd.tree(Vp8Inter.SmallMvTree, p, 2)
    if (x != 0 && bd.bool(p(1)) == 1) -x else x
  }

  // ---- §18 motion compensation ---------------------------------------

  /** Predict a w×h block of `dst` at (dx0, dy0) from `ref` displaced
    * by an eighth-pel MV, with the two-pass 6-tap (or bilinear)
    * sub-pixel interpolation. Reads clamp to the reference plane —
    * identical to the reference decoder's replicated border extension
    * for every MV the parse-time/MC-time clamps admit. The first-pass
    * intermediate is rounded and clamped to 8 bits, as the spec's
    * filter_common does. */
  private def mcBlock(dst: Plane, ref: Plane, dx0: Int, dy0: Int,
      w: Int, h: Int, mvr: Int, mvc: Int, sixtap: Boolean): Unit = {
    val ix = dx0 + (mvc >> 3); val iy = dy0 + (mvr >> 3)
    val xf = mvc & 7; val yf = mvr & 7
    @inline def src(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= ref.w) ref.w - 1 else x
      val cy = if (y < 0) 0 else if (y >= ref.h) ref.h - 1 else y
      ref.get(cx, cy)
    }
    if (xf == 0 && yf == 0) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { dst.set(dx0 + x, dy0 + y, src(ix + x, iy + y)); x += 1 }
        y += 1
      }
      return
    }
    if (sixtap) {
      val fx = Vp8Inter.SubpelFilters(xf)
      val fy = Vp8Inter.SubpelFilters(yf)
      if (yf == 0) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var s = 0; var k = 0
            while (k < 6) { s += fx(k) * src(ix + x - 2 + k, iy + y); k += 1 }
            dst.set(dx0 + x, dy0 + y, clamp255((s + 64) >> 7))
            x += 1
          }
          y += 1
        }
      } else if (xf == 0) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var s = 0; var k = 0
            while (k < 6) { s += fy(k) * src(ix + x, iy + y - 2 + k); k += 1 }
            dst.set(dx0 + x, dy0 + y, clamp255((s + 64) >> 7))
            x += 1
          }
          y += 1
        }
      } else {
        val tmp = new Array[Int](w * (h + 5))
        var y = 0
        while (y < h + 5) {
          var x = 0
          while (x < w) {
            var s = 0; var k = 0
            while (k < 6) { s += fx(k) * src(ix + x - 2 + k, iy + y - 2); k += 1 }
            tmp(y * w + x) = clamp255((s + 64) >> 7)
            x += 1
          }
          y += 1
        }
        y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var s = 0; var k = 0
            while (k < 6) { s += fy(k) * tmp((y + k) * w + x); k += 1 }
            dst.set(dx0 + x, dy0 + y, clamp255((s + 64) >> 7))
            x += 1
          }
          y += 1
        }
      }
    } else {
      val fx = Vp8Inter.BilinearFilters(xf)
      val fy = Vp8Inter.BilinearFilters(yf)
      if (yf == 0) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val s = fx(0) * src(ix + x, iy + y) + fx(1) * src(ix + x + 1, iy + y)
            dst.set(dx0 + x, dy0 + y, clamp255((s + 64) >> 7))
            x += 1
          }
          y += 1
        }
      } else if (xf == 0) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val s = fy(0) * src(ix + x, iy + y) + fy(1) * src(ix + x, iy + y + 1)
            dst.set(dx0 + x, dy0 + y, clamp255((s + 64) >> 7))
            x += 1
          }
          y += 1
        }
      } else {
        val tmp = new Array[Int](w * (h + 1))
        var y = 0
        while (y < h + 1) {
          var x = 0
          while (x < w) {
            val s = fx(0) * src(ix + x, iy + y) + fx(1) * src(ix + x + 1, iy + y)
            tmp(y * w + x) = clamp255((s + 64) >> 7)
            x += 1
          }
          y += 1
        }
        y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val s = fy(0) * tmp(y * w + x) + fy(1) * tmp((y + 1) * w + x)
            dst.set(dx0 + x, dy0 + y, clamp255((s + 64) >> 7))
            x += 1
          }
          y += 1
        }
      }
    }
  }

  // ---- §15 loop filter ---------------------------------------------

  private def u2s(v: Int): Int = v - 128
  private def s2u(v: Int): Int = clampS(v) + 128

  /** The shared 4-tap adjustment (§15.3 common_adjust); returns the
    * F1 value used by the subblock filter's outer-tap step. */
  private def commonAdjust(p: Plane, px: Int, py: Int, dx: Int, dy: Int,
      useOuter: Boolean): Int = {
    val p1 = u2s(p.get(px - 2 * dx, py - 2 * dy))
    val p0 = u2s(p.get(px - dx, py - dy))
    val q0 = u2s(p.get(px, py))
    val q1 = u2s(p.get(px + dx, py + dy))
    val a = clampS((if (useOuter) clampS(p1 - q1) else 0) + 3 * (q0 - p0))
    val f1 = clampS(a + 4) >> 3
    val f2 = clampS(a + 3) >> 3
    p.set(px, py, s2u(q0 - f1))
    p.set(px - dx, py - dy, s2u(p0 + f2))
    f1
  }

  private def filterYes(p: Plane, px: Int, py: Int, dx: Int, dy: Int,
      edge: Int, interior: Int): Boolean = {
    def g(k: Int): Int = p.get(px + k * dx, py + k * dy)
    math.abs(g(0) - g(-1)) * 2 + math.abs(g(1) - g(-2)) / 2 <= edge &&
      math.abs(g(-4) - g(-3)) <= interior &&
      math.abs(g(-3) - g(-2)) <= interior &&
      math.abs(g(-2) - g(-1)) <= interior &&
      math.abs(g(3) - g(2)) <= interior &&
      math.abs(g(2) - g(1)) <= interior &&
      math.abs(g(1) - g(0)) <= interior
  }

  private def hev(p: Plane, px: Int, py: Int, dx: Int, dy: Int,
      thresh: Int): Boolean = {
    math.abs(p.get(px - 2 * dx, py - 2 * dy) - p.get(px - dx, py - dy)) >
      thresh ||
      math.abs(p.get(px + dx, py + dy) - p.get(px, py)) > thresh
  }

  private def subblockFilter(p: Plane, px: Int, py: Int, dx: Int, dy: Int,
      edge: Int, interior: Int, hevT: Int): Unit = {
    if (!filterYes(p, px, py, dx, dy, edge, interior)) return
    val h = hev(p, px, py, dx, dy, hevT)
    val f1 = commonAdjust(p, px, py, dx, dy, h)
    if (!h) {
      val a = (f1 + 1) >> 1
      p.set(px + dx, py + dy, s2u(u2s(p.get(px + dx, py + dy)) - a))
      p.set(px - 2 * dx, py - 2 * dy,
        s2u(u2s(p.get(px - 2 * dx, py - 2 * dy)) + a))
    }
  }

  private def mbFilter(p: Plane, px: Int, py: Int, dx: Int, dy: Int,
      edge: Int, interior: Int, hevT: Int): Unit = {
    if (!filterYes(p, px, py, dx, dy, edge, interior)) return
    if (hev(p, px, py, dx, dy, hevT)) {
      commonAdjust(p, px, py, dx, dy, useOuter = true)
    } else {
      val p2 = u2s(p.get(px - 3 * dx, py - 3 * dy))
      val p1 = u2s(p.get(px - 2 * dx, py - 2 * dy))
      val p0 = u2s(p.get(px - dx, py - dy))
      val q0 = u2s(p.get(px, py))
      val q1 = u2s(p.get(px + dx, py + dy))
      val q2 = u2s(p.get(px + 2 * dx, py + 2 * dy))
      val wv = clampS(clampS(p1 - q1) + 3 * (q0 - p0))
      var a = (27 * wv + 63) >> 7
      p.set(px, py, s2u(q0 - a))
      p.set(px - dx, py - dy, s2u(p0 + a))
      a = (18 * wv + 63) >> 7
      p.set(px + dx, py + dy, s2u(q1 - a))
      p.set(px - 2 * dx, py - 2 * dy, s2u(p1 + a))
      a = (9 * wv + 63) >> 7
      p.set(px + 2 * dx, py + 2 * dy, s2u(q2 - a))
      p.set(px - 3 * dx, py - 3 * dy, s2u(p2 + a))
    }
  }

  private def simpleSegment(p: Plane, px: Int, py: Int, dx: Int, dy: Int,
      edge: Int): Unit = {
    def g(k: Int): Int = p.get(px + k * dx, py + k * dy)
    if (math.abs(g(0) - g(-1)) * 2 + math.abs(g(1) - g(-2)) / 2 <= edge)
      commonAdjust(p, px, py, dx, dy, useOuter = true)
  }

  private def filterFrame(yp: Plane, up: Plane, vp: Plane,
      mbs: Array[MbInfo], mbW: Int, mbH: Int, simple: Boolean,
      sharpness: Int): Unit = {
    var mby = 0
    while (mby < mbH) {
      var mbx = 0
      while (mbx < mbW) {
        val mb = mbs(mby * mbW + mbx)
        val lvl = mb.filterLevel
        if (lvl > 0) {
          var interior = lvl
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior < 1) interior = 1
          val hevT = if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
          val mbEdge = (lvl + 2) * 2 + interior
          val sbEdge = lvl * 2 + interior
          // inner edges filter when residue exists or the MB is
          // sub-partitioned (B_PRED intra or SPLITMV inter, §15.2)
          val inner = mb.hasCoeffs || mb.yMode == 4 ||
            mb.yMode == Vp8Inter.ModeSplit
          val bx = mbx * 16; val by = mby * 16
          val cx = mbx * 8; val cy = mby * 8
          if (simple) {
            if (mbx > 0) { var i = 0
              while (i < 16) { simpleSegment(yp, bx, by + i, 1, 0, mbEdge)
                i += 1 } }
            if (inner) {
              var e = 4
              while (e < 16) { var i = 0
                while (i < 16) { simpleSegment(yp, bx + e, by + i, 1, 0,
                  sbEdge); i += 1 }
                e += 4 }
            }
            if (mby > 0) { var i = 0
              while (i < 16) { simpleSegment(yp, bx + i, by, 0, 1, mbEdge)
                i += 1 } }
            if (inner) {
              var e = 4
              while (e < 16) { var i = 0
                while (i < 16) { simpleSegment(yp, bx + i, by + e, 0, 1,
                  sbEdge); i += 1 }
                e += 4 }
            }
          } else {
            if (mbx > 0) {
              var i = 0
              while (i < 16) { mbFilter(yp, bx, by + i, 1, 0, mbEdge,
                interior, hevT); i += 1 }
              i = 0
              while (i < 8) {
                mbFilter(up, cx, cy + i, 1, 0, mbEdge, interior, hevT)
                mbFilter(vp, cx, cy + i, 1, 0, mbEdge, interior, hevT)
                i += 1
              }
            }
            if (inner) {
              var e = 4
              while (e < 16) { var i = 0
                while (i < 16) { subblockFilter(yp, bx + e, by + i, 1, 0,
                  sbEdge, interior, hevT); i += 1 }
                e += 4 }
              var i = 0
              while (i < 8) {
                subblockFilter(up, cx + 4, cy + i, 1, 0, sbEdge, interior,
                  hevT)
                subblockFilter(vp, cx + 4, cy + i, 1, 0, sbEdge, interior,
                  hevT)
                i += 1
              }
            }
            if (mby > 0) {
              var i = 0
              while (i < 16) { mbFilter(yp, bx + i, by, 0, 1, mbEdge,
                interior, hevT); i += 1 }
              i = 0
              while (i < 8) {
                mbFilter(up, cx + i, cy, 0, 1, mbEdge, interior, hevT)
                mbFilter(vp, cx + i, cy, 0, 1, mbEdge, interior, hevT)
                i += 1
              }
            }
            if (inner) {
              var e = 4
              while (e < 16) { var i = 0
                while (i < 16) { subblockFilter(yp, bx + i, by + e, 0, 1,
                  sbEdge, interior, hevT); i += 1 }
                e += 4 }
              var i = 0
              while (i < 8) {
                subblockFilter(up, cx + i, cy + 4, 0, 1, sbEdge, interior,
                  hevT)
                subblockFilter(vp, cx + i, cy + 4, 0, 1, sbEdge, interior,
                  hevT)
                i += 1
              }
            }
          }
        }
        mbx += 1
      }
      mby += 1
    }
  }
}
