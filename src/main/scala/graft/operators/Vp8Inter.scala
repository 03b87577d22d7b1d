package graft.operators

/** VP8 INTER-frame machinery — RFC 6386 §16-§18, from scratch: the
  * spec constants (motion-vector trees and default contexts, the
  * six-tap and bilinear sub-pixel filters, split-MV partition maps),
  * the near-MV survey (§16.3), MV component entropy coding (§17.2),
  * the boolean ENCODER (§7.3, the dual of [[Vp8]]'s decoder), an IVF
  * container walk, and a frame WRITER that assembles real interframe
  * bitstreams (a serializer of chosen modes/MVs, not an encoder —
  * the [[Mp3FramesWriter]] pattern).
  *
  * Conformance stance (FIXTURES.md): no VP8 video encoder exists in
  * this container (libwebp emits keyframes only; libvpx is absent),
  * so interframes cannot be pinned against a foreign encode. What IS
  * pinned: the sub-pixel filter taps re-verify structurally (each
  * kernel sums to 128 and position k mirrors position 8-k — the
  * printed-spec-anchor pattern of the MP3 synthesis window), the MC
  * arithmetic is reproduced by an independent spec-math
  * implementation in the spec tests (shared tables only, no code),
  * and whole-pipeline linearity holds on writer-assembled synthetic
  * MVs over a REAL libwebp keyframe (whose decode is byte-exact
  * against system libwebp). The residual that remains externally
  * unpinned — exactly the MP3-Huffman-assignment class of risk — is
  * the mode-context probability table and near-MV tie-breaking,
  * which writer and decoder share; COVERAGE.md records it.
  */
object Vp8Inter {

  // ---- spec constant tables (RFC 6386) ------------------------------

  /** §18.3.2: six-tap sub-pixel interpolation kernels, one per
    * eighth-pel position. Luma motion is quarter-pel so it uses the
    * even rows; chroma uses all eight. Structural anchors: every
    * kernel sums to 128 (unit DC gain after the +64 >> 7 rounding)
    * and kernel k is kernel 8-k reversed (Vp8InterSpec re-verifies
    * both, plus position 0 being the identity tap). */
  val SubpelFilters: Array[Array[Int]] = Array(
    Array(0, 0, 128, 0, 0, 0),
    Array(0, -6, 123, 12, -1, 0),
    Array(2, -11, 108, 36, -8, 1),
    Array(0, -9, 93, 50, -6, 0),
    Array(3, -16, 77, 77, -16, 3),
    Array(0, -6, 50, 93, -9, 0),
    Array(1, -8, 36, 108, -11, 2),
    Array(0, -1, 12, 123, -6, 0))

  /** §18.3.1: two-tap bilinear kernels (versions 1-3). */
  val BilinearFilters: Array[Array[Int]] = Array(
    Array(128, 0), Array(112, 16), Array(96, 32), Array(80, 48),
    Array(64, 64), Array(48, 80), Array(32, 96), Array(16, 112))

  // inter MB modes (continuing the intra ids 0-4 of Vp8.MbInfo.yMode)
  val ModeNearest = 5
  val ModeNear = 6
  val ModeZero = 7
  val ModeNew = 8
  val ModeSplit = 9

  /** §16.2: mv_ref tree over {ZERO, NEAREST, NEAR, NEW, SPLIT} in
    * this object's mode ids. */
  private[operators] val MvRefTree =
    Array(-ModeZero, 2, -ModeNearest, 4, -ModeNear, 6, -ModeNew,
      -ModeSplit)

  /** §16.2: probabilities for the mv_ref tree indexed by the per-node
    * near-MV count (0..5). The spec table carries two entries above
    * 255 (257 and 336 in the count-5 row); every deployed decoder
    * assigns them through an 8-bit probability type, so the wrapped
    * values (1, 80) are the de-facto constants and are stored here
    * directly. This row is reachable only with maximally-crowded
    * neighborhoods; it is part of the externally-unpinned residual
    * recorded in COVERAGE.md. */
  private[operators] val ModeContexts: Array[Array[Int]] = Array(
    Array(7, 1, 1, 143),
    Array(14, 18, 14, 107),
    Array(135, 64, 57, 68),
    Array(60, 56, 128, 65),
    Array(234, 160, 1, 1),
    Array(1, 80, 1, 2))

  // sub-MV refs (split partitions), §16.2
  val SubLeft = 0; val SubAbove = 1; val SubZero = 2; val SubNew = 3
  private[operators] val SubMvRefTree =
    Array(-SubLeft, 2, -SubAbove, 4, -SubZero, -SubNew)
  /** Context rows: NORMAL, LEFT_ZED, ABOVE_ZED, LEFT_ABOVE_SAME,
    * LEFT_ABOVE_ZED (§16.2 sub_mv_ref_prob2). */
  private[operators] val SubMvRefProbs: Array[Array[Int]] = Array(
    Array(147, 136, 18),
    Array(106, 145, 1),
    Array(179, 121, 1),
    Array(223, 1, 34),
    Array(208, 1, 1))

  /** §16.2: macroblock split partition maps: 0 = two horizontal
    * halves, 1 = two vertical halves, 2 = four quarters, 3 = all 16. */
  private[operators] val MbSplitTree = Array(-3, 2, -2, 4, -0, -1)
  private[operators] val MbSplitProbs = Array(110, 111, 150)
  private[operators] val MbSplitCount = Array(2, 2, 4, 16)
  private[operators] val MbSplits: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1),
    Array(0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1),
    Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15))

  /** §17.2: the short-MV tree (values 0..7) and the per-component
    * probability layout: [0] is_short, [1] sign, [2..8] short tree,
    * [9..18] long-vector bits. */
  private[operators] val SmallMvTree =
    Array(2, 8, 4, 6, -0, -1, -2, -3, 10, 12, -4, -5, -6, -7)
  private[operators] val MvDefaultProbs: Array[Array[Int]] = Array(
    Array(162, 128, 225, 146, 172, 147, 214, 39, 156,
      128, 129, 132, 75, 145, 178, 206, 239, 254, 254),
    Array(164, 128, 204, 170, 119, 235, 140, 230, 228,
      128, 130, 130, 74, 148, 180, 203, 236, 254, 254))
  private[operators] val MvUpdateProbs: Array[Array[Int]] = Array(
    Array(237, 246, 253, 253, 254, 254, 254, 254, 254,
      254, 254, 254, 254, 254, 250, 250, 252, 254, 254),
    Array(231, 243, 245, 253, 254, 254, 254, 254, 254,
      254, 254, 254, 254, 254, 251, 251, 254, 254, 254))

  /** §11.3: interframe intra mode probabilities (the trees are shared
    * with the keyframe parse; only the distributions differ) and the
    * fixed non-contextual B_PRED sub-mode probabilities. */
  private[operators] val InterYModeProbs = Array(112, 86, 140, 37)
  private[operators] val InterUvModeProbs = Array(162, 101, 204)
  private[operators] val InterBModeProbs =
    Array(120, 90, 79, 133, 87, 85, 80, 111, 151)
  /** Interframe ymode tree: {-DC, 2, 4, 6, -V, -H, -TM, -B} in the
    * decoder's mode ids (DC=0 V=1 H=2 TM=3 B_PRED=4). */
  private[operators] val InterYModeTree =
    Array(-0, 2, 4, 6, -1, -2, -3, -4)
  /** UV mode tree (same shape for key and inter frames, §11.2). */
  private[operators] val InterUvModeTree = Array(-0, 2, -1, 4, -2, -3)

  // ---- MV packing ---------------------------------------------------

  @inline private[operators] def packMv(row: Int, col: Int): Int =
    (row << 16) | (col & 0xffff)
  @inline private[operators] def mvRow(mv: Int): Int = mv >> 16
  @inline private[operators] def mvCol(mv: Int): Int = (mv << 16) >> 16

  /** §16.3 MV clamp: candidate MVs may point at most 16 pixels
    * outside the (macroblock-padded) frame. Units: eighth-pel. */
  private[operators] def clampMv(
      mv: Int, mbx: Int, mby: Int, mbW: Int, mbH: Int): Int = {
    val toLeft = -(mbx * 16) * 8 - 128
    val toRight = (mbW - 1 - mbx) * 16 * 8 + 128
    val toTop = -(mby * 16) * 8 - 128
    val toBottom = (mbH - 1 - mby) * 16 * 8 + 128
    var r = mvRow(mv); var c = mvCol(mv)
    if (c < toLeft) c = toLeft else if (c > toRight) c = toRight
    if (r < toTop) r = toTop else if (r > toBottom) r = toBottom
    packMv(r, c)
  }

  /** The MC-time clamp (§18.2, the "unextended-border" guard): an MV
    * whose read would start beyond 19 px outside is pulled back to
    * 16 px outside. Already-clamped candidates pass through. */
  private[operators] def clampMvMc(
      mv: Int, mbx: Int, mby: Int, mbW: Int, mbH: Int): Int = {
    val toLeft = -(mbx * 16) * 8
    val toRight = (mbW - 1 - mbx) * 16 * 8
    val toTop = -(mby * 16) * 8
    val toBottom = (mbH - 1 - mby) * 16 * 8
    var c = mvCol(mv); var r = mvRow(mv)
    if (c < toLeft - (19 * 8)) c = toLeft - (16 * 8)
    else if (c > toRight + (18 * 8)) c = toRight + (16 * 8)
    if (r < toTop - (19 * 8)) r = toTop - (16 * 8)
    else if (r > toBottom + (18 * 8)) r = toBottom + (16 * 8)
    packMv(r, c)
  }

  /** §16.3 find_near_mvs: survey above / left / above-left, dedupe
    * into up to three distinct MVs with weighted counts, sign-bias
    * flip for candidates coded against the other-bias reference,
    * near/nearest swap, best-MV promotion, and the 16-px clamp.
    * Returns (best, nearest, near, cnt[4]) — cnt[3] is the split
    * count after the spec's post-pass. Neighbor arrays are indexed
    * mby*mbW+mbx; out-of-frame neighbors read as intra (ref 0, mv 0),
    * matching the padded mode-info border of the reference layout. */
  private[operators] def findNearMvs(
      mbx: Int, mby: Int, mbW: Int, mbH: Int, refFrame: Int,
      refs: Array[Int], modes: Array[Int], mvs: Array[Int],
      signBias: Array[Int]): (Int, Int, Int, Array[Int]) = {
    val cnt = new Array[Int](4)
    val near = new Array[Int](4) // slot 0 unused accumulator base
    var nDistinct = 0
    def biasOf(rf: Int): Int = signBias(rf)
    def candidate(nx: Int, ny: Int, weight: Int): Unit = {
      if (nx < 0 || ny < 0) { // outside: intra border, contributes 0
        return
      }
      val i = ny * mbW + nx
      if (refs(i) == 0) return // intra neighbor
      var mv = mvs(i)
      if (mv != 0) {
        if (biasOf(refs(i)) != biasOf(refFrame))
          mv = packMv(-mvRow(mv), -mvCol(mv))
        if (nDistinct == 0 || mv != near(nDistinct)) {
          nDistinct += 1
          near(nDistinct) = mv
        }
        cnt(nDistinct) += weight
      } else cnt(0) += weight
    }
    candidate(mbx, mby - 1, 2)
    candidate(mbx - 1, mby, 2)
    candidate(mbx - 1, mby - 1, 1)
    // a third distinct equal to the first boosts nearest
    if (nDistinct == 3 && near(3) == near(1)) cnt(1) += 1
    // split count replaces the third slot
    def isSplit(nx: Int, ny: Int): Int =
      if (nx < 0 || ny < 0) 0
      else if (modes(ny * mbW + nx) == ModeSplit) 1 else 0
    cnt(3) = (isSplit(mbx, mby - 1) + isSplit(mbx - 1, mby)) * 2 +
      isSplit(mbx - 1, mby - 1)
    // swap near/nearest if near saw more weight
    if (cnt(2) > cnt(1)) {
      val t = cnt(1); cnt(1) = cnt(2); cnt(2) = t
      val m = near(1); near(1) = near(2); near(2) = m
    }
    // best = nearest when it outweighs the zero/intra count
    val best = if (cnt(1) >= cnt(0)) near(1) else near(0)
    (clampMv(best, mbx, mby, mbW, mbH),
      clampMv(near(1), mbx, mby, mbW, mbH),
      clampMv(near(2), mbx, mby, mbW, mbH), cnt)
  }

  /** §16.2: sub-MV reference context from the left/above 4x4 MVs. */
  private[operators] def subMvContext(lmv: Int, amv: Int): Int =
    if (lmv == amv) { if (lmv == 0) 4 else 3 }
    else if (amv == 0) 2
    else if (lmv == 0) 1
    else 0

  /** §18.2: chroma MV from a luma MV — halved with round-away-from-
    * zero (chroma pixels sit at twice the luma spacing, so eighth-
    * chroma-pel units are half the eighth-luma-pel value). */
  private[operators] def chromaMv(v: Int): Int =
    if (v < 0) (v - 1) / 2 else (v + 1) / 2

  /** §18.2 split chroma MV: sum of the four covering luma sub-MVs,
    * rounded away from zero, over 8. */
  private[operators] def chromaMvSplit(sum: Int): Int =
    (if (sum < 0) sum - 4 else sum + 4) / 8

  // ---- §7.3 boolean encoder -----------------------------------------

  /** The arithmetic bool encoder, dual of [[Vp8]]'s decoder: same
    * split arithmetic, byte-at-a-time emission with carry
    * propagation. Flush pushes 32 zero bits through the normal path,
    * which emits every pending byte; the decoder only consumes the
    * bits that were actually coded, so trailing zeros are inert. */
  private[operators] final class BoolEnc {
    private var range = 255
    private var bottom = 0L
    private var bitCount = 24
    private val out = new java.io.ByteArrayOutputStream()

    def put(bit: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & (1L << 31)) != 0) {
          // carry into already-emitted bytes
          val b = out.toByteArray
          var i = b.length - 1
          while (i >= 0 && b(i) == -1) { b(i) = 0; i -= 1 }
          if (i >= 0) b(i) = (b(i) + 1).toByte
          out.reset(); out.write(b, 0, b.length)
        }
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out.write(((bottom >> 24) & 0xff).toInt)
          bottom &= 0xffffff
          bitCount = 8
        }
      }
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { put((v >> i) & 1, 128); i -= 1 }
    }

    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { put(0, 128); i += 1 }
      out.toByteArray
    }
  }

  /** §17.2: write one MV component (eighth-pel value, pre-doubling —
    * the caller passes v/2 of the stored eighth-pel value). */
  private[operators] def writeMvComponent(
      e: BoolEnc, v: Int, probs: Array[Int], off: Int): Unit = {
    val x = math.abs(v)
    require(x < 1024, s"mv component $v out of range")
    if (x < 8) {
      e.put(0, probs(off)) // is_short = short
      // small tree: probs at off+2
      writeTreePath(e, SmallMvTree, probs, off + 2, x)
    } else {
      e.put(1, probs(off))
      var i = 0
      while (i < 3) { e.put((x >> i) & 1, probs(off + 9 + i)); i += 1 }
      i = 9
      while (i > 3) { e.put((x >> i) & 1, probs(off + 9 + i)); i -= 1 }
      if ((x & 0xfff0) != 0) e.put((x >> 3) & 1, probs(off + 9 + 3))
      else require((x & 8) != 0, "long mv below 8")
    }
    if (x != 0) e.put(if (v < 0) 1 else 0, probs(off + 1))
  }

  /** Tree writer over a probs array with a base offset (node k uses
    * probs(off + k/2)). */
  private[operators] def writeTreePath(
      e: BoolEnc, t: Array[Int], probs: Array[Int], off: Int,
      leaf: Int): Unit = {
    def path(node: Int, acc: List[(Int, Int)]): List[(Int, Int)] = {
      var found: List[(Int, Int)] = Nil
      var bit = 0
      while (bit < 2 && found.isEmpty) {
        val nxt = t(node + bit)
        if (nxt == -leaf) found = ((node, bit) :: acc).reverse
        else if (nxt > 0) found = path(nxt, (node, bit) :: acc)
        bit += 1
      }
      found
    }
    val p = path(0, Nil)
    require(p.nonEmpty, s"leaf $leaf not in tree")
    p.foreach { case (node, bit) => e.put(bit, probs(off + node / 2)) }
  }

  // ---- IVF container (libvpx's simple public fixture format) --------

  /** Parse an IVF file ("DKIF", VP80): returns (width, height, frame
    * byte ranges). */
  def parseIvf(b: Array[Byte]): Option[(Int, Int, Seq[(Int, Int)])] = {
    if (b == null || b.length < 32) return None
    if (b(0) != 'D' || b(1) != 'K' || b(2) != 'I' || b(3) != 'F')
      return None
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (u16(4) != 0) return None // version
    val hdrLen = u16(6)
    if (!(b(8) == 'V' && b(9) == 'P' && b(10) == '8' && b(11) == '0'))
      return None
    val w = u16(12); val h = u16(14)
    val frames = Seq.newBuilder[(Int, Int)]
    var pos = hdrLen
    while (pos + 12 <= b.length) {
      val len = u32(pos)
      if (len < 0 || pos + 12 + len > b.length) return None
      frames += ((pos + 12, len))
      pos += 12 + len
    }
    if (pos != b.length) return None
    Some((w, h, frames.result()))
  }

  /** Wrap raw VP8 frame payloads as IVF. */
  def buildIvf(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    out.write('D'); out.write('K'); out.write('I'); out.write('F')
    u16(0); u16(32)
    out.write('V'); out.write('P'); out.write('8'); out.write('0')
    u16(w); u16(h)
    u32(30); u32(1) // timebase den/num
    u32(frames.length); u32(0)
    frames.zipWithIndex.foreach { case (f, i) =>
      u32(f.length); u32(i); u32(0) // 64-bit pts (low, high)
      out.write(f)
    }
    out.toByteArray
  }

  /** Decode every frame of an IVF stream (frame 0 must be a
    * keyframe). None on any malformed or out-of-subset frame. */
  def decodeIvf(b: Array[Byte]): Option[Seq[Vp8.Yuv]] =
    try {
      parseIvf(b).flatMap { case (_, _, frames) =>
        Vp8.decodeSequence(b, frames)
      }
    } catch { case _: Exception => None }

  // ---- interframe writer --------------------------------------------

  /** One macroblock's chosen inter fields. `mode` is a Mode* id;
    * `mv` (eighth-pel packed) is required for NEW (the delta is
    * derived against the spec-predicted best MV); `subMvs` gives the
    * 16 per-4x4 MVs for SPLIT with `splitKind` the partition map id
    * (every 4x4 of one partition must share its partition's MV).
    * `acY` (±1; needs nParts > 1 and a non-SPLIT mode) codes one
    * quantized AC coefficient at position 1 of luma block 0 — the
    * minimal CONTENT-bearing residual, so the inter predict + residue
    * composition and the inter-path dequant become pinnable.
    * `intraYMode` (0-3, not B_PRED) makes the MB INTRA-coded inside
    * the interframe — the §11.3 inter-frame intra parse path (frame-
    * level mode probabilities, not the keyframe's contextual trees);
    * `mode`/`mv` are ignored then and uv is DC. */
  final case class WMb(
      mode: Int,
      refFrame: Int = 1, // 1 last, 2 golden, 3 altref
      mv: Int = 0,
      splitKind: Int = 3,
      subMvs: Array[Int] = null,
      acY: Int = 0,
      intraYMode: Int = -1,
      bModes: Array[Int] = null) // 16 sub-modes when intraYMode == 4

  /** Segmentation header block for [[buildInterFrame]] (r13): the
    * §9.3 syntax. With `updateMap`, `map` (one segment id per MB)
    * is recoded with the default (255) tree probabilities; with
    * `updateData`, `quant`/`lf` give the four per-segment feature
    * values (`absDelta` selects absolute vs delta semantics). A
    * frame with neither update flag — `WSeg()` — is the normal
    * encoder output this writer exists to pin: segmentation stays
    * enabled and the decoder must reuse the INHERITED map and
    * feature data. */
  final case class WSeg(
      updateMap: Boolean = false,
      updateData: Boolean = false,
      absDelta: Boolean = false,
      quant: Array[Int] = Array(0, 0, 0, 0),
      lf: Array[Int] = Array(0, 0, 0, 0),
      map: Array[Int] = null)

  private val SegTreeDefault = Array(255, 255, 255)

  /** Assemble one interframe: no segmentation, loop filter off,
    * every MB inter-coded with the given modes/MVs and NO residual
    * energy. With `nParts = 1` (default) every MB is skipped and the
    * single token partition is empty. With `nParts` 2/4/8 the frame
    * instead codes mb_no_coeff_skip = 0, so EVERY block of every MB
    * reads its end-of-block decision from the token partition of its
    * MB row (§9.5: partition `row % nParts`) — one bit per block,
    * written here per-partition with the default coefficient
    * probabilities. That makes the multi-partition machinery (sizes
    * table, per-row partition selection, independent bit streams)
    * load-bearing for the first time: libwebp never emits more than
    * one token partition, so this writer is the only source of such
    * streams in this container. The near-MV survey, the mode-context
    * probabilities and the MV entropy coder are shared with the
    * decoder (tables and procedures only — the decoder's bitstream
    * reader never sees this code). */
  def buildInterFrame(
      mbW: Int, mbH: Int, mbs: Array[WMb],
      refreshGolden: Boolean = false, refreshAlt: Boolean = false,
      refreshLast: Boolean = true,
      signBiasGolden: Int = 0, signBiasAlt: Int = 0,
      version: Int = 0, nParts: Int = 1,
      seg: WSeg = null,
      filterLevel: Int = 0,
      lfDeltaEnabled: Boolean = false,
      lfDeltaUpdate: Array[Int] = null, // 8 = ref(4) ++ mode(4)
      copyGolden: Int = 0, copyAlt: Int = 0): Array[Byte] = {
    require(version >= 0 && version <= 3, "vp8 version 0-3")
    require(Seq(1, 2, 4, 8).contains(nParts), "1/2/4/8 token partitions")
    require(mbs.length == mbW * mbH, "one WMb per macroblock")
    require(copyGolden >= 0 && copyGolden <= 2 && !(copyGolden != 0 &&
      refreshGolden), "copyGolden only without refreshGolden")
    require(copyAlt >= 0 && copyAlt <= 2 && !(copyAlt != 0 &&
      refreshAlt), "copyAlt only without refreshAlt")
    require(seg == null || !seg.updateMap ||
      (seg.map != null && seg.map.length == mbW * mbH &&
        seg.map.forall(s => s >= 0 && s < 4)),
      "updateMap needs a per-MB segment id array")
    require(lfDeltaUpdate == null ||
      (lfDeltaEnabled && lfDeltaUpdate.length == 8),
      "lfDeltaUpdate: 8 entries, only with lfDeltaEnabled")
    val e = new BoolEnc
    // ---- frame header (§9) ----
    def signedIf(v: Int, n: Int): Unit = {
      if (v == 0) e.put(0, 128)
      else {
        e.put(1, 128)
        e.literal(math.abs(v), n)
        e.put(if (v < 0) 1 else 0, 128)
      }
    }
    if (seg == null) e.put(0, 128) // segmentation disabled
    else {
      e.put(1, 128)
      e.put(if (seg.updateMap) 1 else 0, 128)
      e.put(if (seg.updateData) 1 else 0, 128)
      if (seg.updateData) {
        e.put(if (seg.absDelta) 1 else 0, 128)
        seg.quant.foreach(signedIf(_, 7))
        seg.lf.foreach(signedIf(_, 6))
      }
      if (seg.updateMap) {
        var k = 0
        while (k < 3) { e.put(0, 128); k += 1 } // default tree probs
      }
    }
    e.literal(0, 1) // normal loop filter
    e.literal(filterLevel, 6)
    e.literal(0, 3) // sharpness
    if (!lfDeltaEnabled) e.put(0, 128) // no lf deltas
    else {
      e.put(1, 128)
      if (lfDeltaUpdate == null) e.put(0, 128) // enabled, no update
      else {
        e.put(1, 128)
        lfDeltaUpdate.foreach { d =>
          e.put(1, 128)
          e.literal(math.abs(d), 6)
          e.put(if (d < 0) 1 else 0, 128)
        }
      }
    }
    e.literal(Integer.numberOfTrailingZeros(nParts), 2) // log2(nParts)
    e.literal(40, 7) // y_ac_qi (the acY residue dequant base)
    var i = 0
    while (i < 5) { e.put(0, 128); i += 1 } // no quant deltas
    e.put(if (refreshGolden) 1 else 0, 128)
    e.put(if (refreshAlt) 1 else 0, 128)
    if (!refreshGolden) e.literal(copyGolden, 2)
    if (!refreshAlt) e.literal(copyAlt, 2)
    e.put(signBiasGolden, 128)
    e.put(signBiasAlt, 128)
    e.put(1, 128) // refresh_entropy_probs
    e.put(if (refreshLast) 1 else 0, 128)
    // coefficient probability updates: none
    i = 0
    while (i < 1056) {
      e.put(0, graft.functions.Vp8Tables.CoeffUpdateProbs(i)); i += 1
    }
    val probSkipFalse = 1 // P(skip=1) = 255/256: skip bits are cheap
    val useSkip = nParts == 1
    e.put(if (useSkip) 1 else 0, 128) // mb_no_coeff_skip
    if (useSkip) e.literal(probSkipFalse, 8)
    val probIntra = 1 // P(inter) = 255/256
    val probLast = 128
    val probGf = 128
    e.literal(probIntra, 8)
    e.literal(probLast, 8)
    e.literal(probGf, 8)
    e.put(0, 128) // no ymode prob update
    e.put(0, 128) // no uvmode prob update
    var c = 0
    while (c < 2) {
      i = 0
      while (i < 19) { e.put(0, MvUpdateProbs(c)(i)); i += 1 }
      c += 1
    }
    // ---- per-MB modes (§16) ----
    val signBias = Array(0, 0, signBiasGolden, signBiasAlt)
    val refs = new Array[Int](mbW * mbH)
    val modes = new Array[Int](mbW * mbH)
    val mvs = new Array[Int](mbW * mbH)
    val sub = Array.ofDim[Int](mbW * mbH, 16)
    var mby = 0
    while (mby < mbH) {
      var mbx = 0
      while (mbx < mbW) {
        val idx = mby * mbW + mbx
        val m = mbs(idx)
        if (seg != null && seg.updateMap) // segment id precedes skip
          writeTreePath(e, Vp8.SegmentTree, SegTreeDefault, 0,
            seg.map(idx))
        if (useSkip) e.put(1, probSkipFalse) // mb_skip_coeff = true
        if (m.intraYMode >= 0) {
          require(m.intraYMode <= 4, "intra y mode 0-4")
          require(m.intraYMode < 4 || (m.bModes != null &&
            m.bModes.length == 16 &&
            m.bModes.forall(b => b >= 0 && b <= 9)),
            "B_PRED needs 16 sub-modes 0-9")
          require(m.acY == 0, "intra MBs carry no acY here")
          e.put(0, probIntra) // intra MB inside the interframe
          writeTreePath(e, InterYModeTree, InterYModeProbs, 0,
            m.intraYMode)
          if (m.intraYMode == 4) {
            // B_PRED sub-modes: the FIXED non-contextual interframe
            // distribution (§11.3) — unlike the keyframe path, no
            // above/left mode contexts are consulted (r13)
            var sb2 = 0
            while (sb2 < 16) {
              writeTreePath(e, Vp8.BModeTree, InterBModeProbs, 0,
                m.bModes(sb2))
              sb2 += 1
            }
          }
          writeTreePath(e, InterUvModeTree, InterUvModeProbs, 0, 0)
          refs(idx) = 0
          modes(idx) = m.intraYMode
          mvs(idx) = 0
          java.util.Arrays.fill(sub(idx), 0)
          mbx += 1
        } else {
        e.put(1, probIntra) // inter
        if (m.refFrame == 1) e.put(0, probLast)
        else {
          e.put(1, probLast)
          e.put(if (m.refFrame == 3) 1 else 0, probGf)
        }
        val (best, nearest, near, cnt) = findNearMvs(
          mbx, mby, mbW, mbH, m.refFrame, refs, modes, mvs, signBias)
        val p = Array(ModeContexts(cnt(0))(0), ModeContexts(cnt(1))(1),
          ModeContexts(cnt(2))(2), ModeContexts(cnt(3))(3))
        writeTreePath(e, MvRefTree, p, 0, m.mode)
        var mbMv = 0
        m.mode match {
          case ModeZero => mbMv = 0
          case ModeNearest => mbMv = nearest
          case ModeNear => mbMv = near
          case ModeNew =>
            // the stream carries the DELTA against best, halved (the
            // decoder doubles each component back)
            val dr = mvRow(m.mv) - mvRow(best)
            val dc = mvCol(m.mv) - mvCol(best)
            require((dr & 1) == 0 && (dc & 1) == 0,
              "NEW mv delta must be even (quarter-pel luma)")
            writeMvComponent(e, dr / 2, MvDefaultProbs(0), 0)
            writeMvComponent(e, dc / 2, MvDefaultProbs(1), 0)
            mbMv = m.mv
          case ModeSplit =>
            writeTreePath(e, MbSplitTree, MbSplitProbs, 0, m.splitKind)
            val map = MbSplits(m.splitKind)
            val nPart = MbSplitCount(m.splitKind)
            val done = new Array[Boolean](nPart)
            var k = 0
            while (k < 16) {
              val part = map(k)
              if (!done(part)) {
                done(part) = true
                val want = m.subMvs(k)
                // left/above 4x4 MVs in decode order
                val lmv = if ((k & 3) != 0) sub(idx)(k - 1)
                  else if (mbx == 0) 0
                  else if (modes(idx - 1) == ModeSplit) sub(idx - 1)(k + 3)
                  else mvs(idx - 1)
                val amv = if ((k >> 2) != 0) sub(idx)(k - 4)
                  else if (mby == 0) 0
                  else if (modes(idx - mbW) == ModeSplit)
                    sub(idx - mbW)(k + 12)
                  else mvs(idx - mbW)
                val ctx = subMvContext(lmv, amv)
                val leaf =
                  if (want == lmv) SubLeft
                  else if (want == amv) SubAbove
                  else if (want == 0) SubZero
                  else SubNew
                writeTreePath(e, SubMvRefTree, SubMvRefProbs(ctx), 0, leaf)
                if (leaf == SubNew) {
                  val dr = mvRow(want) - mvRow(best)
                  val dc = mvCol(want) - mvCol(best)
                  require((dr & 1) == 0 && (dc & 1) == 0,
                    "sub mv delta must be even")
                  writeMvComponent(e, dr / 2, MvDefaultProbs(0), 0)
                  writeMvComponent(e, dc / 2, MvDefaultProbs(1), 0)
                }
                // propagate this partition's MV to all its 4x4s
                var j = 0
                while (j < 16) {
                  if (map(j) == part) sub(idx)(j) = want
                  j += 1
                }
              }
              k += 1
            }
            mbMv = sub(idx)(15)
        }
        refs(idx) = m.refFrame
        modes(idx) = m.mode
        mvs(idx) = mbMv
        if (m.mode != ModeSplit) java.util.Arrays.fill(sub(idx), mbMv)
        mbx += 1
        }
      }
      mby += 1
    }
    val part0 = e.finish()
    require(part0.length < (1 << 19), "part0 too large for the tag")
    // frame tag: interframe (bit0=1), version, show_frame, len<<5
    val tag = 1 | (version << 1) | (1 << 4) | (part0.length << 5)
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff)
    out.write((tag >> 16) & 0xff)
    out.write(part0, 0, part0.length)
    // token partitions (§9.5): empty when every MB is skipped (the
    // decoder never opens them); otherwise each MB row's blocks write
    // ONE end-of-block bit per block into the partition row % nParts
    // with the default coefficient probabilities — all-zero residue,
    // but the partition plumbing (sizes table, per-row selection,
    // independent streams) becomes load-bearing
    val partBytes: Array[Array[Byte]] =
      if (useSkip) Array(new Array[Byte](0))
      else {
        val cp = graft.functions.Vp8Tables.CoeffProbs
        val encs = Array.fill(nParts)(new BoolEnc)
        var my = 0
        while (my < mbH) {
          val pe = encs(my % nParts)
          var mx = 0
          while (mx < mbW) {
            val m = mbs(my * mbW + mx)
            // B_PRED MBs have no Y2 block (same rule the decoder
            // applies: yMode 4 and SPLIT skip the WHT plane)
            val hasY2 =
              if (m.intraYMode >= 0) m.intraYMode < 4
              else m.mode != ModeSplit
            require(m.acY == 0 || hasY2, "acY needs a non-SPLIT mode")
            // probability offsets: type*264 + (band(n)*3 + ctx)*11.
            // All cross-MB nonzero contexts stay 0: the only nonzero
            // block is block 0, which sits in neither the bottom row
            // nor the right column of its MB, so nothing propagates
            // into the above/left context arrays.
            if (hasY2) pe.put(0, cp(1 * 264)) // Y2: band 0, ctx 0
            val yOff = if (hasY2) 0 * 264 + (1 * 3) * 11 // band(1) = 1
              else 3 * 264 // no-Y2 Y: band 0
            if (m.acY != 0) {
              // block 0 codes ONE at n=1 (band 1, ctx 0): not-EOB,
              // not-ZERO, token ONE, sign; then EOB at n=2 (band
              // Bands(2)=2, ctx 1 after a just-coded one)
              pe.put(1, cp(yOff))
              pe.put(1, cp(yOff + 1))
              pe.put(0, cp(yOff + 2))
              pe.put(if (m.acY < 0) 1 else 0, 128)
              pe.put(0, cp(0 * 264 + (2 * 3 + 1) * 11))
              // blocks 1 and 4 see the nonzero neighbor: ctx 1
              val yOffC1 = 0 * 264 + (1 * 3 + 1) * 11
              var k = 1
              while (k < 16) {
                pe.put(0, cp(if (k == 1 || k == 4) yOffC1 else yOff))
                k += 1
              }
            } else {
              var k = 0
              while (k < 16) { pe.put(0, cp(yOff)); k += 1 }
            }
            var k = 0
            while (k < 8) { pe.put(0, cp(2 * 264)); k += 1 }
            mx += 1
          }
          my += 1
        }
        encs.map(_.finish())
      }
    var pi = 0
    while (pi < partBytes.length - 1) {
      val sz = partBytes(pi).length
      out.write(sz & 0xff); out.write((sz >> 8) & 0xff)
      out.write((sz >> 16) & 0xff)
      pi += 1
    }
    partBytes.foreach(pb => out.write(pb, 0, pb.length))
    out.toByteArray
  }
}
