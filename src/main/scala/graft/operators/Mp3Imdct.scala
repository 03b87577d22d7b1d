package graft.operators

/** Hybrid-filterbank IMDCT for Layer III (ISO 11172-3 2.4.3.4.10.2):
  * 36-point IMDCT + block-type window for long blocks, three 12-point
  * IMDCTs at 6-sample offsets for short blocks. Direct-sum evaluation
  * with precomputed cosine/window tables — the spec's defining
  * formulas, pinned against a naive re-evaluation in the spec tests. */
object Mp3Imdct {

  // cos(pi/72 * (2n+1+18) * (2k+1)), n 0..35, k 0..17
  private val CosLong: Array[Array[Double]] = Array.tabulate(36, 18) {
    (n, k) => math.cos(math.Pi / 72.0 * (2 * n + 1 + 18) * (2 * k + 1))
  }
  // cos(pi/24 * (2n+1+6) * (2k+1)), n 0..11, k 0..5
  private val CosShort: Array[Array[Double]] = Array.tabulate(12, 6) {
    (n, k) => math.cos(math.Pi / 24.0 * (2 * n + 1 + 6) * (2 * k + 1))
  }

  /** Block-type windows (2.4.3.4.10.3): 0 normal, 1 start, 3 stop —
    * 36 points; 2 is the 12-point short window. */
  private val Win: Array[Array[Double]] = {
    val w = Array.ofDim[Double](4, 36)
    var n = 0
    while (n < 36) {
      w(0)(n) = math.sin(math.Pi / 36.0 * (n + 0.5))
      w(1)(n) =
        if (n < 18) math.sin(math.Pi / 36.0 * (n + 0.5))
        else if (n < 24) 1.0
        else if (n < 30) math.sin(math.Pi / 12.0 * (n - 18 + 0.5))
        else 0.0
      w(3)(n) =
        if (n < 6) 0.0
        else if (n < 12) math.sin(math.Pi / 12.0 * (n - 6 + 0.5))
        else if (n < 18) 1.0
        else math.sin(math.Pi / 36.0 * (n + 0.5))
      n += 1
    }
    n = 0
    while (n < 12) { w(2)(n) = math.sin(math.Pi / 12.0 * (n + 0.5)); n += 1 }
    w
  }

  private val Zero36 = new Array[Double](36)

  /** IMDCT + window one 18-line subband block (lines xr[18sb..18sb+17])
    * of the given block type into 36 windowed time samples. A null or
    * all-zero spectrum short-circuits to zeros (the silence path). */
  def imdctBlock(xr: Array[Double], sb: Int, blockType: Int): Array[Double] = {
    if (xr == null) return Zero36
    val base = 18 * sb
    var allZero = true
    var k = 0
    while (k < 18 && allZero) {
      if (xr(base + k) != 0.0) allZero = false
      k += 1
    }
    if (allZero) return Zero36
    val out = new Array[Double](36)
    if (blockType == 2) {
      // three 12-point windows at offsets 6/12/18; input lines are
      // window-interleaved after reorder: in_w[k] = xr[base + 3k + w]
      var w = 0
      while (w < 3) {
        var n = 0
        while (n < 12) {
          var s = 0.0
          var kk = 0
          while (kk < 6) {
            s += xr(base + 3 * kk + w) * CosShort(n)(kk)
            kk += 1
          }
          out(6 + 6 * w + n) += s * Win(2)(n)
          n += 1
        }
        w += 1
      }
    } else {
      val win = Win(blockType)
      var n = 0
      while (n < 36) {
        var s = 0.0
        var kk = 0
        while (kk < 18) {
          s += xr(base + kk) * CosLong(n)(kk)
          kk += 1
        }
        out(n) = s * win(n)
        n += 1
      }
    }
    out
  }
}
