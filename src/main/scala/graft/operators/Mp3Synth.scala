package graft.operators

import graft.functions.Mp3Tables

/** The 32-band polyphase synthesis filterbank shared by all MPEG-1/2
  * audio layers (ISO 11172-3 §2.4.3.2 / Annex 3-A.2): shift the V
  * FIFO by 64, matrix the 32 subband samples by
  * N(i,k) = cos((16+i)(2k+1)pi/64), select U from alternating V
  * half-blocks, window by D (Table 3-B.3, [[Mp3Tables.SynthWindow]])
  * and sum 16 taps per output sample. Direct evaluation; pinned
  * against the spec's flowchart re-derivation and the near-PR
  * analysis/synthesis cascade in the spec tests. */
object Mp3Synth {

  private val N: Array[Array[Double]] = Array.tabulate(64, 32) {
    (i, k) => math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0)
  }

  /** One granule slot: 32 subband samples -> 32 PCM doubles written
    * into `out` at `outOff` with `stride` (channel interleave). `v` is
    * the channel's persistent 1024-double FIFO, mutated. */
  def synth(v: Array[Double], s: Array[Double], out: Array[Double],
      outOff: Int, stride: Int): Unit = {
    // shift the FIFO by 64 (newest at the front)
    System.arraycopy(v, 0, v, 64, 960)
    var i = 0
    while (i < 64) {
      var acc = 0.0
      val ni = N(i)
      var k = 0
      while (k < 32) { acc += ni(k) * s(k); k += 1 }
      v(i) = acc
      i += 1
    }
    val d = Mp3Tables.SynthWindow
    var j = 0
    while (j < 32) {
      var acc = 0.0
      var b = 0
      while (b < 8) {
        // U[64b + j]      = V[128b + j]       windowed by D[64b + j]
        // U[64b + 32 + j] = V[128b + 96 + j]  windowed by D[64b+32+j]
        acc += v(128 * b + j) * d(64 * b + j)
        acc += v(128 * b + 96 + j) * d(64 * b + 32 + j)
        b += 1
      }
      out(outOff + j * stride) = acc
      j += 1
    }
  }
}
