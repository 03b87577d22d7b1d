package graft.operators

import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
  * MOSS algorithm): the position-robust document fingerprint behind
  * plagiarism/near-copy detection. Token k-grams are hashed
  * (SQL-portable [[graft.functions.HashMix.portableHash61]], so an
  * external oracle recomputes every fingerprint), then each window
  * of `w` consecutive gram hashes selects its minimum — RIGHTMOST
  * on ties, the paper's rule — and consecutive selections dedupe.
  * Guarantee: any shared run of at least w + k − 1 tokens between
  * two documents shares at least one fingerprint.
  *
  * Pure per-row map (the fingerprint of a document depends on that
  * document alone); cross-doc matching is then a groupBy on the
  * fingerprint hash — the inverted-index shape, never all-pairs. */
object Winnow {

  final case class Fp(pos: Int, hash: Long)

  /** Selected (gram position, gram hash) fingerprints in position
    * order. Fewer than k tokens → empty; fewer than w grams → one
    * window over all grams. */
  def fingerprints(text: String, k: Int, w: Int): Array[Fp] = {
    require(k >= 1 && w >= 1, s"k=$k w=$w")
    if (text == null) return Array.empty
    val toks = text.split(" ", -1)
    val m = toks.length - k + 1
    if (m <= 0 || text.isEmpty) return Array.empty
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      hashes(i) = graft.functions.HashMix.portableHash61(
        UTF8String.fromString(sb.toString))
      i += 1
    }
    val nWin = math.max(m - w + 1, 1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Fp]
    var lastPos = -1
    var j = 0
    while (j < nWin) {
      val end = math.min(j + w, m)
      var best = j
      var p = j + 1
      while (p < end) {
        if (hashes(p) <= hashes(best)) best = p // rightmost min
        p += 1
      }
      if (best != lastPos) {
        out += Fp(best, hashes(best))
        lastPos = best
      }
      j += 1
    }
    out.toArray
  }
}
