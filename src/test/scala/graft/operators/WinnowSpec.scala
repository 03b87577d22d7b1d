package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Winnowing: the detection guarantee, a brute-force reference
  * replay, robustness to prefix shifts, and the small-input edges. */
class WinnowSpec extends AnyFunSuite {

  private def words(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(i * 7 + seed * 13) % 40}").mkString(" ")

  test("any shared run of >= w + k - 1 tokens shares a fingerprint") {
    val k = 4; val w = 5
    val shared = (0 until k + w - 1).map(i => s"shared$i").mkString(" ")
    for (s <- 0 until 10) {
      val a = words(s, 30) + " " + shared + " " + words(s + 1, 25)
      val b = words(s + 2, 40) + " " + shared + " " + words(s + 3, 15)
      val fa = Winnow.fingerprints(a, k, w).map(_.hash).toSet
      val fb = Winnow.fingerprints(b, k, w).map(_.hash).toSet
      assert((fa intersect fb).nonEmpty, s"seed $s")
    }
  }

  test("selection matches a brute-force reference (rightmost min per " +
    "window, consecutive dedupe)") {
    val text = words(3, 60)
    val k = 4; val w = 5
    val toks = text.split(" ")
    val hashes = (0 to toks.length - k).map { i =>
      graft.functions.HashMix.portableHash61(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          toks.slice(i, i + k).mkString(" ")))
    }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var last = -1
    for (j <- 0 to hashes.length - w) {
      val win = (j until j + w)
      val mn = win.map(hashes).min
      val pos = win.filter(hashes(_) == mn).max
      if (pos != last) { expect += ((pos, hashes(pos))); last = pos }
    }
    assert(Winnow.fingerprints(text, k, w).map(f => (f.pos, f.hash))
      .toSeq == expect.toSeq)
  }

  test("a prefix insertion shifts positions but keeps the hashes — " +
    "the robustness fixed blocking lacks") {
    val base = words(9, 80)
    val shifted = "x1 x2 x3 " + base
    val a = Winnow.fingerprints(base, 4, 5).map(_.hash).toSet
    val b = Winnow.fingerprints(shifted, 4, 5).map(_.hash).toSet
    assert((a intersect b).size >= a.size - 3)
  }

  test("edges: fewer than k tokens is empty, exactly k is one " +
    "fingerprint, fewer grams than w uses one window") {
    assert(Winnow.fingerprints("a b c", 4, 5).isEmpty)
    assert(Winnow.fingerprints(null, 4, 5).isEmpty)
    assert(Winnow.fingerprints("", 4, 5).isEmpty)
    val one = Winnow.fingerprints("a b c d", 4, 5)
    assert(one.length == 1 && one(0).pos == 0)
    // 6 tokens -> 3 grams < w=5 -> single window over all three
    val few = Winnow.fingerprints("a b c d e f", 4, 5)
    assert(few.length == 1)
  }
}
