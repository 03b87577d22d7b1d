package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Distributed suffix array: per-position maximal repeat lengths must
  * equal an independent brute force (all substring lengths counted
  * corpus-wide); the SA-derived coverage spans must equal the k-gram
  * [[SubstrDedup.dupSpans]] rows exactly (two different algorithms,
  * one provable answer); cap semantics and full-suffix ties (identical
  * documents) must hold. */
class SuffixArraySpec extends SparkTestBase {

  import spark.implicits._

  // known repeats: the 6-token phrase "p q r s t u" shared by docs
  // 0/1 (maximal length 6), an intra-doc 4-gram repeat in doc 3,
  // doc 5 a verbatim copy of doc 2 (full-suffix ties), doc 4 shorter
  // than any k
  private lazy val corpus = Seq(
    (0L, "a b c p q r s t u x y z"),
    (1L, "m n p q r s t u o w"),
    (2L, "unique words only here nothing repeats at all"),
    (3L, "e f g h e f g h tail"),
    (4L, "sh"),
    (5L, "unique words only here nothing repeats at all")
  ).toDF("doc_id", "text")

  private lazy val rows: Seq[(Long, String)] = Seq(
    (0L, "a b c p q r s t u x y z"),
    (1L, "m n p q r s t u o w"),
    (2L, "unique words only here nothing repeats at all"),
    (3L, "e f g h e f g h tail"),
    (4L, "sh"),
    (5L, "unique words only here nothing repeats at all"))

  /** Independent maximal-repeat brute force: for every position the
    * longest prefix of its suffix appearing >= 2 times corpus-wide. */
  private def brute(k: Int, cap: Int): Map[(Long, Long), Long] = {
    val toks = rows.map { case (id, t) => id -> t.split(" ", -1) }
    val all = for {
      (id, ts) <- toks
      p <- ts.indices
      l <- 1 to math.min(cap, ts.length - p)
    } yield ((id, p.toLong, l.toLong), ts.slice(p, p + l).mkString(" "))
    val counts = all.groupBy(_._2).map { case (s, g) => s -> g.size }
    all.filter { case (_, s) => counts(s) >= 2 }
      .groupBy { case ((id, p, _), _) => (id, p) }
      .map { case (key, g) => key -> g.map(_._1._3).max }
      .filter { case (_, l) => l >= k }
  }

  private def run(k: Int, cap: Int): Map[(Long, Long), Long] =
    SuffixArray.maxRepeat(corpus, "text", "doc_id", k, cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("per-position maximal repeat equals the brute force, " +
    "including cross-doc phrases, intra-doc repeats, and the " +
    "identical-document full-suffix ties") {
    for ((k, cap) <- Seq((3, 20), (4, 16), (2, 7), (6, 6))) {
      val got = run(k, cap)
      val want = brute(k, cap)
      assert(got == want, s"k=$k cap=$cap\n got=${got.toSeq.sorted}\n " +
        s"want=${want.toSeq.sorted}")
    }
  }

  test("the known phrase reports its exact maximal length, not the " +
    "window size: 'p q r s t u' at doc 0 pos 3 is 6 tokens") {
    val got = run(3, 20)
    assert(got((0L, 3L)) == 6L)   // p q r s t u
    assert(got((1L, 2L)) == 6L)
    assert(got((0L, 4L)) == 5L)   // q r s t u — suffix of the repeat
    // intra-doc: "e f g h" at doc 3 positions 0 and 4; pos 0 extends
    // to "e f g h e"? no — the second copy ends at "h tail"; maximal
    // at pos 0 is 4
    assert(got((3L, 0L)) == 4L)
  }

  test("identical documents tie entire suffixes: every position of " +
    "the duplicated doc reports its full remaining length") {
    val got = run(1, 32)
    val len = rows(2)._2.split(" ").length
    for (p <- 0 until len) {
      assert(got((2L, p.toLong)) == (len - p).toLong, s"pos $p")
      assert(got((5L, p.toLong)) == (len - p).toLong, s"pos $p")
    }
  }

  test("cap semantics: capped output == min(uncapped, cap) row-wise") {
    val capped = run(2, 5)
    val full = run(2, 32)
    val expect = full.map { case (kk, v) => kk -> math.min(v, 5L) }
      .filter(_._2 >= 2L)
    assert(capped == expect)
  }

  test("coverage parity: SA spans == SubstrDedup.dupSpans — two " +
    "independent algorithms, identical rows (uncapped)") {
    for (k <- Seq(3, 4, 6)) {
      val sa = SuffixArray.coverageSpans(corpus, "text", "doc_id", k, 64)
        .orderBy("doc_id", "span_start")
        .collect().map(_.toSeq).toSeq
      val kg = SubstrDedup.dupSpans(corpus, "text", "doc_id", k)
        .orderBy("doc_id", "span_start")
        .collect().map(_.toSeq).toSeq
      assert(sa == kg, s"k=$k\n sa=$sa\n kg=$kg")
    }
  }

  test("determinism: two runs produce identical rows") {
    assert(run(3, 20) == run(3, 20))
  }

  test("plan shape: no cartesian product, no single-partition " +
    "exchange in the build") {
    val plan = SuffixArray.maxRepeat(corpus, "text", "doc_id", 3, 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }
}
