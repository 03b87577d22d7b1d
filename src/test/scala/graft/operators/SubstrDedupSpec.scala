package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ExactSubstr dedup: spans must equal a brute-force re-derivation
  * (every k-gram counted corpus-wide, covered positions unioned), the
  * hashed-key scale form must match the exact-string form, and clean()
  * must remove exactly the covered tokens. */
class SubstrDedupSpec extends SparkTestBase {

  import spark.implicits._

  private val k = 4

  // a corpus with a known repeated phrase ("p q r s t u" spans two
  // overlapping duplicated 4-grams), an intra-doc repeat, and clean docs
  private lazy val corpus = Seq(
    (0L, "a b c p q r s t u x y z"),
    (1L, "m n p q r s t u o w"),
    (2L, "unique words only here nothing repeats at all"),
    (3L, "e f g h e f g h tail"), // intra-doc duplicate 4-gram
    (4L, "sh")                    // shorter than k
  ).toDF("doc_id", "text")

  private def brute(rows: Seq[(Long, String)], k: Int)
      : Map[Long, Set[Int]] = {
    val grams = rows.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      (0 to t.length - k).filter(_ => t.length >= k)
        .map(i => (t.slice(i, i + k).mkString(" "), id, i))
    }
    val counts = grams.groupBy(_._1).view.mapValues(_.size).toMap
    grams.filter(g => counts(g._1) >= 2)
      .groupBy(_._2).view
      .mapValues(_.flatMap(g => g._3 until g._3 + k).toSet).toMap
      .toMap
  }

  test("dupSpans covers exactly the brute-force duplicated positions") {
    val rows = corpus.as[(Long, String)].collect().toSeq
    val want = brute(rows, k)
    val got = SubstrDedup.dupSpans(corpus, "text", "doc_id", k)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.flatMap(r =>
        r.getLong(1).toInt to r.getLong(2).toInt).toSet)
      .toMap
    assert(got == want)
    assert(want.contains(3L), "intra-doc repeat must count as duplicated")
    assert(!want.contains(2L) && !want.contains(4L))
    // spans are maximal: doc 0's two overlapping windows merged to one row
    val doc0 = SubstrDedup.dupSpans(corpus, "text", "doc_id", k)
      .filter(col("doc_id") === 0L).collect()
    assert(doc0.length == 1)
  }

  test("hashed keys produce identical spans to exact strings") {
    val exact = SubstrDedup.dupSpans(corpus, "text", "doc_id", k,
      hashKeys = false).collect().map(_.toSeq).toSet
    val hashed = SubstrDedup.dupSpans(corpus, "text", "doc_id", k,
      hashKeys = true).collect().map(_.toSeq).toSet
    assert(exact == hashed)
    // and on real data
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val e2 = SubstrDedup.dupSpans(docs, "text", "doc_id", 8,
      hashKeys = false).collect().map(_.toSeq).toSet
    val h2 = SubstrDedup.dupSpans(docs, "text", "doc_id", 8,
      hashKeys = true).collect().map(_.toSeq).toSet
    assert(e2 == h2)
    assert(e2.nonEmpty, "sf0.001 should contain duplicated 8-grams")
  }

  test("clean removes exactly the covered tokens; untouched docs pass " +
    "through verbatim") {
    val rows = corpus.as[(Long, String)].collect().toSeq
    val covered = brute(rows, k)
    val want = rows.map { case (id, text) =>
      val t = text.split(" ", -1)
      val cov = covered.getOrElse(id, Set.empty)
      id -> t.zipWithIndex.collect {
        case (tok, i) if !cov(i) => tok
      }.mkString(" ")
    }.toMap
    val got = SubstrDedup.clean(corpus, "text", "doc_id", k)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
    assert(got(2L) == "unique words only here nothing repeats at all")
    assert(got(4L) == "sh")
  }

  test("plan shape: no cartesian or nested-loop join anywhere") {
    val plans = Seq(
      SubstrDedup.dupSpans(corpus, "text", "doc_id", k),
      SubstrDedup.clean(corpus, "text", "doc_id", k))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      assert(!p.contains("CartesianProduct"), p.take(400))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
    }
  }
}
