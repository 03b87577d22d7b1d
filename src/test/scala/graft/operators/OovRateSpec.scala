package graft.operators

import graft.SparkTestBase

/** OOV-rate coverage diagnostic: hand-computed vocabulary membership,
  * the deterministic K-boundary tiebreak, the full-coverage endpoint,
  * and the parameter contract. */
class OovRateSpec extends SparkTestBase {
  import spark.implicits._

  test("oov counts match the hand-built top-K vocabulary") {
    // counts: a=3, b=2, c=1, d=1 -> top-2 vocab {a, b}
    val docs = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 1L)
    assert(math.abs(out(0).getDouble(3) - 0.25) < 1e-9)
    assert(out(1).getLong(1) == 3L && out(1).getLong(2) == 1L)
  }

  test("the K-boundary tie breaks by token: c and d tie at count 1, " +
    "c enters a top-3 vocab, d stays OOV") {
    val docs = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 0L, out(0)) // c covered
    assert(out(1).getLong(2) == 1L, out(1)) // d not
  }

  test("a vocabulary covering every distinct token yields zero OOV " +
    "everywhere") {
    val docs = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", 100).collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("vocabSize must be positive") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.oovRate(docs, "doc_id", "text", 0)
    }
  }
}
