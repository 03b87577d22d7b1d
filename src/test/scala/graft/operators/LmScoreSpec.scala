package graft.operators

import graft.SparkTestBase

/** Corpus-native add-k unigram scoring: hand-computed probabilities,
  * the typical-vs-atypical ordering the filter relies on, and the
  * parameter contract. */
class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  test("bits_per_token matches the hand-computed add-k model") {
    // corpus: a=2 b=2 c=1 -> N=5, V=3, k=0.5 -> denom 6.5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = LmScore.score(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def lp(c: Double) = -(math.log((c + 0.5) / 6.5) / math.log(2.0))
    val d1 = (2 * lp(2) + lp(2)) / 3
    val d2 = (lp(2) + lp(1)) / 2
    assert(out(0).getLong(1) == 3L && out(1).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - d1) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - d2) < 1e-6)
  }

  test("documents of rare tokens score strictly higher than " +
    "corpus-typical documents — the filterable signal") {
    val typical = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val weird = Seq((99L, "zqx vbn plm wkj"))
    val out = LmScore.score((typical ++ weird).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val typicalMax = typical.map(t => out(t._1)).max
    assert(out(99L) > typicalMax + 1.0,
      s"weird=${out(99L)} typicalMax=$typicalMax")
  }

  test("smoothing must be positive") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      LmScore.score(docs, "doc_id", "text", k = 0.0)
    }
  }
}
