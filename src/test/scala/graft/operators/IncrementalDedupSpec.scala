package graft.operators

import graft.SparkTestBase

/** Incremental ingest dedup: base matches drop, intra-batch dups keep
  * the min id, fresh and sub-threshold docs survive, and the base is
  * never paired with itself. */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different text about spark engines"))
    .toDF("doc_id", "text")

  private val incoming = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"), // dup of base 1
    (11L, "a totally novel document with its own words here"),
    (12L, "a totally novel document with its own words too"), // near-dup of 11
    (13L, "short doc"), // < 3 tokens after split? (2 tokens: no shingles)
    (14L, "unrelated content nothing shared with anything else at all"))
    .toDF("doc_id", "text")

  test("matchesAgainst finds only cross pairs; survivors drop base " +
    "dups and intra-batch dups (min id kept), keep the rest") {
    val m = TextDedup.matchesAgainst(base, incoming, "doc_id", "text",
      n = 3, threshold = 0.5).collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((10L, 1L)))
    val s = TextDedup.incrementalSurvivors(base, incoming, "doc_id", "text",
      n = 3, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(s == Set(11L, 13L, 14L), s.toString) // 10 matched base, 12 lost to 11
  }

  test("an empty base passes everything to intra-batch dedup only") {
    val s = TextDedup.incrementalSurvivors(
      base.limit(0), incoming, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(s == Set(10L, 11L, 13L, 14L), s.toString)
  }

  test("threshold gates the cross match") {
    val nearIncoming = Seq(
      (20L, "the quick brown fox jumps over the lazy cat today"))
      .toDF("doc_id", "text")
    val loose = TextDedup.matchesAgainst(base, nearIncoming,
      "doc_id", "text", n = 3, threshold = 0.2).count()
    val tight = TextDedup.matchesAgainst(base, nearIncoming,
      "doc_id", "text", n = 3, threshold = 0.9).count()
    assert(loose == 1L && tight == 0L)
  }
}
