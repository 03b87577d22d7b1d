package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Persisted shingle index: probe/survivors equal the pure-function
  * incremental dedup on real data, hashed keys equal exact string
  * keys, the append guard fires on id overlap, ingest grows the lake
  * so the next crawl dedups against accepted rows, and load/compact
  * round-trip the artifact. */
class ShingleIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")
  private lazy val base = docs.filter(col("doc_id") < 150)
  private lazy val incoming = docs.filter(col("doc_id") >= 150)

  private def tmp(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft-shidx-$tag").toString + "/idx"

  test("probe == matchesAgainst and survivors == incrementalSurvivors " +
    "on the real corpus (the index changes the read, not the answer)") {
    val idx = ShingleIndex.build(base, "doc_id", "text", tmp("eq"),
      ngram = 3, nBuckets = 16)
    val viaIdx = idx.probe(incoming, "doc_id", "text", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = TextDedup.matchesAgainst(base, incoming, "doc_id", "text",
      n = 3, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIdx == direct)
    assert(viaIdx.nonEmpty, "fixture must exercise real matches")
    val sIdx = idx.survivors(incoming, "doc_id", "text", 0.35)
      .select("doc_id").as[Long].collect().toSet
    val sDirect = TextDedup.incrementalSurvivors(base, incoming,
      "doc_id", "text", n = 3, threshold = 0.35)
      .select("doc_id").as[Long].collect().toSet
    assert(sIdx == sDirect)
  }

  test("hashed 8-byte keys == exact string keys (the scale layout " +
    "loses nothing on this corpus)") {
    val hashed = ShingleIndex.build(base, "doc_id", "text", tmp("h"),
      ngram = 3, nBuckets = 8, hashKeys = true)
    val exact = ShingleIndex.build(base, "doc_id", "text", tmp("s"),
      ngram = 3, nBuckets = 8, hashKeys = false)
    val a = hashed.probe(incoming, "doc_id", "text", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = exact.probe(incoming, "doc_id", "text", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("append guard: an id range overlapping the indexed lake throws " +
    "with the double-count rationale; force appends anyway") {
    val idx = ShingleIndex.build(base, "doc_id", "text", tmp("g"),
      ngram = 3, nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      idx.appendBatch(base.limit(5), "doc_id", "text")
    }
    assert(e.getMessage.contains("doubles its postings"))
    // disjoint range appends fine; force overrides the guard
    idx.appendBatch(incoming.limit(5), "doc_id", "text")
    idx.appendBatch(base.limit(2), "doc_id", "text", force = true)
  }

  test("ingest grows the lake: accepted rows gate the NEXT crawl, " +
    "and the returned survivors don't see their own append") {
    val novel = Seq(
      (900L, "a totally novel crawl document with distinctive words here"),
      (901L, "another quite different crawl document full of new content"))
      .toDF("doc_id", "text")
    val echo = Seq( // same texts, later crawl, new ids
      (950L, "a totally novel crawl document with distinctive words here"),
      (951L, "fresh never-before-seen material in the second crawl batch"))
      .toDF("doc_id", "text")
    val idx0 = ShingleIndex.build(base, "doc_id", "text", tmp("i"),
      ngram = 3, nBuckets = 8)
    val (s1, idx1) = idx0.ingest(novel, "doc_id", "text", 0.5)
    assert(s1.select("doc_id").as[Long].collect().toSet == Set(900L, 901L))
    assert(idx1.nDocs == idx0.nDocs + 2)
    val (s2, _) = idx1.ingest(echo, "doc_id", "text", 0.5)
    // 950 is a dup of the FIRST crawl's accepted 900 — only the index
    // remembers that; 951 is genuinely fresh
    assert(s2.select("doc_id").as[Long].collect().toSet == Set(951L))
  }

  test("load round-trips the artifact and its shingle parameters; " +
    "probe after load == probe before") {
    val path = tmp("l")
    val built = ShingleIndex.build(base, "doc_id", "text", path,
      ngram = 4, nBuckets = 8)
    val loaded = ShingleIndex.load(spark, path)
    assert(loaded.ngram == 4 && loaded.nBuckets == 8 &&
      loaded.hashKeys && loaded.nDocs == built.nDocs)
    val a = built.probe(incoming, "doc_id", "text", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = loaded.probe(incoming, "doc_id", "text", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    intercept[graft.index.IndexNotFoundException] {
      ShingleIndex.load(spark, path + "-nope")
    }
  }

  test("compact after appends preserves probe results and sidecars") {
    val path = tmp("c")
    val idx = ShingleIndex.build(base, "doc_id", "text", path,
      ngram = 3, nBuckets = 8)
    val grown = idx.appendBatch(
      incoming.filter(col("doc_id") >= 250), "doc_id", "text")
    val before = grown.probe(incoming.filter(col("doc_id") < 250),
      "doc_id", "text", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val compacted = grown.compact()
    val after = compacted.probe(incoming.filter(col("doc_id") < 250),
      "doc_id", "text", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before == after)
    assert(ShingleIndex.load(spark, path).nDocs == grown.nDocs)
    // the range log survived the swap: overlap still throws
    intercept[IllegalArgumentException] {
      compacted.appendBatch(base.limit(3), "doc_id", "text")
    }
  }

  test("empty or unshinglable corpus refuses to build; empty append " +
    "is a no-op") {
    intercept[IllegalArgumentException] {
      ShingleIndex.build(docs.limit(0), "doc_id", "text", tmp("e"))
    }
    val idx = ShingleIndex.build(base, "doc_id", "text", tmp("e2"),
      ngram = 3, nBuckets = 8)
    assert(idx.appendBatch(docs.limit(0), "doc_id", "text").nDocs ==
      idx.nDocs)
  }
}
