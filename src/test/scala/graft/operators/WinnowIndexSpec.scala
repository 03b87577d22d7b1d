package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The persisted winnow-fingerprint lake: probe == the ad-hoc MOSS
  * matching pass (the index changes the read, not the answer), the
  * stop-fingerprint cap over the stored lake, the append lifecycle
  * with the claim-first overlap guard, and load round-trips. */
class WinnowIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-widx").toString

  // sentences long enough that k=4,w=5 winnowing fingerprints them
  private lazy val lake = (0 until 30).map { i =>
    (i.toLong,
      s"document w$i alpha beta gamma delta w${i * 7 % 30} epsilon " +
      s"zeta w${i * 3 % 30} eta theta iota kappa w$i closing words here")
  }.toDF("doc_id", "text")

  // 100: shift-planted near-copy of doc 3; 101: novel
  private lazy val batch = Seq(
    (100L, "pad1 pad2 pad3 document w3 alpha beta gamma delta w21 " +
      "epsilon zeta w9 eta theta iota kappa w3 closing words here"),
    (101L, "completely unrelated fresh material with distinctive tokens " +
      "spread across enough words to fingerprint cleanly right here"))
    .toDF("doc_id", "text")

  /** The pure (no-index) cross-corpus MOSS pass with lake-side df cap —
    * the semantics the stored index must reproduce. */
  private def pure(lakeDf: DataFrame, inc: DataFrame, dfCap: Int,
      minShared: Int): Set[(Long, Long, Long)] = {
    def fp(df: DataFrame) = df
      .selectExpr("doc_id", "explode(winnow(text, 4, 5)) AS f")
      .select(col("doc_id"), col("f.hash").as("hash")).distinct()
    val lf = fp(lakeDf)
    val rare = lf.groupBy("hash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("hash")
    fp(inc).select(col("hash"), col("doc_id").as("new_id"))
      .join(lf.join(rare, Seq("hash"))
        .select(col("hash"), col("doc_id").as("old_id")), Seq("hash"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("probe == the pure cross-corpus MOSS pass (including the " +
    "shift-planted near-copy), and the novel doc matches nothing") {
    val idx = WinnowIndex.build(lake, "doc_id", "text", tmp(),
      k = 4, w = 5, dfCap = 20, nBuckets = 8)
    val got = idx.probe(batch, "doc_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == pure(lake, batch, 20, 2))
    assert(got.exists { case (n, o, _) => n == 100L && o == 3L },
      s"shift-planted copy must pair with its source: $got")
    assert(!got.exists(_._1 == 101L), s"novel doc paired: $got")
  }

  test("stop-fingerprint cap: a boilerplate line shared by more than " +
    "dfCap lake docs produces NO pairs through those fingerprints") {
    val boiler = "subscribe to our newsletter for updates every single day"
    val spam = (0 until 12).map(i =>
      (i.toLong, s"$boiler unique w$i filler w${i + 50} more w${i + 90}"))
      .toDF("doc_id", "text")
    val probe = Seq((200L, boiler)).toDF("doc_id", "text")
    val capped = WinnowIndex.build(spam, "doc_id", "text", tmp(),
      k = 4, w = 5, dfCap = 8, nBuckets = 4)
    assert(capped.probe(probe, "doc_id", "text", 1).count() == 0)
    // same lake, cap lifted: the boilerplate fingerprints DO pair
    val open = WinnowIndex.build(spam, "doc_id", "text", tmp(),
      k = 4, w = 5, dfCap = 100, nBuckets = 4)
    assert(open.probe(probe, "doc_id", "text", 1).count() == 12)
  }

  test("append grows the lake (a later probe sees appended docs); " +
    "overlapping id range throws; load round-trips parameters and " +
    "probe results") {
    val path = tmp()
    val idx = WinnowIndex.build(lake, "doc_id", "text", path,
      k = 4, w = 5, dfCap = 20, nBuckets = 8)
    val before = idx.probe(batch, "doc_id", "text", 2).count()
    val grown = idx.appendBatch(
      Seq((50L, "pad1 pad2 pad3 document w3 alpha beta gamma delta w21 " +
        "epsilon zeta w9 eta theta iota kappa w3 closing words here"))
        .toDF("doc_id", "text"), "doc_id", "text")
    assert(grown.nDocs == 31)
    // doc 100 now also matches appended doc 50 (same shifted text)
    val after = grown.probe(batch, "doc_id", "text", 2)
    assert(after.count() > before)
    assert(after.filter(col("old_id") === 50L).count() == 1)
    // overlap guard (claim-first ordering: the failed claim is loud)
    val e = intercept[IllegalArgumentException] {
      grown.appendBatch(lake.limit(3), "doc_id", "text")
    }
    assert(e.getMessage.contains("doubles its postings"))
    // load round-trip
    val loaded = WinnowIndex.load(spark, path)
    assert(loaded.nDocs == 31 && loaded.k == 4 && loaded.w == 5 &&
      loaded.dfCap == 20 && loaded.nBuckets == 8)
    assert(loaded.probe(batch, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      after.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // compaction after the append preserves probe results + sidecars
    val compacted = loaded.compact()
    assert(compacted.nDocs == 31)
    assert(compacted.probe(batch, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      after.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // the overlap guard survived the swap (the _ranges sidecar carried)
    val e2 = intercept[IllegalArgumentException] {
      compacted.appendBatch(lake.limit(3), "doc_id", "text")
    }
    assert(e2.getMessage.contains("doubles its postings"))
  }
}
