package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.SimHash

/** The stream-safe incremental-ingest gate: exact-fingerprint
  * left-anti against the static base, streamed == batch, with the
  * reshuffled-token catch the raw-text hash would miss. */
class IngestDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "some other base document text")).toDF("doc_id", "text")

  private val incoming = Seq(
    (10L, "the quick brown fox jumps"), // exact dup of base 1
    (11L, "jumps fox brown quick the"), // token-reshuffle of base 1
    (12L, "an entirely new document"),
    (13L, "")) // unfingerprintable: passes
    .toDF("doc_id", "text")

  test("batch: exact and reshuffled dups drop, novel and empty rows " +
    "pass, columns preserved") {
    val out = SimHash.filterAgainstExact(base, incoming, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "text"))
    assert(out.collect().map(_.getLong(0)).toSet == Set(12L, 13L))
  }

  test("end-to-end two-tier ingest: fingerprint gate + persisted " +
    "shingle index grow across micro-batches, streamed == batch fold") {
    import graft.operators.ShingleIndex
    import graft.streaming.IngestStream
    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-e2e").toString
    val lakeBase = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "some other base document text that lives in the lake"))
      .toDF("doc_id", "text")
    // batch 1: an exact base dup (tier 1), a near-dup of base 1
    // (tier 2), a novel doc
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog tonight"),
      (12L, "a totally novel crawl document with distinctive words here"))
      .toDF("doc_id", "text")
    // batch 2: a near-dup of batch 1's ACCEPTED doc 12 (only the
    // grown index remembers it), a reshuffle of base 2 (tier 1), a
    // fresh doc
    val b2 = Seq(
      (20L, "a totally novel crawl document with distinctive words there"),
      (21L, "lake the in lives that text document base other some"),
      (22L, "completely fresh material arriving in the second batch"))
      .toDF("doc_id", "text")

    // streaming run
    ShingleIndex.build(lakeBase, "doc_id", "text", s"$root/idx",
      ngram = 3, nBuckets = 8)
    val inDir = s"$root/in"
    b1.coalesce(1).write.mode("append").parquet(inDir)
    val src = spark.readStream.schema(b1.schema).parquet(inDir)
    val q = IngestStream.ingestQuery(src, lakeBase, "doc_id", "text",
      s"$root/idx", s"$root/out", threshold = 0.5,
      checkpoint = s"$root/ckpt")
    q.processAllAvailable()
    b2.coalesce(1).write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    // tier 1 kills 10 and 21; tier 2 kills 11 (near-dup of lake) and
    // 20 (near-dup of batch-1-accepted 12)
    assert(streamed == Set(12L, 22L), streamed.toString)
    // the index grew by exactly the accepted rows
    assert(ShingleIndex.load(spark, s"$root/idx").nDocs == 4)

    // batch fold over the same micro-batches == streamed
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-ingest-e2e-b").toString
    var idx = ShingleIndex.build(lakeBase, "doc_id", "text",
      s"$root2/idx", ngram = 3, nBuckets = 8)
    val acc = scala.collection.mutable.Set.empty[Long]
    Seq(b1, b2).foreach { b =>
      val (surv, grown) = IngestStream.ingestBatch(
        b, lakeBase, "doc_id", "text", idx, 0.5)
      acc ++= surv.select("doc_id").as[Long].collect()
      idx = grown
    }
    assert(acc.toSet == streamed)
  }

  test("the same call gates a structured stream (stream-static " +
    "left-anti, no state), streamed == batch") {
    val want = SimHash.filterAgainstExact(base, incoming, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ingest-gate").toString
    incoming.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = SimHash.filterAgainstExact(base, src, "doc_id", "text")
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ingest_gate")
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }
}
