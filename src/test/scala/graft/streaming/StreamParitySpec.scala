package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{ShingleIndex, SimHash}

/** The declared `stream_parity` query's runner: the REAL file-source
  * micro-batched run must equal the sequential batch fold, the
  * ledger must record exactly the three batches (the poisoned
  * replay leaves no trace), and the poison must be demonstrably
  * load-bearing — a replay that BYPASSES the ledger corrupts the
  * sink this runner protects. */
class StreamParitySpec extends SparkTestBase {
  import spark.implicits._

  // a miniature `documents` table shaped like the real one: base
  // corpus below the 250 split, incoming above it with planted
  // tier-1 dups (exact + reshuffle), a vs-lake near-dup, an
  // intra-batch near-dup pair, and a CROSS-batch near-dup that only
  // the sequentially grown index can catch
  private def miniDocs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today ok"),
    (1L, "some other base document text that lives in the lake now"),
    // batch 0 (ids 250..255): exact base dup, near-dup of base 0,
    // novel A, intra pair (both novel, near-dup of each other)
    (250L, "the quick brown fox jumps over the lazy dog today ok"),
    (251L, "the quick brown fox jumps over the lazy dog tonight ok"),
    (252L, "a totally novel crawl document with distinctive words here"),
    (253L, "first member of an intra batch duplicate pair right here"),
    (254L, "first member of an intra batch duplicate pair right there"),
    (255L, "completely separate subject matter for the opening batch"),
    // batch 1 (ids 256..261): reshuffle of base 1 (tier 1), near-dup
    // of batch 0's ACCEPTED doc 252 (the grown lake), novel B
    (256L, "now lake the in lives that text document base other some"),
    (257L, "a totally novel crawl document with distinctive words there"),
    (258L, "fresh material arriving only in the second micro batch"),
    (259L, "yet more unrelated prose to keep the middle batch busy"),
    (260L, "statistics about shingle growth across sequential batches"),
    (261L, "the middle batch closes with this unremarkable sentence"),
    // batch 2 (ids 262..267): near-dup of batch 1's accepted 258,
    // novel C
    (262L, "fresh material arriving only in the third micro batch"),
    (263L, "a closing document that resembles nothing seen before"),
    (264L, "final batch filler with its own vocabulary entirely"),
    (265L, "the very last novel document of the streaming corpus"),
    (266L, "penultimate row keeping the final range comfortably wide"),
    (267L, "terminal row of the miniature incoming document corpus"))
    .toDF("doc_id", "text")

  test("batchBounds matches the oracle's integer arithmetic") {
    assert(StreamParity.batchBounds(499L) ==
      Seq((250L, 333L), (333L, 416L), (416L, 500L)))
    assert(StreamParity.batchBounds(267L) ==
      Seq((250L, 256L), (256L, 262L), (262L, 268L)))
  }

  test("the streamed run equals the sequential batch fold, batch by " +
    "batch, and the ledger holds exactly the three delivered ids") {
    val docs = miniDocs
    val r = StreamParity.run(spark, "spec-parity", docs)
    // the batch twin: gate once, then fold the same three ranges
    // through ingest() against a fresh lake index
    val root = java.nio.file.Files
      .createTempDirectory("graft-sp-fold").toString
    val base = docs.filter($"doc_id" < 250)
    val gated = SimHash.filterAgainstExact(
      base, docs.filter($"doc_id" >= 250), "doc_id", "text")
      .localCheckpoint()
    var idx = ShingleIndex.build(base, "doc_id", "text", s"$root/idx",
      ngram = 3)
    val hi = 267L
    val expect = StreamParity.batchBounds(hi).zipWithIndex.flatMap {
      case ((lo, hiEx), k) =>
        val (surv, grown) = idx.ingest(
          gated.filter($"doc_id" >= lo && $"doc_id" < hiEx),
          "doc_id", "text", StreamParity.Threshold)
        idx = grown
        surv.select("doc_id").collect().map(r => (r.getLong(0), k.toLong))
    }.toSet
    val got = r.sink.select($"doc_id", $"batch".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"streamed $got vs batch fold $expect")
    // the planted structure actually exercised every tier
    val accepted = got.map(_._1)
    assert(!accepted.contains(250L), "tier-1 exact dup must drop")
    assert(!accepted.contains(256L), "tier-1 reshuffle dup must drop")
    assert(!accepted.contains(251L), "vs-lake near-dup must drop")
    assert(accepted.contains(253L) && !accepted.contains(254L),
      "intra-batch pair keeps the min id")
    assert(accepted.contains(252L) && !accepted.contains(257L),
      "cross-batch near-dup caught only by the grown lake")
    assert(accepted.contains(258L) && !accepted.contains(262L),
      "batch-2 near-dup of a batch-1 survivor drops")
    // ledger: exactly batches 0,1,2 — the poisoned replay of batch 1
    // was swallowed, not re-recorded
    assert(r.deliveredBatches == 3L)
    val ids = r.ledger.select("batch_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L), s"ledger rows $ids")
  }

  test("the poison is load-bearing: the same replay through a stream " +
    "id the ledger has never seen DOES corrupt the sink") {
    val docs = miniDocs
    val r = StreamParity.run(spark, "spec-poison", docs)
    val before = r.sink.select("doc_id").count()
    val outPath = r.sink.inputFiles.head
      .replaceAll("/batch=[0-9]+/.*$", "")
    val indexPath = outPath.stripSuffix("/out") + "/shingle_index"
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](),
      docs.select("doc_id", "text").schema)
    IngestStream.processBatch(empty, 1L, "doc_id", "text", indexPath,
      outPath, StreamParity.Threshold, streamId = "never-seen-stream")
    val after = spark.read.option("basePath", outPath).parquet(
      s"$outPath/batch=0", s"$outPath/batch=2").count() +
      (try spark.read.parquet(s"$outPath/batch=1").count()
       catch { case _: Throwable => 0L })
    assert(after < before,
      "an unledgered empty replay must wipe batch 1's rows — " +
        "otherwise the poisoned replay in the runner pins nothing")
  }
}
