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

  test("exactly-once-effective replay: re-running a delivered batch id " +
    "is a no-op at every crash point (no double postings, survivors " +
    "unchanged)") {
    import graft.operators.{Bm25Index => _, ShingleIndex}
    import graft.streaming.IngestStream
    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-replay").toString
    val lakeBase = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "some other base document text that lives in the lake"))
      .toDF("doc_id", "text")
    val b1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of lake 1
      (11L, "a totally novel crawl document with distinctive words here"),
      (12L, "a totally novel crawl document with distinctive words there")) // near-dup of 11, intra-batch
      .toDF("doc_id", "text")
    ShingleIndex.build(lakeBase, "doc_id", "text", s"$root/idx",
      ngram = 3, nBuckets = 8)
    def out(): Set[Long] = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    def nPostings(): Long =
      spark.read.parquet(s"$root/idx").count()

    // first delivery
    IngestStream.processBatch(b1, 0L, "doc_id", "text",
      s"$root/idx", s"$root/out", 0.5)
    val surv0 = out()
    val post0 = nPostings()
    assert(surv0 == Set(11L)) // 10 dups the lake; 12 loses to 11 intra-batch
    assert(IngestStream.deliveredBatches(spark, s"$root/idx") == Set(0L))

    // replay of a COMMITTED batch: marker short-circuits everything
    IngestStream.processBatch(b1, 0L, "doc_id", "text",
      s"$root/idx", s"$root/out", 0.5)
    assert(out() == surv0 && nPostings() == post0)

    // crash window: append landed but the marker write died — drop the
    // marker and replay. excludeSelf keeps the recompute deterministic
    // (the index already holds batch 0's shingles), the out overwrite
    // rewrites the same rows, appendBatchIfAbsent skips the claimed
    // range instead of doubling postings or throwing.
    val fs = new org.apache.hadoop.fs.Path(s"$root/idx/_batches")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/idx/_batches"), true)
    IngestStream.processBatch(b1, 0L, "doc_id", "text",
      s"$root/idx", s"$root/out", 0.5)
    assert(out() == surv0, "replay changed the delivered survivors")
    assert(nPostings() == post0, "replay doubled postings")
    assert(IngestStream.deliveredBatches(spark, s"$root/idx") == Set(0L))

    // and the stream still makes progress after the replay
    IngestStream.processBatch(
      Seq((20L, "completely fresh material arriving in the second batch"))
        .toDF("doc_id", "text"),
      1L, "doc_id", "text", s"$root/idx", s"$root/out", 0.5)
    assert(out() == Set(11L, 20L))
  }

  test("range-claimed-but-postings-missing window is detectable and " +
    "repairable from the delivered store (missingRanges/reconcile)") {
    import graft.operators.ShingleIndex
    import graft.streaming.IngestStream
    val root = java.nio.file.Files
      .createTempDirectory("graft-ingest-reconcile").toString
    val lakeBase = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val idx0 = ShingleIndex.build(lakeBase, "doc_id", "text",
      s"$root/idx", ngram = 3, nBuckets = 8)
    val b1 = Seq(
      (10L, "a totally novel crawl document with distinctive words here"))
      .toDF("doc_id", "text")
    IngestStream.processBatch(b1, 0L, "doc_id", "text",
      s"$root/idx", s"$root/out", 0.5)
    assert(idx0.missingRanges().isEmpty)
    // simulate the claim-without-postings crash: claim a range whose
    // postings never landed
    val b2 = Seq(
      (20L, "completely fresh material arriving in the second batch"))
      .toDF("doc_id", "text")
    // a direct range claim with no postings write = the crash footprint
    val claim = Seq((20L, 20L)).toDF("lo", "hi")
    claim.coalesce(1).write.mode("append").parquet(s"$root/idx/_ranges")
    val idx1 = ShingleIndex.load(spark, s"$root/idx")
    assert(idx1.missingRanges() == Seq((20L, 20L)))
    // deliver the recovery corpus (what out/batch=N would hold), repair
    b2.write.mode("overwrite").parquet(s"$root/out/batch=1")
    val idx2 = idx1.reconcile(
      spark.read.parquet(s"$root/out"), "doc_id", "text")
    assert(idx2.missingRanges().isEmpty)
    // the repaired postings are live: a near-dup of doc 20 now gates
    val probeHit = idx2.probe(
      Seq((30L, "completely fresh material arriving in the third batch"))
        .toDF("doc_id", "text"), "doc_id", "text", 0.5)
    assert(probeHit.select("old_id").as[Long].collect().toSet == Set(20L))
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

  test("in-stream lake compaction (r13): compactEvery folds the " +
    "fragmented postings back to one file per bucket at batch " +
    "boundaries, with accepted rows identical to the uncompacted run") {
    import graft.operators.ShingleIndex
    import graft.streaming.IngestStream
    def run(root: String, every: Int): Set[Long] = {
      val lakeBase = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "some other base document text that lives in the lake"))
        .toDF("doc_id", "text")
      ShingleIndex.build(lakeBase, "doc_id", "text", s"$root/idx",
        ngram = 3, nBuckets = 4)
      val batches = (0 until 4).map { k =>
        Seq((100L + 2 * k, s"novel subject number $k alpha beta gamma"),
          (101L + 2 * k, s"unrelated topic $k delta epsilon zeta eta"))
          .toDF("doc_id", "text")
      }
      val inDir = s"$root/in"
      batches.head.coalesce(1).write.mode("append").parquet(inDir)
      val q = IngestStream.ingestQuery(
        spark.readStream.schema(batches.head.schema).parquet(inDir),
        lakeBase, "doc_id", "text", s"$root/idx", s"$root/out",
        threshold = 0.5, checkpoint = s"$root/ckpt",
        compactEvery = every)
      try {
        q.processAllAvailable()
        batches.tail.foreach { b =>
          b.coalesce(1).write.mode("append").parquet(inDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.read.parquet(s"$root/out").select("doc_id")
        .as[Long].collect().toSet
    }
    def bucketFiles(root: String): Map[String, Int] = {
      // per-bucket counts of the CURRENT snapshot (r17: the tree is
      // gen=…/bucket=…, and retention keeps old generations for
      // pinned readers — only the manifest's parts are the lake)
      val m = graft.index.Manifests.require(spark, s"$root/idx")
      m.parts.groupBy(p => p.substring(p.indexOf('/') + 1))
        .map { case (b, parts) =>
          b -> parts.map { p =>
            new java.io.File(s"$root/idx/$p").listFiles()
              .count(_.getName.endsWith(".parquet"))
          }.sum
        }
    }
    val rootA = java.nio.file.Files
      .createTempDirectory("graft-autocompact-off").toString
    val rootB = java.nio.file.Files
      .createTempDirectory("graft-autocompact-on").toString
    val plain = run(rootA, every = 0)
    val compacted = run(rootB, every = 2)
    assert(plain == compacted, s"$plain vs $compacted")
    // without compaction the touched buckets accumulate per-append
    // files; with it the LAST boundary compact (after batch 3) folds
    // every bucket to a single file
    assert(bucketFiles(rootA).values.max > 1, bucketFiles(rootA).toString)
    assert(bucketFiles(rootB).values.forall(_ == 1),
      bucketFiles(rootB).toString)
    // the compacted lake still answers consistently
    assert(graft.operators.ShingleIndex
      .load(spark, s"$rootB/idx").nDocs ==
      graft.operators.ShingleIndex.load(spark, s"$rootA/idx").nDocs)
  }

  test("AutoCompact cadence (r14): the fragmentation rule fires " +
    "compaction without a caller-pinned batch count, accepted rows " +
    "identical to the never-compact run, and the delivery ledger " +
    "survives the compact") {
    import graft.operators.ShingleIndex
    import graft.streaming.IngestStream
    def run(root: String, every: Int): Set[Long] = {
      val lakeBase = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "some other base document text that lives in the lake"))
        .toDF("doc_id", "text")
      ShingleIndex.build(lakeBase, "doc_id", "text", s"$root/idx",
        ngram = 3, nBuckets = 4)
      // a tight slack so the footprint crosses the rule's line at
      // least once within 8 batches (the production default of 16
      // files/bucket would need ~16 appends — the no-fire side of the
      // default is asserted below)
      (0 until 8).foreach { k =>
        IngestStream.processBatch(
          Seq((100L + 2 * k, s"novel subject number $k alpha beta gamma"),
            (101L + 2 * k, s"unrelated topic $k delta epsilon zeta eta"))
            .toDF("doc_id", "text"),
          k.toLong, "doc_id", "text", s"$root/idx", s"$root/out", 0.5,
          compactEvery = every, compactSlack = 1.5)
      }
      spark.read.parquet(s"$root/out").select("doc_id")
        .as[Long].collect().toSet
    }
    val rootA = java.nio.file.Files
      .createTempDirectory("graft-autorule-off").toString
    val rootB = java.nio.file.Files
      .createTempDirectory("graft-autorule-on").toString
    val plain = run(rootA, every = 0)
    val auto = run(rootB, every = IngestStream.AutoCompact)
    assert(plain == auto && auto.size == 16, s"$plain vs $auto")
    def files(root: String): Long = ShingleIndex
      .load(spark, s"$root/idx").storageFootprint()._1
    // the rule fired at least once: the auto lake is materially less
    // fragmented than the never-compacted one
    assert(files(rootB) < files(rootA),
      s"auto=${files(rootB)} plain=${files(rootA)}")
    // and right after a compact the rule reports no further need even
    // at the test's tight slack — while the never-compacted lake's
    // 8-append fragmentation stays BELOW the production default
    // threshold (clean appends add one file per bucket per batch;
    // ~16 appends reach it, 8 must not)
    val idxB = ShingleIndex.load(spark, s"$rootB/idx").compact()
    assert(!idxB.shouldCompact(1.5))
    assert(!ShingleIndex.load(spark, s"$rootA/idx").shouldCompact())
    // the ledger survived in-stream compaction: every delivered batch
    // id still short-circuits a replay
    assert(IngestStream.deliveredBatches(spark, s"$rootB/idx") ==
      (0L until 8L).toSet)
  }

}
