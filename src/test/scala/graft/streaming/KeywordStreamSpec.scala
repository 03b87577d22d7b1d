package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Bm25Index

/** Continuous keyword-index ingest (r14): micro-batches append their
  * postings into the BM25 lake with claim-first replay safety; the
  * grown lake scores identically to a batch build over the union,
  * replays are swallowed by BOTH guards independently, the skip
  * window reconciles from the source corpus, and the auto-compact
  * cadence bounds fragmentation without changing any score. */
class KeywordStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "vector search with hash joins is a database topic"))
    .toDF("doc_id", "text")

  private def b1 = Seq(
    (10L, "hash partitioned vector indexes merge by file moves"),
    (11L, "the lazy dog sleeps through the vector lecture"))
    .toDF("doc_id", "text")

  private def b2 = Seq(
    (20L, "a second micro batch arrives with fresh vector terms"),
    (21L, "joins and hashes and foxes conclude the corpus"))
    .toDF("doc_id", "text")

  private def scratch(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft-kwstream-$tag").toString

  test("streamed appends == batch build over the union: scores, " +
    "stats, and df all match") {
    val root = scratch("parity")
    Bm25Index.build(base, "text", "doc_id", s"$root/idx", nBuckets = 8)
    IndexStream.keywordBatch(b1, 0L, "text", "doc_id", s"$root/idx")
    IndexStream.keywordBatch(b2, 1L, "text", "doc_id", s"$root/idx")
    val grown = Bm25Index.load(spark, s"$root/idx")
    val whole = Bm25Index.build(base.union(b1).union(b2), "text",
      "doc_id", s"$root/whole", nBuckets = 8)
    assert(grown.n == whole.n && grown.sumdl == whole.sumdl)
    def top(idx: Bm25Index) = idx.search(Seq("vector", "hash"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(grown) == top(whole) && top(grown).nonEmpty)
  }

  test("replays are swallowed by BOTH guards independently: the " +
    "ledger short-circuit, and the range claim when the ledger " +
    "record itself crashed") {
    val root = scratch("replay")
    Bm25Index.build(base, "text", "doc_id", s"$root/idx", nBuckets = 8)
    IndexStream.keywordBatch(b1, 0L, "text", "doc_id", s"$root/idx")
    val n0 = spark.read.parquet(s"$root/idx").count()
    val st0 = Bm25Index.load(spark, s"$root/idx").n
    // guard 1: committed batch id — ledger short-circuits
    IndexStream.keywordBatch(b1, 0L, "text", "doc_id", s"$root/idx")
    assert(spark.read.parquet(s"$root/idx").count() == n0)
    // guard 2: ledger lost (crash between append and record) — the
    // exact range claim still skips the re-append
    val fs = new org.apache.hadoop.fs.Path(s"$root/idx/_batches")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/idx/_batches"), true)
    IndexStream.keywordBatch(b1, 0L, "text", "doc_id", s"$root/idx")
    assert(spark.read.parquet(s"$root/idx").count() == n0,
      "range claim must skip the replayed postings")
    assert(Bm25Index.load(spark, s"$root/idx").n == st0,
      "stats must not double")
    // and the stream still makes progress afterwards
    IndexStream.keywordBatch(b2, 1L, "text", "doc_id", s"$root/idx")
    assert(Bm25Index.load(spark, s"$root/idx").n == st0 + 2)
  }

  test("skip window (range claimed, postings crashed) is detectable " +
    "and reconciles from the source corpus") {
    val root = scratch("reconcile")
    Bm25Index.build(base, "text", "doc_id", s"$root/idx", nBuckets = 8)
    val idx = Bm25Index.load(spark, s"$root/idx")
    assert(idx.missingRanges().isEmpty)
    // the crash footprint: a claim whose postings never landed
    Seq((10L, 11L)).toDF("lo", "hi").coalesce(1)
      .write.mode("append").parquet(s"$root/idx/_ranges")
    assert(idx.missingRanges() == Seq((10L, 11L)))
    val repaired = idx.reconcile(b1, "text", "doc_id")
    assert(repaired.missingRanges().isEmpty)
    val whole = Bm25Index.build(base.union(b1), "text", "doc_id",
      s"$root/whole", nBuckets = 8)
    def top(ix: Bm25Index) = ix.search(Seq("vector", "hash"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(repaired) == top(whole))
  }

  private def plantPendingFlag(root: String, lo: Long, hi: Long,
      nPre: Long, sPre: Long, nPost: Long, sPost: Long): Unit = {
    val dir = new java.io.File(s"$root/idx/_stats_pending")
    dir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/idx/_stats_pending/r_${lo}_$hi"),
      s"$nPre\n$sPre\n$nPost\n$sPost\nend\n".getBytes("UTF-8"))
    ()
  }

  private def overwriteStats(root: String,
      n: Long, sumdl: Long, nb: Int): Unit = {
    Seq((n, sumdl, nb)).toDF("n", "sumdl", "n_buckets")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$root/idx/_stats")
    ()
  }

  test("stats crash window (postings landed, stats write crashed): " +
    "the replay FINISHES the stats commit instead of blind-skipping " +
    "into a permanent undercount (r15)") {
    val root = scratch("statswin")
    val pre = Bm25Index.build(base, "text", "doc_id", s"$root/idx",
      nBuckets = 8)
    val post = Bm25Index.load(spark, s"$root/idx")
      .appendIfAbsent(b1, "text", "doc_id")
    // rewind to the crash footprint: postings + claim present, stats
    // still pre-append, in-flight flag present
    overwriteStats(root, pre.n, pre.sumdl, 8)
    plantPendingFlag(root, 10L, 11L, pre.n, pre.sumdl, post.n, post.sumdl)
    assert(Bm25Index.load(spark, s"$root/idx").n == pre.n, "footprint set")
    val rowsBefore = spark.read.parquet(s"$root/idx").count()
    val replayed = Bm25Index.load(spark, s"$root/idx")
      .appendIfAbsent(b1, "text", "doc_id")
    assert(replayed.n == post.n && replayed.sumdl == post.sumdl,
      "replay must repair the undercounted stats")
    assert(spark.read.parquet(s"$root/idx").count() == rowsBefore,
      "no posting doubles")
    assert(!new java.io.File(s"$root/idx/_stats_pending/r_10_11").exists)
    // scores now match the monolithic build exactly
    val whole = Bm25Index.build(base.union(b1), "text", "doc_id",
      s"$root/whole", nBuckets = 8)
    def top(ix: Bm25Index) = ix.search(Seq("vector", "hash"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(Bm25Index.load(spark, s"$root/idx")) == top(whole))
  }

  test("claim crash window (claimed + flagged, postings never landed): " +
    "the replay completes the WHOLE append from the replayed batch") {
    val root = scratch("claimwin")
    val pre = Bm25Index.build(base, "text", "doc_id", s"$root/idx",
      nBuckets = 8)
    val whole = Bm25Index.build(base.union(b1), "text", "doc_id",
      s"$root/whole", nBuckets = 8)
    // footprint: flag written, range claimed, death before postings
    plantPendingFlag(root, 10L, 11L, pre.n, pre.sumdl, whole.n, whole.sumdl)
    Seq((10L, 11L)).toDF("lo", "hi").coalesce(1)
      .write.mode("append").parquet(s"$root/idx/_ranges")
    assert(pre.missingRanges() == Seq((10L, 11L)))
    val replayed = Bm25Index.load(spark, s"$root/idx")
      .appendIfAbsent(b1, "text", "doc_id")
    assert(replayed.n == whole.n && replayed.sumdl == whole.sumdl)
    assert(replayed.missingRanges().isEmpty)
    assert(!new java.io.File(s"$root/idx/_stats_pending/r_10_11").exists)
    def top(ix: Bm25Index) = ix.search(Seq("vector", "hash"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(replayed) == top(whole))
  }

  test("flag-delete crash window (append fully committed, flag " +
    "survives): the replay verifies and settles without double-" +
    "counting; an out-of-band mutation fails loudly") {
    val root = scratch("flagwin")
    Bm25Index.build(base, "text", "doc_id", s"$root/idx", nBuckets = 8)
    val pre = Bm25Index.load(spark, s"$root/idx")
    val post = pre.appendIfAbsent(b1, "text", "doc_id")
    plantPendingFlag(root, 10L, 11L, pre.n, pre.sumdl, post.n, post.sumdl)
    val rowsBefore = spark.read.parquet(s"$root/idx").count()
    val replayed = Bm25Index.load(spark, s"$root/idx")
      .appendIfAbsent(b1, "text", "doc_id")
    assert(replayed.n == post.n && replayed.sumdl == post.sumdl,
      "settled, not double-counted")
    assert(spark.read.parquet(s"$root/idx").count() == rowsBefore)
    assert(!new java.io.File(s"$root/idx/_stats_pending/r_10_11").exists)
    // stats matching NEITHER flagged total = out-of-band writes since
    // the crash: refuse to guess
    plantPendingFlag(root, 10L, 11L, 999L, 999L, 998L, 998L)
    val e = intercept[IllegalStateException] {
      Bm25Index.load(spark, s"$root/idx")
        .appendIfAbsent(b1, "text", "doc_id")
    }
    assert(e.getMessage.contains("reconcile"), e.getMessage)
  }

  test("orphaned stats flag with the stream GONE (postings landed, " +
    "stats crashed, no replay coming): reconcile settles it (r16 — " +
    "pre-fix the flag sat invisible to missingRanges forever)") {
    val root = scratch("orphanflag")
    val pre = Bm25Index.build(base, "text", "doc_id", s"$root/idx",
      nBuckets = 8)
    val post = Bm25Index.load(spark, s"$root/idx")
      .appendIfAbsent(b1, "text", "doc_id")
    // the crash footprint: postings + claim present, stats still
    // pre-append, in-flight flag present — and the stream is gone, so
    // the ONLY repair path is reconcile
    overwriteStats(root, pre.n, pre.sumdl, 8)
    plantPendingFlag(root, 10L, 11L, pre.n, pre.sumdl, post.n, post.sumdl)
    val idx = Bm25Index.load(spark, s"$root/idx")
    assert(idx.missingRanges().isEmpty,
      "this window is invisible to missingRanges — postings exist")
    val rowsBefore = spark.read.parquet(s"$root/idx").count()
    val repaired = idx.reconcile(base.union(b1), "text", "doc_id")
    assert(repaired.n == post.n && repaired.sumdl == post.sumdl,
      s"reconcile left stats undercounting: ${repaired.n}/" +
      s"${repaired.sumdl} vs ${post.n}/${post.sumdl}")
    assert(spark.read.parquet(s"$root/idx").count() == rowsBefore,
      "settling must not touch postings")
    assert(!new java.io.File(s"$root/idx/_stats_pending/r_10_11").exists)
    val whole = Bm25Index.build(base.union(b1), "text", "doc_id",
      s"$root/whole", nBuckets = 8)
    def top(ix: Bm25Index) = ix.search(Seq("vector", "hash"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(Bm25Index.load(spark, s"$root/idx")) == top(whole))
  }

  test("BOTH stream-gone windows at once: an orphaned postings-landed " +
    "flag AND a claim-only missing range reconcile in one call") {
    val root = scratch("bothwin")
    val pre = Bm25Index.build(base, "text", "doc_id", s"$root/idx",
      nBuckets = 8)
    val post = Bm25Index.load(spark, s"$root/idx")
      .appendIfAbsent(b1, "text", "doc_id")
    // window 1: b1's postings landed, stats write crashed
    overwriteStats(root, pre.n, pre.sumdl, 8)
    plantPendingFlag(root, 10L, 11L, pre.n, pre.sumdl, post.n, post.sumdl)
    // window 2: b2's claim + flag landed, postings never did
    val whole = Bm25Index.build(base.union(b1).union(b2), "text",
      "doc_id", s"$root/whole", nBuckets = 8)
    plantPendingFlag(root, 20L, 21L, post.n, post.sumdl, whole.n,
      whole.sumdl)
    Seq((20L, 21L)).toDF("lo", "hi").coalesce(1)
      .write.mode("append").parquet(s"$root/idx/_ranges")
    val idx = Bm25Index.load(spark, s"$root/idx")
    assert(idx.missingRanges() == Seq((20L, 21L)))
    val repaired = idx.reconcile(base.union(b1).union(b2), "text",
      "doc_id")
    assert(repaired.n == whole.n && repaired.sumdl == whole.sumdl)
    assert(repaired.missingRanges().isEmpty)
    assert(!new java.io.File(s"$root/idx/_stats_pending/r_10_11").exists)
    assert(!new java.io.File(s"$root/idx/_stats_pending/r_20_21").exists)
    def top(ix: Bm25Index) = ix.search(Seq("vector", "hash"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(Bm25Index.load(spark, s"$root/idx")) == top(whole))
  }

  test("AMBIGUOUS stats flag is surfaced, never guessed and never " +
    "silently dropped (r17, ADVICE r16: a flag matching neither its " +
    "pre- nor post-totals used to sit invisible across reconciles, a " +
    "permanent undercount found only via score drift)") {
    val root = scratch("ambig")
    val pre = Bm25Index.build(base, "text", "doc_id", s"$root/idx",
      nBuckets = 8)
    val post = Bm25Index.load(spark, s"$root/idx")
      .appendIfAbsent(b1, "text", "doc_id")
    val post2 = Bm25Index.load(spark, s"$root/idx")
      .appendIfAbsent(b2, "text", "doc_id")
    // the footprint: b1's flag survived its crash AND an out-of-band
    // append (b2) landed after — on-disk stats match neither total
    plantPendingFlag(root, 10L, 11L, pre.n, pre.sumdl, post.n, post.sumdl)
    val idx = Bm25Index.load(spark, s"$root/idx")
    assert(idx.ambiguousPendingStats() ==
      Seq((10L, 11L, pre.n, pre.sumdl, post.n, post.sumdl)),
      "the unresolvable flag must be listed programmatically")
    val settled = idx.settlePendingStats()
    assert(settled.n == post2.n && settled.sumdl == post2.sumdl,
      "settle must never guess at ambiguous stats arithmetic")
    assert(new java.io.File(s"$root/idx/_stats_pending/r_10_11").exists,
      "the flag stays in place for adjudication")
    assert(settled.ambiguousPendingStats().nonEmpty,
      "still surfaced after settle")
    // reconcile cannot see it as missing (postings exist) — but it
    // must remain surfaced afterwards, not silently swallowed
    val rec = settled.reconcile(base.union(b1).union(b2), "text",
      "doc_id")
    assert(rec.ambiguousPendingStats().nonEmpty)
    // a genuinely settleable flag is NOT flagged ambiguous (control)
    assert(idx.missingRanges().isEmpty)
  }

  test("a real file-source stream with AutoCompact: all batches land, " +
    "search sees them, fragmentation stays bounded, ledger survives") {
    val root = scratch("stream")
    Bm25Index.build(base, "text", "doc_id", s"$root/idx", nBuckets = 4)
    val inDir = s"$root/in"
    // letters-only tags: the tokenizer splits "alpha3" into
    // "alpha" + "3", so a digit suffix would never form a term
    val batches = (0 until 6).map { k =>
      val tag = ('a' + k).toChar
      Seq((100L + 2 * k, s"streaming vector batch number alpha$tag"),
        (101L + 2 * k, s"hash join stream topic gamma$tag"))
        .toDF("doc_id", "text")
    }
    batches.head.coalesce(1).write.mode("append").parquet(inDir)
    val q = IndexStream.ingestKeyword(
      spark.readStream.schema(batches.head.schema).parquet(inDir),
      "text", "doc_id", s"$root/idx", s"$root/ckpt",
      compactEvery = IngestStream.AutoCompact, compactSlack = 1.5)
    try {
      q.processAllAvailable()
      batches.tail.foreach { b =>
        b.coalesce(1).write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
    } finally q.stop()
    val grown = Bm25Index.load(spark, s"$root/idx")
    assert(grown.n == 2 + 12)
    // every streamed doc is searchable
    val hits = grown.search(Seq("alphad"), 5)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(106L))
    // the auto rule fired: fewer bucket files than one-per-append
    val never = scratch("never")
    Bm25Index.build(base, "text", "doc_id", s"$never/idx", nBuckets = 4)
    batches.zipWithIndex.foreach { case (b, k) =>
      IndexStream.keywordBatch(b, k.toLong, "text", "doc_id", s"$never/idx")
    }
    val fNever = Bm25Index.load(spark, s"$never/idx").storageFootprint()._1
    assert(grown.storageFootprint()._1 < fNever,
      s"auto=${grown.storageFootprint()._1} never=$fNever")
    // the production default must NOT fire on 6 clean appends (one
    // file per bucket per batch — the r14 calibration's no-fire side)
    assert(!Bm25Index.load(spark, s"$never/idx").shouldCompact())
    assert(!grown.shouldCompact(1.5) ||
      !grown.compact().shouldCompact(1.5))
    // delivered ids survived the in-stream compacts
    assert(BatchLedger.delivered(spark, s"$root/idx", s"$root/ckpt") ==
      (0L until 6L).toSet)
  }
}
