package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bm25Index

/** The oracle-visible STREAMED KEYWORD-INDEX parity run behind the
  * declared `keyword_stream_topk` query — [[StreamParity]]'s recipe
  * applied to the BM25 lake ([[IndexStream.ingestKeyword]]):
  *
  *  1. batch-build a [[Bm25Index]] over the base corpus
  *     (doc_id < 250 — the same split as the dedup-lake parity);
  *  2. stream the rest (doc_id ≥ 250) through a REAL file-source
  *     micro-batched query in three contiguous doc_id ranges
  *     ([[StreamParity.batchBounds]] — the same bounds arithmetic,
  *     so engine and oracle agree at every SF);
  *  3. replay micro-batch 1's FULL CONTENT through
  *     [[IndexStream.keywordBatch]] with the same stream id: both
  *     replay guards (the [[BatchLedger]] short-circuit and the
  *     `_ranges` exact-claim skip) must swallow it — if BOTH failed,
  *     the batch's postings and (n, Σdl) stats would double and
  *     every BM25 score downstream would shift, breaking the oracle
  *     hash. Exactly-once is load-bearing in the checked result.
  *
  * The grown index then holds EVERY document, so a top-k search over
  * it must hash-match the full-corpus BM25 oracle — the same SQL as
  * `bm25_index_topk`, which makes "streamed == batch-built" the
  * checked claim. One run per (JVM, dataset), memoized; the benched
  * steady state is the search path, the one-time stream cost is a
  * BASELINE.md line. */
object KeywordStreamParity {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Bm25Index]

  def indexAt(spark: SparkSession, sfKey: String,
      docs: DataFrame): Bm25Index =
    cache.getOrElseUpdate(sfKey, runOnce(spark, docs))

  private val mergedCache =
    scala.collection.concurrent.TrieMap.empty[String, Bm25Index]

  /** The PRODUCTION topology end-to-end (r15, the r14 verdict's ask —
    * composing the round's two new surfaces): the corpus is split
    * into three docid SEGMENTS, each segment runs its OWN
    * [[IndexStream.ingestKeyword]] stream into its own shard lake
    * (all three streams live in the session concurrently — the
    * per-segment-ingest shape), one stream gets a poisoned
    * full-content replay that its claim/ledger guards must swallow,
    * and the shard lakes then absorb into one index via the
    * file-level [[Bm25Index.merge]]. The merged index holds every
    * document exactly once, so a top-k search hash-matches the same
    * full-corpus oracle as `bm25_index_topk` — pinning the WHOLE
    * lifecycle (parallel streams → replay guards → metadata merge),
    * not just its halves. One run per (JVM, dataset), memoized. */
  def mergedIndexAt(spark: SparkSession, sfKey: String,
      docs: DataFrame): Bm25Index =
    mergedCache.getOrElseUpdate(sfKey, runMergedOnce(spark, docs))

  private def runMergedOnce(
      spark: SparkSession, docs: DataFrame): Bm25Index = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_kw_shard_stream").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(root)))
    val cols = docs.select(col("doc_id"), col("text"))
    val maxId = cols.agg(max(col("doc_id").cast("long"))).head.getLong(0)
    val segments = 3
    val width = maxId / segments + 1
    val t0 = System.currentTimeMillis() - 3600000L

    // lay out every segment's seed + stream input first, then run the
    // three streams CONCURRENTLY (started together, drained together)
    case class Seg(idx: Int, indexPath: String, checkpoint: String,
      inDir: java.io.File, schema: org.apache.spark.sql.types.StructType,
      replayLo: Long, replayHi: Long)
    val segs = (0 until segments).map { sId =>
      val lo = sId * width
      val hiEx = math.min((sId + 1) * width, maxId + 1)
      val seg = cols.filter(col("doc_id") >= lo && col("doc_id") < hiEx)
      val seedHi = lo + (hiEx - lo) / 2
      val indexPath = s"$root/shard_$sId"
      // seed build: the shard lake must exist before its stream feeds it
      Bm25Index.build(seg.filter(col("doc_id") < seedHi),
        "text", "doc_id", indexPath, nBuckets = 16)
      // two micro-batch files per segment, mtimes ascending
      val inDir = new java.io.File(root, s"input_$sId"); inDir.mkdirs()
      val mid = seedHi + (hiEx - seedHi) / 2
      Seq((seedHi, mid), (mid, hiEx)).zipWithIndex.foreach {
        case ((blo, bhi), k) =>
          val stage = s"$root/stage_${sId}_$k"
          seg.filter(col("doc_id") >= blo && col("doc_id") < bhi)
            .coalesce(1).write.mode("overwrite").parquet(stage)
          val part = new java.io.File(stage).listFiles()
            .find(_.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"shard stream: no part file in $stage"))
          val dst = new java.io.File(inDir, s"b$k.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          require(dst.setLastModified(t0 + k * 60000L),
            s"shard stream: cannot stamp mtime on $dst")
      }
      Seg(sId, indexPath, s"$root/checkpoint_$sId", inDir,
        seg.schema, seedHi, mid)
    }
    // all three per-segment streams run in the session at once
    val queries = segs.map { sg =>
      IndexStream.ingestKeyword(
        spark.readStream.schema(sg.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(sg.inDir.getAbsolutePath),
        "text", "doc_id", sg.indexPath, sg.checkpoint)
    }
    // drain + stop + QUIESCE (r16): the merge guard refuses a
    // stream-fed shard without the `_quiesced` marker, so the
    // handshake is part of the pinned topology, not test scaffolding
    try queries.zip(segs).foreach { case (q, sg) =>
      IndexStream.stopAndQuiesce(q, spark, sg.indexPath)
    } finally queries.foreach(_.stop())
    // poisoned replay on the MIDDLE segment: batch 0's full content
    // again under the same stream id — both guards must swallow it.
    // The delivery CLEARS the shard's quiesce marker at entry (any
    // restarted writer un-quiesces its lake before its first effect),
    // so the shard is re-marked once the replay returns.
    val sg1 = segs(1)
    IndexStream.keywordBatch(
      cols.filter(col("doc_id") >= sg1.replayLo &&
        col("doc_id") < sg1.replayHi),
      0L, "text", "doc_id", sg1.indexPath, streamId = sg1.checkpoint)
    require(!Quiesce.isMarked(spark, sg1.indexPath),
      "keyword shard stream: the replay delivery must have cleared " +
      "the quiesce marker at batch entry")
    Quiesce.mark(spark, sg1.indexPath)
    // the periodic merge: shard lakes absorb into one index by file
    // renames — the r15 multi-way form (one claims pass over all
    // segment ledgers, one marker, one stats write); disjoint docid
    // segments make the claims compose
    val loaded = segs.map(sg => Bm25Index.load(spark, sg.indexPath))
    loaded.head.mergeAll(loaded.tail)
  }

  private def rmTree(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(rmTree)
    f.delete(); ()
  }

  private def runOnce(spark: SparkSession, docs: DataFrame): Bm25Index = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_kw_stream").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(root)))
    val cols = docs.select(col("doc_id"), col("text"))
    val base = cols.filter(col("doc_id") < StreamParity.BaseSplit)
    val incoming = cols.filter(col("doc_id") >= StreamParity.BaseSplit)
    val maxId = incoming.agg(max(col("doc_id").cast("long")))
      .head.getLong(0)

    val indexPath = s"$root/bm25_index"
    Bm25Index.build(base, "text", "doc_id", indexPath, nBuckets = 16)

    // one parquet FILE per micro-batch, mtimes ascending (the
    // StreamParity layout: maxFilesPerTrigger=1 then replays them as
    // batches 0, 1, 2 in a fixed order)
    val inDir = new java.io.File(root, "input"); inDir.mkdirs()
    val t0 = System.currentTimeMillis() - 3600000L
    val bounds = StreamParity.batchBounds(maxId)
    bounds.zipWithIndex.foreach { case ((lo, hiEx), k) =>
      val stage = s"$root/stage_$k"
      incoming
        .filter(col("doc_id") >= lo && col("doc_id") < hiEx)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"keyword stream: no part file in $stage"))
      val dst = new java.io.File(inDir, s"b$k.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(t0 + k * 60000L),
        s"keyword stream: cannot stamp mtime on $dst")
    }

    val checkpoint = s"$root/checkpoint"
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.getAbsolutePath)
    val q = IndexStream.ingestKeyword(stream, "text", "doc_id",
      indexPath, checkpoint)
    try q.processAllAvailable() finally q.stop()

    // the poisoned replay: batch 1's full content again, same stream
    // id — the ledger (or, had the ledger crashed, the range claim)
    // must swallow it whole
    val (lo1, hi1) = bounds(1)
    IndexStream.keywordBatch(
      incoming.filter(col("doc_id") >= lo1 && col("doc_id") < hi1),
      1L, "text", "doc_id", indexPath, streamId = checkpoint)

    Bm25Index.load(spark, indexPath)
  }
}
