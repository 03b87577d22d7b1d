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
