package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bm25Index
import graft.streaming.IndexStream

/** Segment-parallel keyword ingest probe (r15) — prices the
  * production topology `keyword_stream_merge` pins for correctness:
  * S per-segment streams ingest concurrently into S shard lakes,
  * which then absorb into one index via the multi-way metadata
  * merge. Compared against the SAME corpus driven through one lake
  * sequentially (the r14 KeywordIngestProbe shape). Both arms: 200k
  * base docs + 800k appended in 50k batches; the sharded arm splits
  * everything S ways and drives each segment on its own thread
  * (concurrent Spark job submission — one shared local[32] session,
  * the same contention a multi-stream driver would see).
  *
  * Run: sbt "runMain graft.tools.ShardStreamProbe [segments]"
  * (default 4). Results in BASELINE.md.
  */
object ShardStreamProbe {
  def main(args: Array[String]): Unit = {
    val segments = args.headOption.map(_.toInt).getOrElse(4)
    val nBase = 200000L
    val nAppend = 800000L
    val perBatch = 50000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[shardstream] $label: $s%.2f s")
      (r, s)
    }
    def docsFor(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(hash(col("id") * 61 + i), lit(5000)))): _*)
          .as("text"))

    val root = java.nio.file.Files
      .createTempDirectory("graft_shardstream").toFile
    val total = nBase + nAppend
    val nb = Bm25Index.autoBuckets(total * 40)
    println(s"[shardstream] total=$total segments=$segments nBuckets=$nb")

    // ---- arm 1: one lake, sequential (the r14 shape) ----
    val (_, singleWall) = time("SINGLE lake: base build + 16 batches") {
      Bm25Index.build(docsFor(0L, nBase), "text", "doc_id",
        s"$root/single", nBuckets = nb)
      (0L until nAppend / perBatch).foreach { k =>
        IndexStream.keywordBatch(
          docsFor(nBase + k * perBatch, nBase + (k + 1) * perBatch),
          k, "text", "doc_id", s"$root/single")
      }
    }
    val single = Bm25Index.load(spark, s"$root/single")
    def top(ix: Bm25Index) = ix.search(Seq("100", "2500", "4999"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val singleTop = top(single)

    // ---- arm 2: S segment lakes, concurrent threads, then mergeAll ----
    val segTotal = total / segments
    val segBase = nBase / segments
    val (_, shardWall) = time(
      s"$segments SEGMENT lakes: concurrent base builds + batches") {
      val threads = (0 until segments).map { s =>
        new Thread(() => {
          val lo = s * segTotal
          Bm25Index.build(docsFor(lo, lo + segBase), "text", "doc_id",
            s"$root/seg$s", nBuckets = nb)
          val appendLo = lo + segBase
          val nBatches = (segTotal - segBase) / perBatch
          (0L until nBatches).foreach { k =>
            IndexStream.keywordBatch(
              docsFor(appendLo + k * perBatch,
                appendLo + (k + 1) * perBatch),
              k, "text", "doc_id", s"$root/seg$s",
              streamId = s"seg$s")
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
    }
    // quiesce handshake (r16): the segment deliveries are done, so
    // mark each lake writer-free before the merge guard checks it
    (0 until segments).foreach(s =>
      graft.streaming.Quiesce.mark(spark, s"$root/seg$s"))
    val handles = (0 until segments).map(s =>
      Bm25Index.load(spark, s"$root/seg$s"))
    val (merged, mergeT) = time(s"mergeAll of $segments segment lakes") {
      handles.head.mergeAll(handles.tail)
    }
    require(merged.n == single.n && merged.sumdl == single.sumdl,
      s"stats diverge: ${merged.n}/${merged.sumdl} vs " +
      s"${single.n}/${single.sumdl}")
    val mergedTop = top(merged)
    require(mergedTop == singleTop,
      s"search diverges: $mergedTop vs $singleTop")
    println(f"[shardstream] SINGLE $singleWall%.1f s vs " +
      f"$segments-SEGMENT $shardWall%.1f s + merge $mergeT%.2f s " +
      f"(${singleWall / (shardWall + mergeT)}%.2fx); " +
      "merged == single (stats + top-k checked)")

    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(root)
    spark.stop()
  }
}
