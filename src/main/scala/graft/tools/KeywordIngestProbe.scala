package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bm25Index
import graft.streaming.{IndexStream, IngestStream}

/** Keyword-lake streaming-ingest cost probe (r14) — the measurement
  * behind BASELINE's bucket-repartitioned-append numbers: builds a
  * base [[Bm25Index]], drives B append batches through
  * [[IndexStream.keywordBatch]] under a chosen compaction cadence,
  * and reports ingest wall, final `bucket=*` file count, post-stream
  * search latency, and (for the never-compact arm) the cost of one
  * offline compact of the grown lake.
  *
  * Run: sbt "runMain graft.tools.KeywordIngestProbe [nBase] [batches] [perBatch] [cadence: 0|N|auto]"
  */
object KeywordIngestProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(100000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(10)
    val perBatch = args.lift(2).map(_.toLong).getOrElse(10000L)
    val cadence = args.lift(3) match {
      case Some("auto") => IngestStream.AutoCompact
      case other => other.map(_.toInt).getOrElse(0)
    }
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
      println(f"[kwprobe] $label: $s%.2f s")
      (r, s)
    }

    def docsFor(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(hash(col("id") * 61 + i), lit(5000)))): _*)
          .as("text"))

    val root = java.nio.file.Files
      .createTempDirectory("graft_kw_probe").toFile
    val base = docsFor(0L, nBase).localCheckpoint(true)
    println(s"[kwprobe] base=${base.count()} batches=$batches x " +
      s"$perBatch cadence=$cadence")
    val idxPath = s"$root/idx"
    time(s"base index build ($nBase docs)") {
      Bm25Index.build(base, "text", "doc_id", idxPath,
        nBuckets = Bm25Index.autoBuckets(nBase * 40))
    }
    val bs = (0 until batches).map { k =>
      docsFor(nBase + k * perBatch, nBase + (k + 1) * perBatch)
        .localCheckpoint(true)
    }
    val (_, wall) = time(s"$batches append batches (cadence=$cadence)") {
      bs.zipWithIndex.foreach { case (b, k) =>
        IndexStream.keywordBatch(b, k.toLong, "text", "doc_id", idxPath,
          compactEvery = cadence)
      }
    }
    val grown = Bm25Index.load(spark, idxPath)
    println(f"[kwprobe] ingest ${batches * perBatch / wall}%.0f docs/s; " +
      s"grown n=${grown.n} files=${grown.storageFootprint()._1}")
    time("post-stream 3-term search") {
      grown.search(Seq("100", "200", "300"), 10).count()
    }
    if (cadence == 0) {
      time(s"one offline compact of the grown lake") { grown.compact() }
      time("post-compact 3-term search") {
        Bm25Index.load(spark, idxPath)
          .search(Seq("100", "200", "300"), 10).count()
      }
    }

    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(root)
    spark.stop()
  }
}
