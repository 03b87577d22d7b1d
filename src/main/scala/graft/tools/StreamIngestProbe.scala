package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ShingleIndex
import graft.streaming.IngestStream

/** Streaming-ingest throughput probe (r13): the `stream_parity`
  * query pins CORRECTNESS of the micro-batched two-tier ingest; this
  * probe measures its COST at a production-ish shape so the 100 TB
  * streaming claim carries a number:
  *
  *   - lake: N base docs, indexed once (the one-time build, timed
  *     separately — production amortizes it across every crawl);
  *   - stream: B micro-batches of M docs each, through the REAL file
  *     source + foreachBatch + BatchLedger machinery;
  *   - batch twin: the same B batches folded through
  *     ShingleIndex.ingest directly (no streaming runtime).
  *
  * stream − fold = the per-batch streaming overhead (checkpoint
  * commits, ledger read/record, file-source listing) — a per-batch
  * CONSTANT, so at production batch sizes (minutes of crawl, not
  * 10k docs) it vanishes into the fold cost, which itself is the
  * bucket-pruned probe measured per-crawl in BASELINE.md.
  *
  * Run: sbt "runMain graft.tools.StreamIngestProbe [nBase] [batches] [perBatch]"
  */
object StreamIngestProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(100000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(10)
    val perBatch = args.lift(2).map(_.toLong).getOrElse(10000L)
    val compactEvery = args.lift(3) match {
      case Some("auto") => IngestStream.AutoCompact
      case other => other.map(_.toInt).getOrElse(0)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[streamprobe] $label: $s%.2f s")
      (r, s)
    }

    // synthetic crawl text: ~40 tokens from a 5k vocabulary; every
    // 10th incoming doc is a near-dup of a base doc (same token
    // stream, one token perturbed) so both dedup tiers do real work
    def docsFor(lo: Long, hi: Long, dupOfBase: Boolean): DataFrame = {
      val src = when(lit(dupOfBase) && col("id") % 10 === 0,
        pmod(col("id"), lit(nBase))).otherwise(col("id"))
      spark.range(lo, hi).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(hash(src * 61 + i), lit(5000)))): _*)
          .as("text"))
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_probe").toFile
    val base = docsFor(0L, nBase, dupOfBase = false)
      .localCheckpoint(true)
    println(s"[streamprobe] base=${base.count()} batches=$batches x $perBatch")

    val (_, buildS) = time(s"one-time lake index build ($nBase docs)") {
      ShingleIndex.build(base, "doc_id", "text", s"$root/idx_stream",
        ngram = 3)
    }

    // batch files with ascending mtimes (one per micro-batch)
    val inDir = new java.io.File(root, "input"); inDir.mkdirs()
    val t0m = System.currentTimeMillis() - 3600000L
    (0 until batches).foreach { k =>
      val lo = nBase + k * perBatch
      val stage = s"$root/stage_$k"
      docsFor(lo, lo + perBatch, dupOfBase = true)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      // ONE parquet file per micro-batch (a directory of part files
      // would make the file source cut one micro-batch per FILE)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $stage"))
      val dst = new java.io.File(inDir, f"b$k%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(t0m + k * 1000L)
    }

    val schema = base.schema
    val (_, streamS) = time(s"STREAM: $batches micro-batches through " +
      s"file source + ledger (compactEvery=$compactEvery)") {
      val q = IngestStream.ingestQuery(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(inDir.getAbsolutePath + "/*"),
        base, "doc_id", "text", s"$root/idx_stream", s"$root/out_stream",
        threshold = 0.35, checkpoint = s"$root/ckpt",
        compactEvery = compactEvery)
      try q.processAllAvailable() finally q.stop()
    }

    // the batch twin over a SECOND fresh lake (same content)
    ShingleIndex.build(base, "doc_id", "text", s"$root/idx_fold",
      ngram = 3)
    val (_, foldS) = time(s"BATCH FOLD: the same $batches batches " +
      "through ingest() directly") {
      var idx = ShingleIndex.load(spark, s"$root/idx_fold")
      val baseFp = graft.operators.SimHash
        .baseFingerprints(base, "doc_id", "text").localCheckpoint()
      (0 until batches).foreach { k =>
        val lo = nBase + k * perBatch
        val batch = graft.operators.SimHash.filterAgainstExactFp(
          baseFp, docsFor(lo, lo + perBatch, dupOfBase = true), "text")
        val (surv, grown) = idx.ingest(batch, "doc_id", "text", 0.35)
        surv.write.mode("overwrite").parquet(s"$root/out_fold/b=$k")
        idx = grown
      }
    }

    val streamed = spark.read.parquet(s"$root/out_stream").count()
    val folded = spark.read.parquet(s"$root/out_fold").count()
    println(s"[streamprobe] accepted: streamed=$streamed folded=$folded" +
      (if (streamed == folded) " (EQUAL)" else " (MISMATCH!)"))
    val docsTotal = batches.toLong * perBatch
    println(f"[streamprobe] stream ${docsTotal / streamS}%.0f docs/s; " +
      f"fold ${docsTotal / foldS}%.0f docs/s; per-batch streaming " +
      f"overhead ${(streamS - foldS) / batches}%.2f s (build once: " +
      f"$buildS%.1f s)")

    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(root)
    spark.stop()
  }
}
