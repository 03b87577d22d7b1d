package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bm25Index, ShingleIndex}

/** Merge fan-in probe (r15, the r14 verdict's ask): MergeProbe priced
  * 4 shards; a 100 TB build merges HUNDREDS of segment shards, and a
  * file-level merge multiplies per-bucket file counts by the shard
  * count — the question is what that costs the probe path and whether
  * the auto-compaction rule catches it. For each fan-in S this probe
  * measures, over the same corpus:
  *
  *   - per-shard build (max = the parallel wall on a cluster) and the
  *     serial merge of S shards (O(files) renames — expect it to grow
  *     with S but stay metadata-cheap);
  *   - the merged lake's bucket-file count and whether
  *     `shouldCompact` (production slack) fires — the many-shard
  *     merge is exactly the fragmentation shape the rule exists for;
  *   - search/probe latency on the merged lake BEFORE and AFTER
  *     `compact` (min of 3) — the probe tax of S× fragmentation and
  *     what compaction buys back;
  *   - post-compact `shouldCompact` (must be false — the cycle
  *     settles).
  *
  * Run: sbt "runMain graft.tools.MergeFanInProbe [nDocs] [s1,s2,...]"
  * (defaults 1000000 and 4,16,64). Results recorded in BASELINE.md.
  */
object MergeFanInProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val fanIns = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(4, 16, 64))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def minOf3(f: => Unit): Double =
      (1 to 3).map(_ => time(f)._2).min

    def docsFor(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(hash(col("id") * 61 + i), lit(5000)))): _*)
          .as("text"))

    val docs = docsFor(0L, nDocs).localCheckpoint(true)
    val nb = Bm25Index.autoBuckets(nDocs * 40)
    println(s"[fanin] corpus=${docs.count()} nBuckets=$nb " +
      s"fanIns=${fanIns.mkString(",")}")

    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }

    fanIns.foreach { shards =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_fanin_$shards").toFile
      val per = nDocs / shards
      val buildTimes = (0 until shards).map { sId =>
        val lo = sId * per
        val hi = if (sId == shards - 1) nDocs else lo + per
        time {
          Bm25Index.build(
            docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
            "text", "doc_id", s"$root/s$sId", nBuckets = nb)
        }._2
      }
      // multi-way merge (r15): ONE claims pass + marker + stats write
      // for the whole fan-in — the pairwise chain paid ~0.6 s of
      // metadata jobs per shard (36 s at S=64; see BASELINE). Shard
      // handles load OUTSIDE the timer (a per-shard _stats read a real
      // build would already hold from the build step).
      val handles = (0 until shards).map(sId =>
        Bm25Index.load(spark, s"$root/s$sId"))
      val (merged0, mergeT) = time {
        handles.head.mergeAll(handles.tail)
      }
      require(merged0.n == nDocs, s"merged n=${merged0.n}")
      val (filesPre, bytes) = merged0.storageFootprint()
      val firesPre = merged0.shouldCompact() // production slack = 16
      val terms = Seq("100", "2500", "4999")
      val probePre = minOf3 {
        merged0.search(terms, 10).collect(); ()
      }
      val (compacted, compactT) = time { merged0.compact() }
      val (filesPost, _) = compacted.storageFootprint()
      val firesPost = compacted.shouldCompact()
      val probePost = minOf3 {
        compacted.search(terms, 10).collect(); ()
      }
      println(f"[fanin] S=$shards%-3d buildMax=${buildTimes.max}%6.1f s " +
        f"buildSum=${buildTimes.sum}%7.1f s merge=$mergeT%6.2f s " +
        f"files=$filesPre%6d (${bytes / (1 << 20)}%5d MiB) " +
        f"shouldCompact=$firesPre%-5s probe=$probePre%5.2f s | " +
        f"compact=$compactT%6.1f s files=$filesPost%5d " +
        f"shouldCompact=$firesPost%-5s probe=$probePost%5.2f s")
      rm(root)
    }

    // the shingle lake twin at the largest fan-in: same question for
    // the dedup probe path (survivors = broadcast probe against the
    // bucketed postings)
    val shards = fanIns.max
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_fanin_sh_$shards").toFile
    val per = nDocs / shards
    val mono = ShingleIndex.build(docs.limit(1), "doc_id", "text",
      s"$root/nbprobe", ngram = 3) // learn the auto bucket count cheaply
    val snb = mono.nBuckets
    val shBuild = (0 until shards).map { sId =>
      val lo = sId * per
      val hi = if (sId == shards - 1) nDocs else lo + per
      time {
        ShingleIndex.build(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", "text", s"$root/s$sId", ngram = 3, nBuckets = snb)
      }._2
    }
    val shHandles = (0 until shards).map(sId =>
      ShingleIndex.load(spark, s"$root/s$sId"))
    val (shMerged, shMergeT) = time {
      shHandles.head.mergeAll(shHandles.tail)
    }
    val incoming = docsFor(nDocs, nDocs + 2000).localCheckpoint(true)
    val probePre = minOf3 {
      shMerged.survivors(incoming, "doc_id", "text", 0.5).count(); ()
    }
    val firesPre = shMerged.shouldCompact()
    val (shCompacted, shCompactT) = time { shMerged.compact() }
    val probePost = minOf3 {
      shCompacted.survivors(incoming, "doc_id", "text", 0.5).count(); ()
    }
    println(f"[fanin] shingle S=$shards buildMax=${shBuild.max}%6.1f s " +
      f"merge=$shMergeT%6.2f s shouldCompact=$firesPre%-5s " +
      f"probe=$probePre%5.2f s | compact=$shCompactT%6.1f s " +
      f"shouldCompact=${shCompacted.shouldCompact()}%-5s " +
      f"probe=$probePost%5.2f s")
    rm(root)
    spark.stop()
  }
}
