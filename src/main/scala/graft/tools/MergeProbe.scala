package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bm25Index, ShingleIndex}

/** Shard-merge cost probe (r14): the 100 TB index-build story is
  * shard-parallel — each worker builds an index over its docid slice
  * (local sorts only), then the shards merge as file renames. This
  * probe prices the claim at 1M docs:
  *
  *   - monolithic build of each lake (the baseline);
  *   - S shard builds over docid slices (run sequentially here —
  *     on a cluster they are embarrassingly parallel, so the honest
  *     comparison is MAX(shard) + merge vs monolithic);
  *   - the merge itself (what must be serial), measured alone.
  *
  * Run: sbt "runMain graft.tools.MergeProbe [nDocs] [shards]"
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val shards = args.lift(1).map(_.toInt).getOrElse(4)
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
      println(f"[mergeprobe] $label: $s%.2f s")
      (r, s)
    }

    def docsFor(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("w"), pmod(hash(col("id") * 61 + i), lit(5000)))): _*)
          .as("text"))

    val root = java.nio.file.Files
      .createTempDirectory("graft_merge_probe").toFile
    val docs = docsFor(0L, nDocs).localCheckpoint(true)
    println(s"[mergeprobe] corpus=${docs.count()} shards=$shards")

    // fix bucket counts so monolith and shards agree (the shard
    // contract: same parameters everywhere)
    val nb = Bm25Index.autoBuckets(nDocs * 40)

    val (_, monoB) = time(s"BM25 monolithic build ($nDocs docs)") {
      Bm25Index.build(docs, "text", "doc_id", s"$root/bm25_mono", nBuckets = nb)
    }
    val per = nDocs / shards
    val shardTimes = (0 until shards).map { sId =>
      val lo = sId * per
      val hi = if (sId == shards - 1) nDocs else lo + per
      time(s"BM25 shard $sId build [$lo,$hi)") {
        Bm25Index.build(docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "text", "doc_id", s"$root/bm25_s$sId", nBuckets = nb)
      }._2
    }
    val (_, mergeT) = time(s"BM25 merge of $shards shards (file renames)") {
      var acc = Bm25Index.load(spark, s"$root/bm25_s0")
      (1 until shards).foreach { sId =>
        acc = acc.merge(Bm25Index.load(spark, s"$root/bm25_s$sId"))
      }
      acc
    }
    println(f"[mergeprobe] BM25: monolithic $monoB%.1f s vs parallel-shard " +
      f"max(${shardTimes.max}%.1f) + merge $mergeT%.2f s " +
      f"(sum of shard builds ${shardTimes.sum}%.1f s)")

    val snb = ShingleIndex.AutoBuckets // derive from corpus inside build
    val (_, smono) = time(s"shingle monolithic build") {
      ShingleIndex.build(docs, "doc_id", "text", s"$root/sh_mono", ngram = 3)
    }
    // shards must share nBuckets: read the monolith's choice
    val monoIdx = ShingleIndex.load(spark, s"$root/sh_mono")
    val sShardTimes = (0 until shards).map { sId =>
      val lo = sId * per
      val hi = if (sId == shards - 1) nDocs else lo + per
      time(s"shingle shard $sId build [$lo,$hi)") {
        ShingleIndex.build(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", "text", s"$root/sh_s$sId", ngram = 3,
          nBuckets = monoIdx.nBuckets)
      }._2
    }
    val (_, sMergeT) = time(s"shingle merge of $shards shards") {
      var acc = ShingleIndex.load(spark, s"$root/sh_s0")
      (1 until shards).foreach { sId =>
        acc = acc.merge(ShingleIndex.load(spark, s"$root/sh_s$sId"))
      }
      acc
    }
    println(f"[mergeprobe] shingle: monolithic $smono%.1f s vs " +
      f"parallel-shard max(${sShardTimes.max}%.1f) + merge $sMergeT%.2f s")
    // Bm25.TokenPattern splits "w123" into "w" + "123": search digit
    // terms (every doc contains "w", so it matches but scores ~0)
    println(s"[mergeprobe] merged shingle nDocs=" +
      s"${ShingleIndex.load(spark, s"$root/sh_s0").nDocs} " +
      s"(expect $nDocs); bm25 probe check: " +
      Bm25Index.load(spark, s"$root/bm25_s0")
        .search(Seq("100", "200"), 5).count() + " rows"
    )
    snb.hashCode()

    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(root)
    spark.stop()
  }
}
