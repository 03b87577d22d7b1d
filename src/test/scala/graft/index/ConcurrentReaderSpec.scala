package graft.index

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{AnnLsh, HyperplaneLsh, Ivf}

/** THE r16 verdict's headline ask: the partition-layout indexes must
  * be safe for CONCURRENT READERS across maintenance. The manifest
  * snapshot storage ([[Manifests]]) delivers it structurally — a
  * DataFrame resolves its snapshot's file listing when created, and
  * maintenance never mutates a committed generation, only commits new
  * ones — so this spec holds readers open across a compact AND a grow
  * (and a retrain, and an append) and demands exact pre-maintenance
  * results, then pins the retention horizon honestly: a snapshot
  * survives two further commits and expires at the third.
  *
  * At 100 TB this is the difference between "maintenance windows
  * only" and routine operations: a multi-minute scan overlapping a
  * compaction is the NORMAL case on a busy cluster. */
class ConcurrentReaderSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)
  private def around(dir: Int, n: Int, from: Long) =
    (0 until n).map { i =>
      (from + i, Array.tabulate(8)(d =>
        (if (d == dir) 1.0f else 0.0f) + rnd.nextFloat() * 0.15f))
    }

  test("an IVF reader pinned BEFORE maintenance reads its exact " +
    "snapshot through a concurrent compact AND a concurrent grow; a " +
    "fresh load sees the post-maintenance state") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-reader-ivf").toString + "/idx"
    val ref = (around(0, 40, 0L) ++ around(2, 40, 100L) ++
      around(4, 40, 200L)).toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 3, sampleSize = 200)
    val idx = IvfVectorIndex.build(ref, "embedding", "vec_id", path, model)
    // novel mass appended (still pre-pin), so the grow below has
    // something to capture
    idx.append(around(6, 30, 300L).toDF("vec_id", "embedding"),
      "embedding", "vec_id")
    // ---- the reader opens: snapshot resolved NOW ----
    val pinnedDf = IvfVectorIndex.load(spark, path).df
    val pinnedSearch = IvfVectorIndex.load(spark, path)
      .search(Array.tabulate(8)(d => if (d == 0) 1.0f else 0.0f), 10,
        nprobe = 1)
    val expectRows = IvfVectorIndex.load(spark, path).df
      .select("docid", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val expectTop = IvfVectorIndex.load(spark, path)
      .search(Array.tabulate(8)(d => if (d == 0) 1.0f else 0.0f), 10,
        nprobe = 1).select("docid").collect().map(_.getLong(0)).toSeq
    // ---- maintenance happens UNDER the open reader ----
    val compacted = IvfVectorIndex.load(spark, path).compact()
    val homes = compacted.df.filter(col("docid") >= 300L)
      .select("cluster").distinct().collect().map(_.getInt(0)).toSeq
    val grown = compacted.growClusters(homes, add = 1)
    assert(grown.model.centroids.length == 4, "grow really ran")
    // ---- the pinned reader completes, exactly on its snapshot ----
    val got = pinnedDf.select("docid", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expectRows,
      "the pinned snapshot must be read exactly, not the mutated state")
    val gotTop = pinnedSearch.select("docid").collect()
      .map(_.getLong(0)).toSeq
    assert(gotTop == expectTop,
      "a pinned search plan must return its snapshot's results")
    // ---- a fresh reader sees the post-maintenance truth ----
    val fresh = IvfVectorIndex.load(spark, path)
    assert(fresh.model.centroids.length == 4)
    val freshRows = fresh.df.select("docid").collect()
      .map(_.getLong(0)).toSet
    assert(freshRows == expectRows.map(_._1), "same corpus, new layout")
    val novelTop = fresh.search(
      Array.tabulate(8)(d => if (d == 6) 1.0f else 0.0f), 5, nprobe = 1)
      .select("docid").collect().map(_.getLong(0))
    assert(novelTop.forall(_ >= 300L), "the grown cell serves queries")
  }

  test("the retention horizon is exact: a pinned snapshot survives " +
    "two further commits and expires at the third (its files are " +
    "reaped) — the documented reader contract") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-reader-horizon").toString + "/idx"
    val ref = (around(0, 40, 0L) ++ around(2, 40, 100L))
      .toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 2, sampleSize = 100)
    IvfVectorIndex.build(ref, "embedding", "vec_id", path, model)
    val pinned = IvfVectorIndex.load(spark, path).df // snapshot m1
    val expect = ref.count()
    IvfVectorIndex.load(spark, path).compact() // m2
    assert(pinned.count() == expect, "survives the first commit")
    IvfVectorIndex.load(spark, path).compact() // m3
    assert(pinned.count() == expect, "survives the second commit")
    IvfVectorIndex.load(spark, path).compact() // m4: m1 expires
    // the pinned snapshot's generation is gone — reading it now must
    // fail (loudly, not silently wrong); this is the horizon a
    // deployment sizes `retain` against
    intercept[Throwable] {
      // the FileIndex was resolved at pin time; the data files are
      // reaped, so the scan dies on missing input
      pinned.select("docid").collect()
    }
    assert(IvfVectorIndex.load(spark, path).count() == expect)
  }

  test("a reader pinned on the merge DESTINATION reads its snapshot " +
    "through a concurrent shard absorption; a fresh load sees the " +
    "merged corpus") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-reader-merge").toString
    val ref = (around(0, 40, 0L) ++ around(2, 40, 100L) ++
      around(4, 40, 200L)).toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 3, sampleSize = 200)
    val dst = IvfVectorIndex.build(ref.filter(col("vec_id") < 120),
      "embedding", "vec_id", s"$base/dst", model)
    val shard = IvfVectorIndex.build(ref.filter(col("vec_id") >= 120),
      "embedding", "vec_id", s"$base/shard", model)
    val pinned = IvfVectorIndex.load(spark, s"$base/dst").df
    dst.mergeAll(Seq(shard))
    assert(pinned.count() == 60,
      "the pinned reader must see the pre-merge snapshot exactly")
    assert(IvfVectorIndex.load(spark, s"$base/dst").count() == 120,
      "a fresh reader sees the absorbed shard")
  }

  test("an LSH reader pinned before maintenance reads its snapshot " +
    "through a concurrent compact + append; bucket pruning still " +
    "shows in the fresh index's plan") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-reader-lsh").toString + "/idx"
    val docs = (around(0, 60, 0L) ++ around(2, 60, 100L))
      .toDF("vec_id", "embedding")
    val lsh = HyperplaneLsh(dim = 8, nbits = 4, seed = 7L)
    LshVectorIndex.build(docs, "embedding", "vec_id", path, lsh)
    val pinned = LshVectorIndex.load(spark, path).df
    val expect = pinned.select("docid").collect().map(_.getLong(0)).toSet
    // maintenance under the reader: append + compact (two commits)
    LshVectorIndex.load(spark, path)
      .append(around(2, 20, 700L).toDF("vec_id", "embedding"),
        "embedding", "vec_id")
    LshVectorIndex.load(spark, path).compact()
    val got = pinned.select("docid").collect().map(_.getLong(0)).toSet
    assert(got == expect, "pinned LSH snapshot read exactly")
    val fresh = LshVectorIndex.load(spark, path)
    assert(fresh.count() == expect.size + 20)
    // partition pruning survives the manifest layout: the probed scan
    // carries a bucket partition filter
    val q = Array.tabulate(8)(d => if (d == 0) 1.0f else 0.0f)
    val plan = fresh.search(q, 5, probes = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket pruning missing from plan:\n$plan")
    val top = fresh.search(q, 5, probes = 4).select("docid")
      .collect().map(_.getLong(0))
    assert(top.nonEmpty)
    assert(AnnLsh.bucketize(docs.limit(1), "embedding", lsh)
      .columns.contains("bucket")) // seam sanity
  }

  test("the POSTINGS LAKES join the discipline (r17): a BM25 search " +
    "and a shingle probe pinned before maintenance read their exact " +
    "snapshots through a concurrent compact AND a concurrent shard " +
    "merge; fresh loads see the merged corpus") {
    import graft.operators.{Bm25Index, ShingleIndex}
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "some other corpus document text that lives in the lake"),
      (3L, "a third document with enough distinct words to shingle"),
      (4L, "and a fourth one closing out the miniature test corpus"),
      (10L, "vector search with hash joins is a database topic"),
      (11L, "the lazy dog sleeps while the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft-reader-lakes").toString
    // ---- BM25: build + append (fragments the lake), pin, maintain
    Bm25Index.build(corpus.filter(col("doc_id") <= 2), "text",
        "doc_id", s"$base/bm", nBuckets = 4)
      .append(corpus.filter(col("doc_id") === 3 || col("doc_id") === 4),
        "text", "doc_id")
    val bmShard = Bm25Index.build(corpus.filter(col("doc_id") >= 10),
      "text", "doc_id", s"$base/bmshard", nBuckets = 4)
    val pinnedPostings = Bm25Index.load(spark, s"$base/bm").postings
    val pinnedSearch = Bm25Index.load(spark, s"$base/bm")
      .search(Seq("quick", "corpus"), 5)
    val expectPostings = Bm25Index.load(spark, s"$base/bm").postings
      .collect().map(_.toString).toSet
    val expectTop = Bm25Index.load(spark, s"$base/bm")
      .search(Seq("quick", "corpus"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // maintenance UNDER the open reader: compact, then shard merge
    val bmCompacted = Bm25Index.load(spark, s"$base/bm").compact()
    bmCompacted.mergeAll(Seq(bmShard))
    assert(pinnedPostings.collect().map(_.toString).toSet
      == expectPostings,
      "the pinned BM25 snapshot must be read exactly")
    assert(pinnedSearch.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == expectTop,
      "a pinned BM25 search plan must return its snapshot's ranking")
    val bmFresh = Bm25Index.load(spark, s"$base/bm")
    assert(bmFresh.n == 6, "fresh reader sees the merged corpus")
    assert(bmFresh.search(Seq("vector"), 3).collect()
      .map(_.getLong(0)).contains(10L))
    // ---- shingle: pin a probe, compact + merge underneath it
    ShingleIndex.build(corpus.filter(col("doc_id") <= 4), "doc_id",
      "text", s"$base/sh", ngram = 3, nBuckets = 4)
    val shShard = ShingleIndex.build(corpus.filter(col("doc_id") >= 10),
      "doc_id", "text", s"$base/shshard", ngram = 3, nBuckets = 4)
    val incoming = Seq(
      (20L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val pinnedProbe = ShingleIndex.load(spark, s"$base/sh")
      .probe(incoming, "doc_id", "text", threshold = 0.3)
    val expectProbe = ShingleIndex.load(spark, s"$base/sh")
      .probe(incoming, "doc_id", "text", threshold = 0.3)
      .collect().map(_.toString).toSet
    val shCompacted = ShingleIndex.load(spark, s"$base/sh").compact()
    shCompacted.mergeAll(Seq(shShard))
    assert(pinnedProbe.collect().map(_.toString).toSet == expectProbe,
      "the pinned shingle probe must read its snapshot exactly")
    // fresh probe sees the merged lake: doc 11 shares the fox shingles
    val freshPairs = ShingleIndex.load(spark, s"$base/sh")
      .probe(incoming, "doc_id", "text", threshold = 0.3)
      .select("old_id").collect().map(_.getLong(0)).toSet
    assert(freshPairs.contains(11L),
      s"merged shard must serve fresh probes, got $freshPairs")
  }
}
