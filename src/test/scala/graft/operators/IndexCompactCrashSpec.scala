package graft.operators

import graft.SparkTestBase
import graft.index.Manifests

/** Kill-mid-compact crash safety for the three postings lakes —
  * rewritten in r17 for the manifest-snapshot storage (the pre-r17
  * protocol swapped the live directory through two renames; the spec
  * used to interrupt that swap at each rename). Under manifests the
  * compact rewrite lands whole in a fresh `gen=…` directory and the
  * atomic manifest commit is the only visibility point, so the crash
  * surface is simpler: anything that dies BEFORE the commit leaves
  * the lake bit-identical to before (the torn generation is an
  * invisible orphan, reaped once manifests roll past the retention
  * window), and there is no moment without a readable index. */
class IndexCompactCrashSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "some other corpus document text that lives in the lake"),
    (3L, "a third document with enough distinct words to shingle"),
    (4L, "and a fourth one closing out the miniature test corpus"))
    .toDF("doc_id", "text")

  private def moreDocs(lo: Long, n: Int) = (0 until n).map(i =>
      (lo + i, s"extra filler document number ${lo + i} with words " +
        s"alpha beta gamma delta epsilon zeta"))
    .toDF("doc_id", "text")

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-crash-$tag").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("crash DURING the compact rewrite (partial uncommitted gen on " +
    "disk): the live shingle snapshot is bit-identical, a re-run " +
    "compact succeeds, and the orphan generation is reaped once " +
    "manifests roll past retention") {
    val root = scratch("partial")
    val path = s"$root/idx"
    val idx = ShingleIndex.build(docs, "doc_id", "text", path, ngram = 3,
      nBuckets = 4)
    val before = rows(idx.postings)
    // the crash footprint: a torn generation directory that no
    // manifest references (the rewrite died mid-write)
    val m = Manifests.require(spark, path)
    val orphan = Manifests.genDirName(m.n + 1)
    val tornDir = new java.io.File(s"$path/$orphan/bucket=0")
    tornDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/$orphan/bucket=0/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    // reads are unaffected: the committed snapshot never references it
    assert(rows(ShingleIndex.load(spark, path).postings) == before)
    // a re-run compact overwrites the torn generation in place (same
    // next-gen name) and commits it whole
    val compacted = ShingleIndex.load(spark, path).compact()
    assert(rows(compacted.postings) == before)
    // roll enough commits for retention to pass the pre-compact
    // manifests out of the window, then check nothing torn survived:
    // every on-disk generation is manifest-referenced
    var cur = compacted
    (0 until Manifests.DefaultRetain + 1).foreach { i =>
      cur = cur.appendBatch(moreDocs(100L + i * 10, 2), "doc_id", "text")
    }
    val live = Manifests.require(spark, path).parts
      .map(Manifests.genOf).toSet
    val onDisk = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
      .map(_.getName).toSet
    // retained older manifests may hold more gens; the torn orphan
    // (never committed) must be gone
    assert(!onDisk.contains(orphan) || live.contains(orphan),
      s"torn orphan $orphan survived retention: $onDisk")
  }

  test("a COMPLETE but uncommitted compact generation stays invisible " +
    "(the crash-before-commit window): the lake reads the fragmented " +
    "snapshot, without duplicates from the orphan") {
    val root = scratch("uncommitted")
    val path = s"$root/idx"
    val idx = ShingleIndex.build(docs, "doc_id", "text", path, ngram = 3,
      nBuckets = 4)
    val before = rows(idx.postings)
    // write the full compacted tree exactly where compact would, but
    // crash before the manifest commit
    val m = Manifests.require(spark, path)
    val gen = Manifests.genDirName(m.n + 1)
    Manifests.dataFrame(spark, path, m)
      .repartition(org.apache.spark.sql.functions.col("bucket"))
      .write.partitionBy("bucket").parquet(s"$path/$gen")
    // every posting exists TWICE on disk now — but the snapshot read
    // sees exactly the committed set, once
    assert(rows(ShingleIndex.load(spark, path).postings) == before,
      "uncommitted compact output must not double postings")
  }

  test("the same crash-before-commit invisibility holds for the " +
    "winnow and BM25 lakes (shared manifest storage)") {
    // winnow
    val wroot = scratch("winnow")
    val wpath = s"$wroot/idx"
    val wIdx = WinnowIndex.build(docs, "doc_id", "text", wpath, k = 3,
      w = 4, nBuckets = 4)
    val wbefore = rows(wIdx.postings)
    val wm = Manifests.require(spark, wpath)
    Manifests.dataFrame(spark, wpath, wm)
      .repartition(org.apache.spark.sql.functions.col("bucket"))
      .write.partitionBy("bucket")
      .parquet(s"$wpath/${Manifests.genDirName(wm.n + 1)}")
    assert(rows(WinnowIndex.load(spark, wpath).postings) == wbefore)
    // bm25
    val broot = scratch("bm25")
    val bpath = s"$broot/idx"
    val bIdx = Bm25Index.build(docs, "text", "doc_id", bpath, nBuckets = 4)
    val bbefore = rows(bIdx.postings)
    val bm = Manifests.require(spark, bpath)
    Manifests.dataFrame(spark, bpath, bm)
      .repartition(org.apache.spark.sql.functions.col("bucket"))
      .write.partitionBy("bucket")
      .parquet(s"$bpath/${Manifests.genDirName(bm.n + 1)}")
    assert(rows(Bm25Index.load(spark, bpath).postings) == bbefore)
    // and a real compact round-trips both (the orphan's next-gen slot
    // is simply overwritten and committed)
    assert(rows(WinnowIndex.load(spark, wpath).compact().postings)
      == wbefore)
    assert(rows(Bm25Index.load(spark, bpath).compact().postings)
      == bbefore)
  }
}
