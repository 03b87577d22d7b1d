package graft.operators

import graft.SparkTestBase

/** Kill-mid-compact crash safety for the three postings lakes (r13,
  * the r12 verdict's ask): compaction rewrites the whole index into a
  * `.compact` sibling and swaps it live. The swap is now TWO renames
  * with the old generation retained (`Bm25Index.swapGenerations`) —
  * never delete-then-rename — and every load() runs the repair
  * (`recoverGeneration`). This spec interrupts the procedure at each
  * crash point and shows the index always reads a CONSISTENT
  * generation, mirroring BatchLedger's snapshot-first design. */
class IndexCompactCrashSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "some other corpus document text that lives in the lake"),
    (3L, "a third document with enough distinct words to shingle"),
    (4L, "and a fourth one closing out the miniature test corpus"))
    .toDF("doc_id", "text")

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-crash-$tag").toString

  private def rows(path: String): Set[String] =
    spark.read.parquet(path).collect().map(_.toString).toSet

  private def mv(a: String, b: String): Unit = {
    java.nio.file.Files.move(java.nio.file.Paths.get(a),
      java.nio.file.Paths.get(b)); ()
  }

  test("crash DURING the sibling rewrite (partial .compact on disk): " +
    "the live shingle index is untouched and a re-run compact " +
    "overwrites the partial sibling") {
    val root = scratch("partial")
    val path = s"$root/idx"
    ShingleIndex.build(docs, "doc_id", "text", path, ngram = 3,
      nBuckets = 4)
    val before = rows(path)
    // the crash footprint: a half-written sibling (one garbage file)
    val tmp = new java.io.File(path + ".compact/bucket=0")
    tmp.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + ".compact/bucket=0/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    // reads are unaffected: the live directory never changed
    assert(rows(ShingleIndex.load(spark, path).path) == before)
    // and a re-run compact simply overwrites the partial sibling
    ShingleIndex.load(spark, path).compact()
    assert(rows(path) == before)
    assert(!new java.io.File(path + ".compact").exists,
      "promoted sibling must be gone")
    assert(!new java.io.File(path + ".old").exists,
      "retired generation must be reaped")
  }

  test("crash BETWEEN the two swap renames (live dir gone, old " +
    "generation at .old, completed .compact present): load repairs " +
    "by restoring the old generation") {
    val root = scratch("midswap")
    val path = s"$root/idx"
    ShingleIndex.build(docs, "doc_id", "text", path, ngram = 3,
      nBuckets = 4)
    val before = rows(path)
    // write a COMPLETE compact sibling (what step 2 would promote),
    // then simulate the crash: live renamed away, promotion never ran
    spark.read.parquet(path).write.partitionBy("bucket")
      .parquet(path + ".compact")
    mv(path, path + ".old")
    assert(!new java.io.File(path).exists)
    val idx = ShingleIndex.load(spark, path) // must repair, not throw
    assert(rows(idx.path) == before, "old generation restored whole")
    // the leftover sibling is inert and the NEXT compact clears it
    idx.compact()
    assert(rows(path) == before)
    assert(!new java.io.File(path + ".compact").exists)
  }

  test("crash AFTER promotion (stray .old next to a healthy live " +
    "dir): load reads the new generation and reaps the leftover") {
    val root = scratch("postswap")
    val path = s"$root/idx"
    ShingleIndex.build(docs, "doc_id", "text", path, ngram = 3,
      nBuckets = 4)
    val before = rows(path)
    val old = new java.io.File(path + ".old")
    old.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + ".old/stale.bin"), Array[Byte](9))
    assert(rows(ShingleIndex.load(spark, path).path) == before)
    assert(!old.exists, "stray retired generation reaped on load")
  }

  test("the same mid-swap repair holds for the winnow and BM25 " +
    "lakes (shared swap + shared recovery)") {
    // winnow
    val wroot = scratch("winnow")
    val wpath = s"$wroot/idx"
    WinnowIndex.build(docs, "doc_id", "text", wpath, k = 3, w = 4,
      nBuckets = 4)
    val wbefore = rows(wpath)
    mv(wpath, wpath + ".old")
    assert(rows(WinnowIndex.load(spark, wpath).path) == wbefore)
    // bm25
    val broot = scratch("bm25")
    val bpath = s"$broot/idx"
    Bm25Index.build(docs, "text", "doc_id", bpath, nBuckets = 4)
    val bbefore = rows(bpath)
    mv(bpath, bpath + ".old")
    assert(rows(Bm25Index.load(spark, bpath).path) == bbefore)
    // and a full compact round-trips both through the new swap
    WinnowIndex.load(spark, wpath).compact()
    Bm25Index.load(spark, bpath).compact()
    assert(rows(wpath) == wbefore && rows(bpath) == bbefore)
  }
}
