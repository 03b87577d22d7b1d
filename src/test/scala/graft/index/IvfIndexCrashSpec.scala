package graft.index

import graft.SparkTestBase
import graft.operators.Ivf

/** Interrupted-maintenance crash safety for the IVF vector index
  * (r14, the r13 verdict's ask — parity with the postings lakes'
  * IndexCompactCrashSpec): compact now swaps via the shared
  * two-rename [[Generations]] protocol, and retrain-in-place commits
  * through a staged roll-forward (`_retrain` + COMMIT marker). This
  * spec plants each crash footprint by hand and shows load() always
  * yields a consistent, fully-readable generation. */
class IvfIndexCrashSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def around(dir: Int, n: Int, from: Long) =
    (0 until n).map { i =>
      (from + i, Array.tabulate(8)(d =>
        (if (d == dir) 1.0f else 0.0f) + rnd.nextFloat() * 0.15f))
    }

  private def freshIndex(tag: String): (String, IvfVectorIndex) = {
    val path = java.nio.file.Files
      .createTempDirectory(s"graft-ivfcrash-$tag").toString + "/idx"
    val ref = (around(0, 40, 0L) ++ around(2, 40, 100L) ++
      around(4, 40, 200L)).toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 3, sampleSize = 200)
    (path, IvfVectorIndex.build(ref, "embedding", "vec_id", path, model))
  }

  private def rows(path: String): Set[(Long, Int)] =
    spark.read.parquet(path).select("docid", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def centroidSig(path: String): Seq[Seq[Float]] =
    spark.read.parquet(s"$path/_centroids").orderBy("cluster")
      .collect().map(_.getSeq[Float](1).toSeq).toIndexedSeq

  private def mv(a: String, b: String): Unit = {
    java.nio.file.Files.move(java.nio.file.Paths.get(a),
      java.nio.file.Paths.get(b)); ()
  }

  test("compact crash DURING the sibling rewrite: live index " +
    "untouched, re-run compact overwrites the partial sibling") {
    val (path, _) = freshIndex("partial")
    val before = rows(path)
    new java.io.File(path + ".compact/cluster=0").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + ".compact/cluster=0/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(rows(IvfVectorIndex.load(spark, path).path) == before)
    IvfVectorIndex.load(spark, path).compact()
    assert(rows(path) == before)
    assert(!new java.io.File(path + ".compact").exists)
    assert(!new java.io.File(path + ".old").exists)
  }

  test("compact crash BETWEEN the two swap renames: load restores " +
    "the old generation whole (codebook included) and search works") {
    val (path, idx) = freshIndex("midswap")
    val before = rows(path)
    val cen = centroidSig(path)
    // the footprint: live retired to .old, promotion never ran
    spark.read.parquet(path).write.partitionBy("cluster")
      .parquet(path + ".compact")
    mv(path, path + ".old")
    assert(!new java.io.File(path).exists)
    val recovered = IvfVectorIndex.load(spark, path)
    assert(rows(path) == before)
    assert(centroidSig(path) == cen, "codebook restored with the data")
    val q = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    assert(recovered.search(q, 5, nprobe = 1).count() == 5)
    recovered.compact() // leftover sibling cleared by the next compact
    assert(rows(path) == before)
    assert(!new java.io.File(path + ".compact").exists)
    idx.hashCode() // silence unused warning
  }

  test("compact crash AFTER promotion: stray .old reaped on load, " +
    "new generation live") {
    val (path, _) = freshIndex("postswap")
    val before = rows(path)
    val old = new java.io.File(path + ".old")
    old.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path + ".old/stale.bin"), Array[Byte](9))
    assert(rows(IvfVectorIndex.load(spark, path).path) == before)
    assert(!old.exists)
  }

  test("retrain crash BEFORE the COMMIT marker: staging rolled back, " +
    "index byte-identical") {
    val (path, _) = freshIndex("precommit")
    val before = rows(path)
    val cen = centroidSig(path)
    // footprint: staged data + codebook, marker never written
    spark.read.parquet(path).filter($"cluster" === 0)
      .write.partitionBy("cluster").parquet(s"$path/_retrain/data")
    spark.read.parquet(s"$path/_centroids")
      .write.parquet(s"$path/_retrain/centroids")
    val idx = IvfVectorIndex.load(spark, path)
    assert(!new java.io.File(s"$path/_retrain").exists,
      "uncommitted staging must be rolled back")
    assert(rows(path) == before)
    assert(centroidSig(path) == cen)
    idx.hashCode()
  }

  test("retrain crash AFTER the COMMIT marker (no swap ran): load " +
    "rolls the whole commit forward — staged clusters and codebook " +
    "go live, staging reaped") {
    val (path, _) = freshIndex("committed")
    // stage a recognizable new generation of cluster 0: its rows with
    // docids shifted by +1000 (stands in for a reassignment), plus a
    // patched codebook (centroid 0 negated)
    val staged = spark.read.parquet(path).filter($"cluster" === 0)
      .withColumn("docid", $"docid" + 1000L)
    val stagedIds = staged.select("docid").collect()
      .map(_.getLong(0)).toSet
    staged.write.partitionBy("cluster").parquet(s"$path/_retrain/data")
    val patched = spark.read.parquet(s"$path/_centroids")
      .withColumn("centroid", org.apache.spark.sql.functions.transform(
        $"centroid", x => org.apache.spark.sql.functions.when(
          $"cluster" === 0, -x).otherwise(x)))
    patched.write.parquet(s"$path/_retrain/centroids")
    val exp = patched.orderBy("cluster")
      .collect().map(_.getSeq[Float](1).toSeq).toIndexedSeq
    new java.io.File(s"$path/_retrain/COMMIT").createNewFile()
    val idx = IvfVectorIndex.load(spark, path)
    assert(!new java.io.File(s"$path/_retrain").exists)
    val live = rows(path)
    assert(live.filter(_._2 == 0).map(_._1) == stagedIds,
      "cluster 0 must be the staged generation")
    assert(centroidSig(path) == exp, "patched codebook live")
    assert(idx.model.centroids(0).toSeq == exp(0))
  }

  test("retrain crash MID-SWAP (live cluster deleted, staged still " +
    "present): load completes the rename — no row loss") {
    val (path, _) = freshIndex("midswapretrain")
    val cluster0 = spark.read.parquet(path).filter($"cluster" === 0)
    val ids0 = cluster0.select("docid").collect().map(_.getLong(0)).toSet
    assert(ids0.nonEmpty)
    val others = rows(path).filterNot(_._2 == 0)
    cluster0.write.partitionBy("cluster").parquet(s"$path/_retrain/data")
    new java.io.File(s"$path/_retrain/COMMIT").createNewFile()
    // the crash window: live partition deleted, staged rename pending
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path, "cluster=0"))
    val idx = IvfVectorIndex.load(spark, path)
    val live = rows(path)
    assert(live.filter(_._2 == 0).map(_._1) == ids0, "cluster restored")
    assert(live.filterNot(_._2 == 0) == others, "others untouched")
    assert(idx.count() == live.size)
  }

  test("retrain crash between codebook delete and rename: load " +
    "restores a codebook (the staged one) — never an unreadable index") {
    val (path, _) = freshIndex("cenwindow")
    val cen = centroidSig(path)
    spark.read.parquet(s"$path/_centroids")
      .write.parquet(s"$path/_retrain/centroids")
    new java.io.File(s"$path/_retrain/COMMIT").createNewFile()
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path, "_centroids"))
    val idx = IvfVectorIndex.load(spark, path) // must not throw
    assert(centroidSig(path) == cen)
    assert(idx.model.centroids.length == 3)
  }

  test("retrain that EMPTIES a drifted cluster deletes its live " +
    "partition — no duplicate docids (NORMAL path, r15: zero " +
    "reassigned rows → partitionBy stages no dir for it)") {
    def vec(deg: Double): Seq[Float] = Seq(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfcrash-zerorow").toString + "/idx"
    // hand codebook: c0 at 0°, c1 at 90° on the unit circle
    val model = Ivf.Model(Array(vec(0).toArray, vec(90).toArray))
    // rows at 44° assign to cluster 0 (cos 44° > cos 46°); one row at
    // 60° assigns to cluster 1
    val docs = (Seq(0L, 1L, 2L).map(id => (id, vec(44))) :+
      ((3L, vec(60)))).toDF("vec_id", "embedding")
    val idx = IvfVectorIndex.build(docs, "embedding", "vec_id", path, model)
    assert(rows(path) == Set((0L, 0), (1L, 0), (2L, 0), (3L, 1)))
    // single-cluster retrain walks c1 onto its own row at 60° — now
    // cluster 0's rows at 44° sit NEARER c1 (16°) than their own
    // centroid (44°): the legitimate drift precondition
    val patched = idx.retrainInPlace(Seq(1), iters = 3)
    assert(patched.model.nearest(vec(44).toArray).head == 1)
    // full retrain: Lloyd from seeds {0°, 60°} hands ALL four rows to
    // the refined c1; c0 attracts nothing and keeps its seed. The
    // staged write therefore has NO cluster=0 data dir — without the
    // explicit empty-dir staging, cluster 0's live partition (rows
    // 0,1,2 — ALSO reassigned into the staged cluster 1) survives the
    // commit and the index reads 7 rows with duplicated docids.
    val after = patched.retrainInPlace(Seq(0, 1), iters = 3)
    val live = rows(path)
    assert(live.map(_._1) == Set(0L, 1L, 2L, 3L),
      s"duplicated or lost docids: $live")
    assert(live.size == 4, s"stale emptied-cluster partition: $live")
    assert(live.forall(_._2 == 1), s"all rows belong to cluster 1: $live")
    assert(after.count() == 4)
    assert(IvfVectorIndex.load(spark, path).count() == 4)
  }

  test("retrain crash AFTER the marker with an EMPTY staged cluster " +
    "dir: load deletes the emptied cluster's live partition (the " +
    "crash twin of the zero-reassigned-rows case)") {
    val (path, _) = freshIndex("emptystaged")
    val before = rows(path)
    // footprint: every row of clusters 0 and 1 was reassigned into the
    // staged cluster 0; cluster 1 emptied, staged as an explicit empty
    // dir; marker written; death before any promote
    spark.read.parquet(path)
      .filter($"cluster".isin(0, 1))
      .withColumn("cluster", org.apache.spark.sql.functions.lit(0))
      .write.partitionBy("cluster").parquet(s"$path/_retrain/data")
    new java.io.File(s"$path/_retrain/data/cluster=1").mkdirs()
    new java.io.File(s"$path/_retrain/COMMIT").createNewFile()
    val idx = IvfVectorIndex.load(spark, path)
    val live = rows(path)
    assert(!new java.io.File(s"$path/_retrain").exists)
    assert(live.map(_._1) == before.map(_._1), "no rows lost or duplicated")
    assert(!live.exists(_._2 == 1), "emptied cluster's live partition gone")
    assert(live.count(_._2 == 0) ==
      before.count(r => r._2 == 0 || r._2 == 1))
    assert(idx.count() == live.size)
  }

  test("interrupted APPEND leaves the old generation fully readable " +
    "(in-flight task output is invisible to readers)") {
    val (path, idx) = freshIndex("append")
    val before = rows(path)
    // the footprint of a mid-append crash: an uncommitted _temporary
    // tree (what FileOutputCommitter stages before job commit)
    new java.io.File(s"$path/_temporary/0/task_junk").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_temporary/0/task_junk/part.parquet"),
      Array[Byte](7, 7))
    assert(rows(IvfVectorIndex.load(spark, path).path) == before)
    val q = Array.tabulate(8)(i => if (i == 2) 1.0f else 0.0f)
    assert(idx.search(q, 5, nprobe = 1).count() == 5)
    // and a clean re-run of the append lands whole
    val more = around(2, 10, 900L).toDF("vec_id", "embedding")
    idx.append(more, "embedding", "vec_id")
    assert(rows(path).size == before.size + 10)
  }
}
