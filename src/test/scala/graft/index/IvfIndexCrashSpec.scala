package graft.index

import graft.SparkTestBase
import graft.operators.Ivf

/** Interrupted-maintenance crash safety for the IVF vector index,
  * re-founded on the r17 manifest-snapshot storage ([[Manifests]]):
  * every mutation lands whole in a fresh generation and becomes
  * visible only at the atomic manifest commit, so ALL the pre-r17
  * crash windows (partial sibling, mid-swap, staged-commit
  * roll-forward, visible-subset append) collapse into one state —
  * "orphan generation, index unchanged" — plus the shard-merge
  * marker roll-forward. This spec plants each footprint by hand and
  * shows load() always yields the committed snapshot. */
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
    IvfVectorIndex.load(spark, path).df.select("docid", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def centroidSig(path: String): Seq[Seq[Float]] =
    IvfVectorIndex.load(spark, path).model.centroids
      .map(_.toSeq).toIndexedSeq

  test("maintenance crash DURING a generation write (compact/retrain " +
    "shape): the torn orphan is invisible — index byte-identical, " +
    "re-run works, orphan reaped by later commits") {
    val (path, _) = freshIndex("torn")
    val before = rows(path)
    // footprint: a half-written generation (garbage file, no manifest)
    new java.io.File(s"$path/gen=g-0000000077/cluster=0").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        s"$path/gen=g-0000000077/cluster=0/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(rows(path) == before, "torn generation must be invisible")
    // a re-run of the interrupted maintenance succeeds
    IvfVectorIndex.load(spark, path).compact()
    assert(rows(path) == before)
    // the retention window passes -> the orphan is swept
    (0 until 3).foreach(_ => IvfVectorIndex.load(spark, path).compact())
    assert(!new java.io.File(s"$path/gen=g-0000000077").exists,
      "orphan generation reaped")
  }

  test("a torn manifest TMP file is invisible and the next commit " +
    "overwrites it (the rename is the only visibility point)") {
    val (path, _) = freshIndex("tmp")
    val before = rows(path)
    val cen = centroidSig(path)
    // footprint: the commit died mid-write of the tmp file
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_manifests/.tmp-m-0000000002"),
      "graft-manifest v1\npart gen=g-junk/clu".getBytes("UTF-8"))
    assert(rows(path) == before)
    assert(centroidSig(path) == cen)
    // the next real commit takes the m-0000000002 slot cleanly
    val more = around(2, 10, 900L).toDF("vec_id", "embedding")
    IvfVectorIndex.load(spark, path).append(more, "embedding", "vec_id")
    assert(rows(path).size == before.size + 10)
  }

  test("interrupted APPEND is invisible WHOLE (r17 upgrade: the " +
    "pre-manifest append could land a visible subset of a batch)") {
    val (path, idx) = freshIndex("append")
    val before = rows(path)
    // footprint: the append's generation landed completely (real
    // parquet rows!) but the JVM died before the manifest commit —
    // the pre-r17 layout would show these rows to every reader
    idx.df.filter($"cluster" === 0)
      .withColumn("docid", $"docid" + 5000L)
      .write.partitionBy("cluster").parquet(s"$path/gen=g-0000000042")
    assert(rows(path) == before,
      "an uncommitted batch must be invisible in its entirety")
    assert(IvfVectorIndex.load(spark, path).count() == before.size)
    // a clean re-run of the append lands whole
    val more = around(2, 10, 900L).toDF("vec_id", "embedding")
    idx.append(more, "embedding", "vec_id")
    val after = rows(path)
    assert(after.size == before.size + 10)
    assert(!after.exists(_._1 >= 5000L), "the orphan stays invisible")
  }

  test("retention window: a compact keeps the prior snapshots' files " +
    "on disk until two further commits pass (the concurrent-reader " +
    "guarantee), then reaps them") {
    val (path, idx) = freshIndex("retain")
    val buildGen = new java.io.File(s"$path/gen=g-0000000001")
    assert(buildGen.exists)
    idx.compact() // m2
    assert(buildGen.exists, "retained for pinned readers")
    IvfVectorIndex.load(spark, path).compact() // m3
    assert(buildGen.exists, "still inside the retention window")
    IvfVectorIndex.load(spark, path).compact() // m4 -> m1 expires
    assert(!buildGen.exists, "expired generation reaped")
    assert(rows(path).size == 120)
  }

  test("merge crash AFTER the marker (sources owned, nothing moved): " +
    "load rolls the merge forward — generations absorbed, sources " +
    "drained, marker gone, search equals the monolith") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfcrash-merge").toString
    val ref = (around(0, 40, 0L) ++ around(2, 40, 100L) ++
      around(4, 40, 200L)).toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 3, sampleSize = 200)
    IvfVectorIndex.build(ref.filter($"vec_id" < 120), "embedding",
      "vec_id", s"$base/dst", model)
    IvfVectorIndex.build(ref.filter($"vec_id" >= 120), "embedding",
      "vec_id", s"$base/shard", model)
    // footprint: ownership rename done, marker written, death before
    // any generation move
    val owned = graft.operators.IndexMerge.takeOwnership(
      spark, Seq(s"$base/shard"), allowMissing = false)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.IndexMerge.writeMarker(fs,
      new org.apache.hadoop.fs.Path(s"$base/dst"),
      graft.operators.IndexMerge.joinSrcs(owned), Seq(0L))
    val merged = IvfVectorIndex.load(spark, s"$base/dst")
    assert(merged.count() == 120)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$base/dst/_merge_pending")), "marker gone after roll-forward")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(owned.head)),
      "owned source drained and deleted")
    val whole = IvfVectorIndex.build(ref, "embedding", "vec_id",
      s"$base/whole", model)
    val q = Array.tabulate(8)(i => if (i == 4) 1.0f else 0.0f)
    def top(ix: IvfVectorIndex) = ix.search(q, 10, nprobe = 1)
      .select("docid").collect().map(_.getLong(0)).toSeq
    assert(top(merged) == top(whole))
  }

  test("merge crash MID-MOVE (some generations already absorbed): the " +
    "roll-forward is idempotent — no duplicate rows, no loss") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfcrash-midmove").toString
    val ref = (around(0, 40, 0L) ++ around(2, 40, 100L) ++
      around(4, 40, 200L)).toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 3, sampleSize = 200)
    IvfVectorIndex.build(ref.filter($"vec_id" < 120), "embedding",
      "vec_id", s"$base/dst", model)
    val shard = IvfVectorIndex.build(ref.filter($"vec_id" >= 120),
      "embedding", "vec_id", s"$base/shard", model)
    // give the shard TWO generations so the crash can split them
    shard.compact()
    val owned = graft.operators.IndexMerge.takeOwnership(
      spark, Seq(s"$base/shard"), allowMissing = false)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.IndexMerge.writeMarker(fs,
      new org.apache.hadoop.fs.Path(s"$base/dst"),
      graft.operators.IndexMerge.joinSrcs(owned), Seq(0L))
    // move ONE of the source's generations by hand (what a crash
    // mid-completeMerge leaves), then let load finish the rest
    val srcManifest = Manifests.require(spark, owned.head)
    val firstGen = Manifests.genOf(srcManifest.parts.head)
    val target = Manifests.mergedGenName(owned.head, firstGen)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"${owned.head}/$firstGen"),
      new org.apache.hadoop.fs.Path(s"$base/dst/$target")))
    val merged = IvfVectorIndex.load(spark, s"$base/dst")
    assert(merged.count() == 120, "exactly the monolith's row count")
    val ids = merged.df.select("docid").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "no duplicated docids")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(owned.head)))
  }

  test("retrain that EMPTIES a drifted cluster drops it from the " +
    "snapshot — no duplicate docids (the refined neighbor stole " +
    "every row; the manifest simply lists no partition for it)") {
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
    // the refined c1; c0 attracts nothing — the new manifest must not
    // list a cluster=0 partition (else rows 0,1,2 would read twice)
    val after = patched.retrainInPlace(Seq(0, 1), iters = 3)
    val live = rows(path)
    assert(live.map(_._1) == Set(0L, 1L, 2L, 3L),
      s"duplicated or lost docids: $live")
    assert(live.size == 4, s"stale emptied-cluster partition: $live")
    assert(live.forall(_._2 == 1), s"all rows belong to cluster 1: $live")
    assert(after.count() == 4)
    assert(IvfVectorIndex.load(spark, path).count() == 4)
  }
}
