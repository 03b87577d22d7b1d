package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Ivf
import graft.index.IvfVectorIndex

/** IVF streaming WITH in-stream drift-triggered retrain (r15, the r14
  * verdict's ask): `ingestIvf` and `retrainInPlace` were each pinned
  * alone — this drives a retrain in the middle of a live append
  * stream. The design answer to the "generation swap vs in-flight
  * append" race is serialization by construction: the retrain runs
  * INSIDE foreachBatch (like the keyword lake's in-stream compaction),
  * so it can never interleave with an append of the same stream, and
  * later batches assign with the patched codebook the retrain
  * returned. The spec plants real drift and checks the whole pass:
  * retrain actually fired mid-stream, zero rows lost, no docid
  * duplicated, the old rows stay readable, and the patched codebook
  * both persisted and routed the post-retrain appends. */
class IvfStreamRetrainSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-ivfstream-$tag").toString

  private def vec(deg: Double): Seq[Float] = Seq(
    math.cos(math.toRadians(deg)).toFloat,
    math.sin(math.toRadians(deg)).toFloat)

  test("drift-triggered retrain fires BETWEEN appends of a live " +
    "stream: zero rows lost, codebook patched, post-retrain batches " +
    "assign with the patched book") {
    // hand codebook: two tight clusters at 0° and 90°
    val model = Ivf.Model(Array(vec(0).toArray, vec(90).toArray))
    val idxDir = tmp("idx")
    // seed lake: 200 rows ON the centroids (±2°) — a high, tight
    // reference band for the drift detector
    val seed = (0L until 200L).map { i =>
      val base = if (i % 2 == 0) 0.0 else 90.0
      (i, vec(base + (if (i % 4 < 2) 2.0 else -2.0)))
    }.toDF("vec_id", "embedding")
    IvfVectorIndex.build(seed, "embedding", "vec_id", idxDir, model)
    val idx = IvfVectorIndex.load(spark, idxDir)
    val cenBefore = IvfVectorIndex.load(spark, idxDir)
      .model.centroids.map(_.toSeq).toSeq

    // four micro-batches: 0-1 on-distribution, 2-3 DRIFTED to 40°
    // (cos 40° ≈ 0.766 to the nearest centroid — far below the seed
    // band's mean − 2σ, so batch 2's drift check must flag cluster 0)
    val srcDir = new java.io.File(tmp("src"))
    val t0 = System.currentTimeMillis() - 3600000L
    val batches = Seq(
      (1000L until 1010L).map(i => (i, vec(if (i % 2 == 0) 1.0 else 91.0))),
      (1010L until 1020L).map(i => (i, vec(if (i % 2 == 0) 359.0 else 89.0))),
      (1020L until 1030L).map(i => (i, vec(40.0))),
      (1030L until 1040L).map(i => (i, vec(41.0))))
    batches.zipWithIndex.foreach { case (rows, k) =>
      val stage = tmp(s"stage$k")
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$k.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + k * 60000L))
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir.getAbsolutePath).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    val q = IndexStream.ingestIvf(stream, idx, "embedding", "vec_id",
      tmp("ck"), retrainEvery = 1, driftFrac = 0.5)
    try q.processAllAvailable() finally q.stop()

    val loaded = IvfVectorIndex.load(spark, idxDir)
    // zero lost, zero duplicated — through a retrain that rewrote the
    // drifted partitions mid-stream
    val ids = loaded.df.select("docid").as[Long].collect()
    assert(ids.length == 240, s"rows lost or doubled: ${ids.length}")
    assert(ids.distinct.length == 240, "duplicated docids")
    assert(!new java.io.File(s"$idxDir/_retrain").exists &&
      !new java.io.File(s"$idxDir/_merge_pending").exists,
      "no maintenance residue (r17: the manifest commit is atomic)")
    // the codebook was actually patched mid-stream (cluster 0 walked
    // toward the 40° mass)
    val cenAfter = IvfVectorIndex.load(spark, idxDir)
      .model.centroids.map(_.toSeq).toSeq
    assert(cenAfter != cenBefore, "retrain must have fired")
    // old generation still readable and searchable: a seed row
    // self-matches at score 1
    val qv = seed.filter($"vec_id" === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val top = loaded.search(qv, 1, nprobe = 2).select("docid", "score").head()
    assert(top.getLong(0) == 0L && math.abs(top.getDouble(1) - 1.0) < 1e-6)
    // post-retrain appends rode the PATCHED book: the drifted rows are
    // findable by probing the cluster nearest to them under the new
    // codebook
    val drifted = loaded.search(vec(40.5).toArray, 5,
      nprobe = 1).select("docid").as[Long].collect().toSet
    assert(drifted.exists(id => id >= 1020L && id < 1040L),
      s"drifted rows must be probe-reachable: $drifted")
  }

  test("the mass-share gate holds: a batch with a LONE drifted stray " +
    "(below minShare) does NOT trigger a retrain — the codebook " +
    "stays put (r15, RetrainRecallProbe's finding encoded)") {
    // THREE centroids; the stray will be the ONLY row landing in
    // cluster 2, so its per-cluster drift_frac is a full 1.0 — the
    // frac-only rule (pre-r15) would have retrained cluster 2 on one
    // stray; the share gate must block it
    val model = Ivf.Model(
      Array(vec(0).toArray, vec(90).toArray, vec(180).toArray))
    val idxDir = tmp("strays-idx")
    val seed = (0L until 100L).map { i =>
      (i, vec(if (i % 2 == 0) 2.0 else 88.0))
    }.toDF("vec_id", "embedding")
    IvfVectorIndex.build(seed, "embedding", "vec_id", idxDir, model)
    val idx = IvfVectorIndex.load(spark, idxDir)
    val cenBefore = IvfVectorIndex.load(spark, idxDir)
      .model.centroids.map(_.toSeq).toSeq
    // one batch: 29 on-distribution rows + ONE stray at 150° (nearest
    // c2, drift_frac 1.0 there) carrying 1/30 of the batch — under
    // the 5% default share
    val rows = (2000L until 2029L).map(i =>
      (i, vec(if (i % 2 == 0) 1.0 else 89.0))) :+ ((2029L, vec(150.0)))
    val srcDir = new java.io.File(tmp("strays-src"))
    val stage = tmp("strays-stage")
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(srcDir, "b0.parquet").toPath)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir.getAbsolutePath).schema)
      .parquet(srcDir.getAbsolutePath)
    val q = IndexStream.ingestIvf(stream, idx, "embedding", "vec_id",
      tmp("strays-ck"), retrainEvery = 1, driftFrac = 0.5)
    try q.processAllAvailable() finally q.stop()
    val cenAfter = IvfVectorIndex.load(spark, idxDir)
      .model.centroids.map(_.toSeq).toSeq
    assert(cenAfter == cenBefore,
      "a lone stray must not walk the codebook")
    assert(IvfVectorIndex.load(spark, idxDir).count() == 130,
      "the batch itself still lands")
  }

  test("NOVEL mass GROWS the codebook in-stream instead of moving " +
    "it (r16): the report's collapsed incoming mean routes the " +
    "response to growClusters — old centroids bit-frozen, new cell " +
    "live, novel rows probe-reachable at nprobe=1") {
    val model = Ivf.Model(Array(vec(0).toArray, vec(90).toArray))
    val idxDir = tmp("grow-idx")
    val seed = (0L until 200L).map { i =>
      val base = if (i % 2 == 0) 0.0 else 90.0
      (i, vec(base + (if (i % 4 < 2) 2.0 else -2.0)))
    }.toDF("vec_id", "embedding")
    IvfVectorIndex.build(seed, "embedding", "vec_id", idxDir, model)
    val idx = IvfVectorIndex.load(spark, idxDir)
    // two micro-batches: 0 on-distribution, 1 a NOVEL mode at ~200° —
    // best stored cosine ≈ cos(110°) ≈ −0.34, so the incoming mean
    // collapses vs the reference mean (~1.0): the policy must GROW
    // (a relocate would drag a centroid 110° off its own mass)
    val srcDir = new java.io.File(tmp("grow-src"))
    val t0 = System.currentTimeMillis() - 3600000L
    val batches = Seq(
      (3000L until 3020L).map(i => (i, vec(if (i % 2 == 0) 1.0 else 89.0))),
      (3020L until 3040L).map(i => (i, vec(200.0 + (i % 3).toDouble))))
    batches.zipWithIndex.foreach { case (rows, k) =>
      val stage = tmp(s"grow-stage$k")
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$k.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + k * 60000L))
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir.getAbsolutePath).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    val q = IndexStream.ingestIvf(stream, idx, "embedding", "vec_id",
      tmp("grow-ck"), retrainEvery = 1, driftFrac = 0.5)
    try q.processAllAvailable() finally q.stop()
    val loaded = IvfVectorIndex.load(spark, idxDir)
    assert(loaded.model.centroids.length == 3,
      s"novel mass must ADD a cell, got k=${loaded.model.centroids.length}")
    // the old centroids did not move — grow, not relocate
    (0 until 2).foreach { c =>
      assert(java.util.Arrays.equals(
        loaded.model.centroids(c), model.centroids(c)),
        s"old centroid $c moved — the policy relocated instead of growing")
    }
    import spark.implicits._
    val ids = loaded.df.select("docid").as[Long].collect()
    assert(ids.length == 240 && ids.distinct.length == 240,
      s"rows lost or doubled: ${ids.length}")
    // the novel rows live whole in the new cell and are reachable at
    // nprobe=1
    val inNew = loaded.df.filter(
        org.apache.spark.sql.functions.col("cluster") === 2)
      .select("docid").as[Long].collect().toSet
    assert(inNew == (3020L until 3040L).toSet,
      s"new cell must hold exactly the novel mode: $inNew")
    val top = loaded.search(vec(201.0).toArray, 5, nprobe = 1)
      .select("docid").as[Long].collect()
    assert(top.nonEmpty && top.forall(id => id >= 3020L && id < 3040L),
      s"novel probe: ${top.toSeq}")
  }

  test("maxCells bounds sustained growth (r17): a grow that would " +
    "cross the cap becomes a REBUILD — k resets to the seed budget, " +
    "the replay ledger survives, every mode stays probe-reachable") {
    // seed budget k=2; maxCells=3 so the FIRST novel epoch grows to 3
    // and the SECOND (k would hit 4) must rebuild back to k=2 re-fit
    // over everything
    val model = Ivf.Model(Array(vec(0).toArray, vec(90).toArray))
    val idxDir = tmp("cap-idx")
    val seed = (0L until 200L).map { i =>
      val base = if (i % 2 == 0) 0.0 else 90.0
      (i, vec(base + (if (i % 4 < 2) 2.0 else -2.0)))
    }.toDF("vec_id", "embedding")
    IvfVectorIndex.build(seed, "embedding", "vec_id", idxDir, model)
    val idx = IvfVectorIndex.load(spark, idxDir)
    // two novel epochs at ~200° and ~280° (collapsed incoming mean vs
    // reference → the grow response both times)
    val srcDir = new java.io.File(tmp("cap-src"))
    val t0 = System.currentTimeMillis() - 3600000L
    val batches = Seq(
      (4000L until 4020L).map(i => (i, vec(200.0 + (i % 3).toDouble))),
      (4020L until 4040L).map(i => (i, vec(280.0 + (i % 3).toDouble))))
    batches.zipWithIndex.foreach { case (rows, k) =>
      val stage = tmp(s"cap-stage$k")
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$k.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + k * 60000L))
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir.getAbsolutePath).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    val q = IndexStream.ingestIvf(stream, idx, "embedding", "vec_id",
      tmp("cap-ck"), retrainEvery = 1, driftFrac = 0.5, maxCells = 3)
    try q.processAllAvailable() finally q.stop()
    val loaded = IvfVectorIndex.load(spark, idxDir)
    assert(loaded.model.centroids.length == 2,
      s"the over-cap grow must REBUILD at the seed budget, got " +
      s"k=${loaded.model.centroids.length}")
    import spark.implicits._
    val ids = loaded.df.select("docid").as[Long].collect()
    assert(ids.length == 240 && ids.distinct.length == 240,
      s"rows lost or doubled through the rebuild: ${ids.length}")
    // the rebuild preserved the operational sidecars (unlike a
    // from-scratch build, which wipes the path): the delivery ledger
    // keeps replay protection, the range claims keep the merge guard
    assert(new java.io.File(s"$idxDir/_batches").exists,
      "the delivery ledger must survive the rebuild")
    assert(new java.io.File(s"$idxDir/_ranges").exists,
      "the docid-range claims must survive the rebuild")
    // every mode (seed 0°/90°, novel 200°, novel 280°) is reachable
    // under the re-fit book
    val reFit = IvfVectorIndex.load(spark, idxDir)
    Seq(1.0, 89.0, 201.0, 281.0).foreach { deg =>
      val got = reFit.search(vec(deg).toArray, 3, nprobe = 2)
        .select("docid").as[Long].collect()
      assert(got.nonEmpty, s"mode at $deg° unreachable after rebuild")
    }
  }

  test("dead cells cost nothing at query time (r17): a cell with no " +
    "stored rows never receives a probe slot — the ranking skips to " +
    "the nearest OCCUPIED cell") {
    // k=3 book, but NO data near the 180° centroid: its partition
    // never exists. A query AT 180° under nprobe=1 used to probe the
    // dead cell and return nothing useful; it must now rank only the
    // occupied cells
    val model = Ivf.Model(
      Array(vec(0).toArray, vec(90).toArray, vec(180).toArray))
    val idxDir = tmp("dead-idx")
    val docs = (0L until 100L).map { i =>
      (i, vec(if (i % 2 == 0) 2.0 else 88.0))
    }.toDF("vec_id", "embedding")
    val idx = IvfVectorIndex.build(docs, "embedding", "vec_id",
      idxDir, model)
    val got = idx.search(vec(150.0).toArray, 5, nprobe = 1)
      .select("docid").collect().map(_.getLong(0))
    assert(got.length == 5,
      s"a probe slot must never land on an empty cell: ${got.toSeq}")
  }
}
