package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.index.VectorIndex

/** Streaming index ingestion: micro-batches land in the index with the
  * declared delivery semantics (upsert idempotent on uid; append
  * at-least-once), and the text path encodes through the S6 seam. */
class IndexStreamSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def rows(lo: Int, hi: Int) = emb
    .filter(col("vec_id") >= lo && col("vec_id") < hi)
    .select(col("vec_id").cast("string").as("uid"),
      col("embedding").as("vector"))

  test("streamed micro-batches land in the index; searchable afterwards") {
    val srcDir = tmp("graft-is-src")
    rows(0, 60).repartition(3).write.mode("overwrite").parquet(srcDir)
    val idx = VectorIndex.create(spark, tmp("graft-is-idx"))
    idx.index(rows(60, 70)) // pre-existing contents
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = IndexStream.ingest(stream, idx, tmp("graft-is-ck"))
    try q.processAllAvailable() finally q.stop()
    assert(idx.count() == 70)
    // the streamed rows are searchable: self-match top-1 at 1.0
    val qv = emb.filter(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).toArray
    val hit = idx.search(qv, 1).select("uid", "score").head()
    assert(hit.getString(0) == "3" &&
      math.abs(hit.getDouble(1) - 1.0) < 1e-9)
  }

  test("upsert mode is idempotent on uid when a batch replays") {
    val srcDir = tmp("graft-is-up-src")
    rows(0, 20).coalesce(1).write.mode("overwrite").parquet(srcDir)
    val idx = VectorIndex.create(spark, tmp("graft-is-up-idx"))
    idx.index(rows(0, 20)) // same uids already present
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    // fresh checkpoint replays the whole source = a replayed batch
    val q = IndexStream.ingest(stream, idx, tmp("graft-is-up-ck"))
    try q.processAllAvailable() finally q.stop()
    assert(idx.count() == 20, "upsert replay must not duplicate uids")
    // append mode from a NEW stream (fresh checkpoint = new stream id)
    // appends again on purpose: the BatchLedger keys on (stream id,
    // batch id), so a different logical stream never collides with a
    // replay of this one
    val stream2 = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val q2 = IndexStream.ingest(stream2, idx, tmp("graft-is-ap-ck"),
      mode = "append")
    try q2.processAllAvailable() finally q2.stop()
    assert(idx.count() == 40)
  }

  test("append mode survives a REAL checkpoint replay: deleting the " +
    "commit marker replays the batch on restart, and the BatchLedger " +
    "skips it instead of double-appending") {
    val srcDir = tmp("graft-is-rp-src")
    rows(0, 15).coalesce(1).write.mode("overwrite").parquet(srcDir)
    val idxDir = tmp("graft-is-rp-idx")
    val ck = tmp("graft-is-rp-ck")
    val idx = VectorIndex.create(spark, idxDir)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .parquet(srcDir)
      val q = IndexStream.ingest(stream, idx, ck, mode = "append")
      try q.processAllAvailable() finally {
        q.stop(); q.awaitTermination() // fully release the checkpoint
      }
    }
    runOnce()
    assert(idx.count() == 15)
    // simulate the crash-before-checkpoint-commit window: the batch's
    // effects are on disk but Structured Streaming forgets the commit,
    // so a restart REPLAYS batch 0 with the same batch id
    val commits = new java.io.File(s"$ck/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(last.delete())
    val crc = new java.io.File(commits, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    runOnce()
    assert(idx.count() == 15,
      "a replayed committed batch must not double-append")
    // and genuinely new data still flows through the same stream
    rows(15, 25).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(idx.count() == 25)
  }

  test("ingestIvf streams micro-batches into a cluster-partitioned " +
    "index with the stored codebook; rows searchable via pruned scan") {
    val model = graft.operators.Ivf.train(emb, "embedding", 4)
    val idxDir = tmp("graft-is-ivf-idx")
    graft.index.IvfVectorIndex.build(
      emb.filter(col("vec_id") < 100), "embedding", "vec_id", idxDir, model)
    val idx = graft.index.IvfVectorIndex.load(spark, idxDir)
    val srcDir = tmp("graft-is-ivf-src")
    emb.filter(col("vec_id") >= 100)
      .select("vec_id", "embedding")
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = IndexStream.ingestIvf(stream, idx, "embedding", "vec_id",
      tmp("graft-is-ivf-ck"))
    try q.processAllAvailable() finally q.stop()
    assert(idx.count() == emb.count())
    val qv = emb.filter(col("vec_id") === 321)
      .select("embedding").head().getSeq[Float](0).toArray
    val top = idx.search(qv, 1, nprobe = 1).select("docid", "score").head()
    assert(top.getLong(0) == 321L &&
      math.abs(top.getDouble(1) - 1.0) < 1e-9)
  }

  test("ingestIvf compactEvery folds streamed generations in-flight " +
    "(r17): the snapshot's file count lands at one-file-per-occupied-" +
    "cluster instead of growing with the batch count, and contents + " +
    "search are unchanged") {
    val model = graft.operators.Ivf.train(emb, "embedding", 4)
    def streamInto(compactEvery: Int): graft.index.IvfVectorIndex = {
      val idxDir = tmp("graft-is-ce-idx")
      graft.index.IvfVectorIndex.build(
        emb.filter(col("vec_id") < 100), "embedding", "vec_id",
        idxDir, model)
      val idx = graft.index.IvfVectorIndex.load(spark, idxDir)
      val srcDir = tmp("graft-is-ce-src")
      emb.filter(col("vec_id") >= 100)
        .select("vec_id", "embedding")
        .repartition(6).write.mode("overwrite").parquet(srcDir)
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = IndexStream.ingestIvf(stream, idx, "embedding", "vec_id",
        tmp("graft-is-ce-ck"), compactEvery = compactEvery)
      try q.processAllAvailable() finally q.stop()
      idx
    }
    val loose = streamInto(compactEvery = 0)
    val tight = streamInto(compactEvery = 2) // 6 batches → folds at 2,4,6
    val (looseFiles, _) = loose.storageFootprint()
    val (tightFiles, _) = tight.storageFootprint()
    // uncompacted: every delivered batch adds ≥1 file per touched
    // cluster; the cadence folds the tree back to the compact ideal
    assert(tightFiles <= model.centroids.length,
      s"expected one file per occupied cluster, got $tightFiles")
    assert(looseFiles > tightFiles,
      s"control should be fragmented ($looseFiles vs $tightFiles)")
    // contents and search identical either way
    assert(tight.count() == emb.count() && loose.count() == emb.count())
    val qv = emb.filter(col("vec_id") === 321)
      .select("embedding").head().getSeq[Float](0).toArray
    for (idx <- Seq(loose, tight)) {
      val top = idx.search(qv, 1, nprobe = 1)
        .select("docid", "score").head()
      assert(top.getLong(0) == 321L &&
        math.abs(top.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("ingestLsh streams micro-batches into a bucket-partitioned " +
    "index with the STORED hyperplanes (r17): rows searchable via " +
    "pruned probes, a replayed batch is skipped, and compactEvery " +
    "folds the generations") {
    val lsh = graft.operators.HyperplaneLsh(dim = 64, nbits = 3, seed = 7L)
    val idxDir = tmp("graft-is-lsh-idx")
    graft.index.LshVectorIndex.build(
      emb.filter(col("vec_id") < 100).select("vec_id", "embedding"),
      "embedding", "vec_id", idxDir, lsh)
    val idx = graft.index.LshVectorIndex.load(spark, idxDir)
    val srcDir = tmp("graft-is-lsh-src")
    emb.filter(col("vec_id") >= 100)
      .select("vec_id", "embedding")
      .repartition(6).write.mode("overwrite").parquet(srcDir)
    val ck = tmp("graft-is-lsh-ck")
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = IndexStream.ingestLsh(stream, idx, "embedding", "vec_id",
        ck, compactEvery = 2)
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    }
    runOnce()
    assert(idx.count() == emb.count())
    // 6 batches at compactEvery=2 → the last fold lands the tree at
    // one file per OCCUPIED bucket (2^3 = 8 possible)
    val (files, _) = idx.storageFootprint()
    assert(files <= 8, s"expected ≤ one file per bucket, got $files")
    // stored-planes contract: a streamed row self-matches at 1.0
    // through the pruned probe scan
    val qv = emb.filter(col("vec_id") === 321)
      .select("embedding").head().getSeq[Float](0).toArray
    val top = idx.search(qv, 1, probes = 2).select("docid", "score").head()
    assert(top.getLong(0) == 321L &&
      math.abs(top.getDouble(1) - 1.0) < 1e-9)
    // force a GENUINE replay: deleting the newest commit marker makes
    // the restart re-deliver the last batch with the SAME batch id —
    // the BatchLedger must skip it
    val commits = new java.io.File(s"$ck/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(last.delete())
    val crc = new java.io.File(commits, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    runOnce()
    assert(idx.count() == emb.count(),
      "a replayed committed batch must not double-append")
  }

  test("ingestText encodes through the S6 seam; stream result matches " +
    "the batch indexTextWorkflow vectors") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 30)
      .select(col("doc_id").cast("string").as("uid"), col("text"))
    val srcDir = tmp("graft-is-txt-src")
    docs.coalesce(1).write.mode("overwrite").parquet(srcDir)
    // no pre-existing contents: the first micro-batch bootstraps the index
    val idx = VectorIndex.create(spark, tmp("graft-is-txt-idx"))
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val q = IndexStream.ingestText(stream, "text", idx, tmp("graft-is-txt-ck"))
    try q.processAllAvailable() finally q.stop()
    assert(idx.count() == 30)
    // vectors are bit-identical to the batch-side HashingEncoder
    val batchVecs = graft.TextEncoder
      .encodeColumn(docs, "text", "vector", graft.HashingEncoder(64))
      .select("uid", "vector").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val streamed = idx.df.select("uid", "vector").collect()
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      assert(r.getSeq[Float](1) == batchVecs(r.getString(0)))
    }
  }

  test("ingestMedia runs the REAL decoders in the stream; vectors " +
    "match the batch feature head and the result is searchable") {
    graft.Graft.init(spark)
    // mixed real formats: PNG + JPEG blobs (the pixel-decode head)
    val blobs = spark.range(0, 30).selectExpr("CAST(id AS STRING) AS uid",
      "mixed_pixel_media_for_id(id) AS media")
    val srcDir = tmp("graft-is-med-src")
    blobs.coalesce(2).write.mode("overwrite").parquet(srcDir)
    val idx = VectorIndex.create(spark, tmp("graft-is-med-idx"))
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = IndexStream.ingestMedia(stream, "media", idx,
      tmp("graft-is-med-ck"))
    try q.processAllAvailable() finally q.stop()
    assert(idx.count() == 30)
    // the media column never reaches the sink
    assert(!idx.df.columns.contains("media"))
    // vectors == the batch extractFeatures head, bit-identical
    val batchVecs = graft.operators.Multimodal
      .extractFeatures(blobs, "media", 64)
      .select("uid", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    idx.df.select("uid", "vector").collect().foreach { r =>
      assert(r.getSeq[Float](1) == batchVecs(r.getString(0)))
    }
    // and a decoded-content query self-matches at 1.0
    val qv = batchVecs("7").toArray
    val hit = idx.search(qv, 1).select("uid", "score").head()
    assert(hit.getString(0) == "7" &&
      math.abs(hit.getDouble(1) - 1.0) < 1e-9)
  }
}
