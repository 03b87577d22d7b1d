package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnLsh, HyperplaneLsh, Knn}

/** Vector index stored *partitioned by LSH bucket* — the storage-level
  * ANN layout for 100 TB corpora.
  *
  * The reference's HNSW graph (weaviate.py:26) is a single-node
  * in-memory structure; the Spark-native equivalent of "don't touch
  * most of the data" is Hive-style partition pruning: vectors land in
  * `bucket=<id>/` directories at write time, and a search reads ONLY
  * the probed buckets — visible as `PartitionFilters` in the scan, with
  * unprobed files never opened. With `nbits` hyperplanes the corpus
  * splits into 2^nbits partitions, each a self-contained brute-force
  * problem; multi-probe trades recall vs files read.
  */
class LshVectorIndex private (
    val spark: SparkSession,
    val path: String,
    val lsh: HyperplaneLsh) {

  def df: DataFrame = spark.read.parquet(path)

  /** Exact top-k inside the probed buckets (approximate overall; probes
    * = nbits degrades gracefully to exact full-scan). */
  def search(queryVec: Array[Float], k: Int, probes: Int = 1): DataFrame = {
    val buckets = lsh.probeSet(queryVec, probes)
    Knn.search(df.filter(col("bucket").isin(buckets: _*)),
      "vector", "docid", queryVec, k)
  }

  /** Incremental maintenance: bucketize new rows with the STORED
    * hyperplanes (the pruning contract — planes are never reseeded on
    * append) and append into the matching `bucket=` partitions; same
    * trade as [[IvfVectorIndex.append]]. */
  def append(docs: DataFrame, vecCol: String, idCol: String): LshVectorIndex = {
    AnnLsh.bucketize(docs, vecCol, lsh)
      .withColumnRenamed(vecCol, "vector")
      .withColumnRenamed(idCol, "docid")
      .write.mode("append").partitionBy("bucket").parquet(path)
    // docid-interval note for the shard-merge disjointness guard
    // (r15) — after the data write, same contract as
    // [[IvfVectorIndex.append]]
    val Array(idr) = docs.agg(
      min(col(idCol).cast("long")), max(col(idCol).cast("long"))).collect()
    if (!idr.isNullAt(0))
      graft.operators.IndexMerge.recordRange(
        spark, path, idr.getLong(0), idr.getLong(1))
    this
  }

  def count(): Long = df.count()

  /** Absorb `other` — a shard built with the SAME hyperplanes (dim,
    * nbits, seed fully determine them) — by pure bucket-file moves:
    * identical planes assign identical buckets, so shard A's
    * `bucket=5` and shard B's `bucket=5` are disjoint row sets of the
    * same merged partition ([[IvfVectorIndex.merge]]'s contract — no
    * stats or ledger to tear; a crash mid-merge leaves both
    * directories individually consistent and a re-run completes the
    * move). `other`'s directory is deleted on completion. */
  def merge(other: LshVectorIndex): LshVectorIndex = mergeAll(Seq(other))

  /** Multi-way [[merge]] (r15): one docid-disjointness claims pass
    * over every source's `_ranges` ledger (PARTIAL overlaps between
    * shards throw — the postings lakes' guard, now uniform across
    * all five families; pre-ledger indexes merge unchecked), then
    * per-source bucket-file moves. */
  def mergeAll(others: Seq[LshVectorIndex],
      compact: Boolean = false): LshVectorIndex = {
    if (others.isEmpty) return this
    others.foreach { other =>
      require(lsh == other.lsh,
        s"lsh merge: shards must share hyperplanes — this=$lsh " +
        s"other=${other.lsh} (different planes bucket the same vector " +
        "differently and the merged partitions would lie)")
    }
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.IndexMerge.requireDistinctSources(
      spark, path, others.map(_.path))
    graft.operators.IndexMerge.requireQuiesced(
      spark, path, others.map(_.path))
    // ownership rename BEFORE the claims read (r17 — see
    // [[graft.operators.IndexMerge.takeOwnership]]); no marker
    // protocol here, so allowMissing keeps completed-merge re-runs
    // idempotent
    val owned = graft.operators.IndexMerge.takeOwnership(
      spark, others.map(_.path), allowMissing = true)
    try graft.operators.IndexMerge.claimRangesAll(spark, path, owned)
    catch {
      case e: Throwable => // refused before any move: hand back
        others.foreach(o =>
          graft.operators.IndexMerge.releaseOwnership(spark, o.path))
        throw e
    }
    owned.foreach { o =>
      graft.operators.IndexMerge.movePartitionFiles(
        fs, new org.apache.hadoop.fs.Path(o), dst, "bucket=")
      fs.delete(new org.apache.hadoop.fs.Path(o), true)
    }
    // opt-in post-step (r16) — see Bm25Index.mergeAll's note
    if (compact && shouldCompact()) this.compact() else this
  }

  /** `(fileCount, bytes)` of the `bucket=*` data tree. */
  def storageFootprint(): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    graft.operators.IndexMerge.bucketFootprint(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The auto-compaction trigger ([[graft.operators.ShingleIndex
    * .shouldCompact]]'s measured rule; ideal = one file per occupied
    * LSH bucket — 2^nbits is the CEILING of occupied buckets, so the
    * actual partition-dir count from one listing is the base). */
  def shouldCompact(
      slack: Double = 16.0,
      targetFileBytes: Long = 256L << 20): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nOccupied = fs.listStatus(p)
      .count(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
    val (files, bytes) = storageFootprint()
    graft.operators.IndexMerge.needsCompact(
      files, bytes, math.max(1, nOccupied), slack, targetFileBytes)
  }

  /** Offline maintenance after appends/merges fragment the bucket
    * partitions: rewrite each bucket whole into a sibling directory,
    * carry the sidecars, swap via the two-rename [[Generations.swap]]
    * ([[IvfVectorIndex.compact]]'s contract — maintenance windows
    * only, not safe against concurrent readers; every [[LshVectorIndex
    * .load]] runs the matching crash repair). */
  def compact(maxRecordsPerFile: Long = 5000000L): LshVectorIndex = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact")
    spark.read.parquet(path)
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "docid")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(tmp.toString)
    val cur = new org.apache.hadoop.fs.Path(path)
    // `_lsh_meta.json` last: it is the generation-complete marker
    Seq("_ranges", "_batches", "_quiesced", "_lsh_meta.json")
      .foreach { side =>
      val src = new org.apache.hadoop.fs.Path(cur, side)
      if (fs.exists(src))
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
          new org.apache.hadoop.fs.Path(tmp, side), false,
          spark.sparkContext.hadoopConfiguration)
    }
    Generations.swap(spark, path)
    new LshVectorIndex(spark, path, lsh)
  }
}

object LshVectorIndex {

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_lsh_meta.json")

  /** Build from (docid, vector, …) rows: assign buckets, write
    * partitioned. `maxRecordsPerFile` keeps any hot bucket from
    * producing a single giant file. The LSH parameters (dim, nbits,
    * seed — hyperplanes are fully determined by them) are persisted so
    * `load` cannot silently search with mismatched planes. */
  def build(
      docs: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      lsh: HyperplaneLsh,
      maxRecordsPerFile: Long = 5000000L): LshVectorIndex = {
    val spark = docs.sparkSession
    AnnLsh.bucketize(docs, vecCol, lsh)
      .withColumnRenamed(vecCol, "vector")
      .withColumnRenamed(idCol, "docid")
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(path)
    // fresh build: reset the docid-range ledger (r15) — the
    // [[LshVectorIndex.mergeAll]] shard-disjointness guard's memory
    val Array(idr) = docs.agg(
      org.apache.spark.sql.functions.min(col(idCol).cast("long")),
      org.apache.spark.sql.functions.max(col(idCol).cast("long"))).collect()
    if (!idr.isNullAt(0))
      graft.operators.IndexMerge.resetRange(
        spark, path, idr.getLong(0), idr.getLong(1))
    val fs = metaPath(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath(path), true)
    out.write(
      s"""{"dim":${lsh.dim},"nbits":${lsh.nbits},"seed":${lsh.seed}}"""
        .getBytes("UTF-8"))
    out.close()
    new LshVectorIndex(spark, path, lsh)
  }

  /** Open an index, recovering the persisted LSH parameters. An
    * explicitly passed `lsh` must match them (wrong planes would
    * silently probe the wrong buckets). */
  def load(spark: SparkSession, path: String,
      lsh: Option[HyperplaneLsh] = None): LshVectorIndex = {
    // mid-compact crash repair ([[Generations]]; the meta sidecar is
    // the generation-complete marker)
    Generations.recover(spark, path, "_lsh_meta.json")
    val stored = readMeta(spark, path)
    (stored, lsh) match {
      case (Some(s), Some(l)) =>
        require(s == l,
          s"LSH config mismatch: index built with $s, caller passed $l")
        new LshVectorIndex(spark, path, l)
      case (Some(s), None) => new LshVectorIndex(spark, path, s)
      case (None, Some(l)) => new LshVectorIndex(spark, path, l)
      case (None, None) => throw new IndexNotFoundException(
        s"No LSH metadata at $path and no HyperplaneLsh supplied")
    }
  }

  private def readMeta(spark: SparkSession, path: String): Option[HyperplaneLsh] = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      in.close()
      def num(k: String) =
        s""""$k":(-?\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
      for (d <- num("dim"); n <- num("nbits"); s <- num("seed"))
        yield HyperplaneLsh(d.toInt, n.toInt, s)
    }
  }
}
