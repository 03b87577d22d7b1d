package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted winnowing-fingerprint index — [[ShingleIndex]]'s storage
  * pattern applied to the MOSS near-copy matcher ([[Winnow]]):
  * `winnow_pairs` proves the matching semantics, but as a pure
  * function it re-fingerprints BOTH corpora on every call — at 100 TB
  * the lake side must be a stored artifact, probed per crawl and
  * appended per accepted batch, exactly like the shingle lake.
  *
  *  - postings `(hash, old_id)` — DISTINCT per document — live in
  *    parquet partitioned by `bucket = pmod(hash(hash), nBuckets)`
  *    and hash-sorted within files: a probe opens only its
  *    fingerprints' buckets and row-group-skips inside them;
  *  - `_stats` pins the fingerprint parameters (k, w, dfCap,
  *    buckets) so a probe can never run with mismatched winnowing;
  *  - `_ranges` records every build/append's docid interval with the
  *    same claim-before-write ordering and overlap guard as
  *    [[ShingleIndex.appendBatch]].
  *
  * The stop-fingerprint cap (document frequency > `dfCap`, the bound
  * that keeps a boilerplate fingerprint from fanning the join out)
  * is evaluated AT PROBE TIME over the lake's own postings: the
  * bucket-pruned read delivers every lake posting of each candidate
  * hash, so the df computed there is the exact lake-wide df — no
  * separate sidecar to keep consistent across appends, and a hash
  * that crosses the cap through growth starts being dropped
  * automatically on the next probe. */
class WinnowIndex private (
    val spark: SparkSession,
    val path: String,
    val nDocs: Long,
    val k: Int,
    val w: Int,
    val dfCap: Int,
    val nBuckets: Int) {

  /** The CURRENT committed snapshot's fingerprints (r17 —
    * manifest-pinned like [[Bm25Index.postings]]: maintenance is safe
    * against concurrent readers). */
  def postings: DataFrame = {
    val m = graft.index.Manifests.require(spark, path)
    graft.index.Manifests.dataFrame(spark, path, m)
  }

  /** DISTINCT (id, hash) winnow fingerprints of `docs` under THIS
    * index's parameters (the `winnow` codegen expression rides the
    * scan; distinct is per document — one shuffle on (id, hash)). */
  private def fps(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.Graft.init(spark)
    docs
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .filter(col("__text").isNotNull)
      .selectExpr("id", s"explode(winnow(__text, $k, $w)) AS f")
      .select(col("id"), col("f.hash").as("hash"))
      .distinct()
  }

  /** Cross-corpus near-copy pairs of an incoming batch against the
    * INDEXED lake: (new_id, old_id, n_shared ≥ minShared), with the
    * lake side read from the stored postings (bucket-pruned, never
    * re-fingerprinted, never shuffled — the batch broadcasts into a
    * map-side hash probe riding the postings scan when it fits,
    * [[ShingleIndex.MaxBroadcastKeys]] budget). Lake fingerprints
    * above `dfCap` document frequency are dropped (df measured over
    * the full lake via the pruned read — see class doc). */
  def probe(
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Int = 2): DataFrame = {
    val inc = fps(incoming, idCol, textCol)
      .select(col("hash"), col("id").as("new_id"))
      .localCheckpoint()
    val bStats = inc
      .groupBy(pmod(hash(col("hash")), lit(nBuckets)).as("b"))
      .agg(count(lit(1)).as("n")).collect()
    val bSet = bStats.map(_.getInt(0))
    val nKeys = bStats.map(_.getLong(1)).sum
    val base0 = postings
    val base = if (bSet.length < nBuckets)
      base0.filter(col("bucket").isin(bSet.map(Integer.valueOf).toSeq: _*))
    else base0
    // lake-side df cap, evaluated candidates-first (r11): df only
    // matters for hashes the BATCH carries, so the pruned postings
    // scan semi-joins the batch's hash set before anything shuffles —
    // the df aggregate then moves candidate postings, not the lake
    // (the r11 1M-lake probe measured the lake-wide groupBy as the
    // dominant probe cost at 100k-batch shape). Semantics unchanged:
    // df(h) over `matched` equals df(h) over `base` for every hash the
    // batch carries, because `matched` keeps ALL lake occurrences of
    // those hashes; non-carried hashes never reached the pair join.
    val incHashes = inc.select("hash").distinct()
    val incHashesJ = if (nKeys <= ShingleIndex.MaxBroadcastKeys)
      broadcast(incHashes) else incHashes
    // candidate postings materialized ONCE (localCheckpoint): both the
    // df aggregate and the join-back read the same blocks instead of
    // re-running the pruned postings scan + semi-join (measured 2x the
    // probe cost when recomputed). df per candidate hash then goes
    // through a partial-aggregated groupBy — only (hash, count) pairs
    // shuffle — and the surviving hash set joins back. A
    // Window.partitionBy(hash) here would funnel EVERY lake occurrence
    // of a hot hash (df >> dfCap) into one task before filtering it
    // out, reintroducing exactly the skew the cap exists to avoid; the
    // materialized candidates stay partition-parallel. The survivors
    // are <= the batch's distinct hashes, so the join-back broadcasts
    // under the same budget as the semi-join.
    val matched = base.join(incHashesJ, Seq("hash"))
      .select("hash", "old_id")
      .localCheckpoint()
    val dfOk0 = matched.groupBy("hash")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap)
      .select("hash")
    val dfOkJ = if (nKeys <= ShingleIndex.MaxBroadcastKeys)
      broadcast(dfOk0) else dfOk0
    val kept = matched.join(dfOkJ, Seq("hash"))
      .select("hash", "old_id")
    val incJ = if (nKeys <= ShingleIndex.MaxBroadcastKeys)
      broadcast(inc) else inc
    incJ
      .join(kept, Seq("hash"))
      .groupBy("new_id", "old_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("new_id", "old_id", "n_shared")
  }

  /** Append a batch's fingerprints into their bucket partitions —
    * claim-the-range-first ordering and the overlap guard, exactly
    * [[ShingleIndex.appendBatch]]'s contract. */
  def appendBatch(docs: DataFrame, idCol: String, textCol: String,
      force: Boolean = false): WinnowIndex = {
    val Array(st) = docs
      .agg(count(col(idCol)).as("n"),
        min(col(idCol).cast("long")).as("lo"),
        max(col(idCol).cast("long")).as("hi"))
      .collect()
    val nNew = st.getLong(0)
    if (nNew == 0L) return this
    require(!st.isNullAt(1),
      s"winnow append: every value of id column '$idCol' casts to null")
    val (lo, hi) = (st.getLong(1), st.getLong(2))
    if (!force) Bm25Index.readRanges(spark, path)
      .find { case (l, h) => lo <= h && l <= hi }
      .foreach { case (l, h) => throw new IllegalArgumentException(
        s"winnow append: id range [$lo,$hi] intersects already-indexed " +
        s"[$l,$h] — re-appending an indexed doc doubles its postings; " +
        "use force=true only if the overlap is intentional")
      }
    Bm25Index.appendRange(spark, path, lo, hi)
    val m = graft.index.Manifests.require(spark, path)
    val gen = graft.index.Manifests.genDirName(m.n + 1)
    fps(docs, idCol, textCol)
      .select(col("hash"), col("id").as("old_id"))
      .withColumn("bucket", pmod(hash(col("hash")), lit(nBuckets)))
      .repartition(col("bucket")) // r14: see ShingleIndex.appendBatch
      .sortWithinPartitions("bucket", "hash")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, m.book,
      m.parts ++ graft.index.Manifests.listParts(spark, path, gen))
    WinnowIndex.writeStats(spark, path, nDocs + nNew, k, w, dfCap, nBuckets)
    new WinnowIndex(spark, path, nDocs + nNew, k, w, dfCap, nBuckets)
  }

  /** Offline maintenance after repeated [[appendBatch]]es: rewrite
    * the whole lake hash-sorted into ONE fresh generation and commit
    * — [[ShingleIndex.compact]]'s r17 contract (safe against
    * concurrent readers; sidecars never move). */
  def compact(maxRecordsPerFile: Long = 5000000L): WinnowIndex = {
    // settle any interrupted merge first (ShingleIndex.compact's note)
    WinnowIndex.completeMerge(spark, path)
    val m = graft.index.Manifests.require(spark, path)
    val gen = graft.index.Manifests.genDirName(m.n + 1)
    // bucket-repartitioned first — see ShingleIndex.compact (r13)
    graft.index.Manifests.dataFrame(spark, path, m)
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "hash")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, m.book,
      graft.index.Manifests.listParts(spark, path, gen))
    new WinnowIndex(spark, path, nDocs, k, w, dfCap, nBuckets)
  }

  /** Absorb `other` — a shard with IDENTICAL winnowing parameters over
    * a DISJOINT docid range — by whole-generation directory moves
    * (r17): [[ShingleIndex.merge]]'s protocol over the fingerprint
    * lake (same marker roll-forward, same range claims; the
    * probe-time df cap stays exact because lake-wide df is computed
    * from the merged postings at probe time, never stored). */
  def merge(other: WinnowIndex): WinnowIndex = mergeAll(Seq(other))

  /** Multi-way [[merge]] (r15) — [[Bm25Index.mergeAll]]'s one-claims-
    * pass / one-marker / one-stats-write shape over the fingerprint
    * lake; the pairwise chain's per-call metadata jobs dominate a
    * many-shard merge (BASELINE r15). */
  def mergeAll(others: Seq[WinnowIndex],
      compact: Boolean = false): WinnowIndex = {
    if (others.isEmpty) return this
    others.foreach { other =>
      require(other.k == k && other.w == w && other.dfCap == dfCap &&
        other.nBuckets == nBuckets,
        s"winnow merge: parameter mismatch — this=($k,$w,$dfCap,$nBuckets) " +
        s"other=(${other.k},${other.w},${other.dfCap},${other.nBuckets})")
    }
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcs = others.map(_.path)
    graft.operators.IndexMerge.requireDistinctSources(spark, path, srcs)
    IndexMerge.requireQuiesced(spark, path, srcs)
    // settling an older interrupted merge rewrites `_stats` — re-read
    // rather than trust the handle's nDocs past it (ADVICE r15)
    val ownedSet = srcs.map(IndexMerge.ownedPath).toSet
    var curN = nDocs
    IndexMerge.readMarker(fs, dst).foreach { case (src, _) =>
      if (IndexMerge.splitSrcs(src).toSet != ownedSet) {
        WinnowIndex.completeMerge(spark, path)
        curN = spark.read.parquet(s"$path/_stats").head().getLong(0)
      }
    }
    // ownership rename BEFORE the claims read (r17 — see
    // [[IndexMerge.takeOwnership]]); markers record the owned names
    val resume = IndexMerge.readMarker(fs, dst)
      .exists(m => IndexMerge.splitSrcs(m._1).toSet == ownedSet)
    val owned = IndexMerge.takeOwnership(spark, srcs,
      allowMissing = resume)
    val postN = IndexMerge.readMarker(fs, dst) match {
      case Some((_, stats)) => stats.head
      case None =>
        try {
          IndexMerge.claimRangesAll(spark, path, owned)
          val n = curN + others.map(_.nDocs).sum
          IndexMerge.writeMarker(fs, dst, IndexMerge.joinSrcs(owned),
            Seq(n, k.toLong, w.toLong, dfCap.toLong, nBuckets.toLong))
          n
        } catch {
          case e: Throwable => // refused before any move: hand back
            srcs.foreach(s => IndexMerge.releaseOwnership(spark, s))
            throw e
        }
    }
    // runs THIS merge to the end (r17 — whole-generation moves + ONE
    // manifest commit; pinned destination readers undisturbed)
    WinnowIndex.completeMerge(spark, path)
    val merged = new WinnowIndex(spark, path, postN, k, w, dfCap, nBuckets)
    // opt-in post-step (r16) — see Bm25Index.mergeAll's note
    if (compact && merged.shouldCompact()) merged.compact() else merged
  }

  /** `(fileCount, bytes)` of the current snapshot's fingerprint tree
    * ([[ShingleIndex.storageFootprint]]). */
  def storageFootprint(): (Long, Long) = {
    val m = graft.index.Manifests.require(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats = m.parts.flatMap { p =>
      val d = new org.apache.hadoop.fs.Path(s"$path/$p")
      if (fs.exists(d)) fs.listStatus(d).filter(_.isFile).toSeq
      else Seq.empty
    }
    (stats.length.toLong, stats.map(_.getLen).sum)
  }

  /** The auto-compaction trigger ([[ShingleIndex.shouldCompact]]'s
    * measured rule over the fingerprint lake). */
  def shouldCompact(
      slack: Double = 16.0,
      targetFileBytes: Long = 256L << 20): Boolean = {
    val (files, bytes) = storageFootprint()
    IndexMerge.needsCompact(files, bytes, nBuckets, slack, targetFileBytes)
  }
}

object WinnowIndex {

  private def writeStats(spark: SparkSession, path: String, nDocs: Long,
      k: Int, w: Int, dfCap: Int, nBuckets: Int): Unit = {
    import spark.implicits._
    Seq((nDocs, k, w, dfCap, nBuckets))
      .toDF("n_docs", "k", "w", "df_cap", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
  }

  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      k: Int = 4,
      w: Int = 5,
      dfCap: Int = 20,
      nBuckets: Int = ShingleIndex.AutoBuckets): WinnowIndex = {
    val spark = docs.sparkSession
    val Array(st) = docs
      .agg(count(lit(1)).as("n"),
        coalesce(sum(size(split(col(textCol), " "))), lit(0L))
          .cast("long").as("toks"),
        min(col(idCol).cast("long")).as("lo"),
        max(col(idCol).cast("long")).as("hi"))
      .collect()
    require(st.getLong(0) > 0,
      s"winnow index: empty corpus, refusing to build $path")
    require(!st.isNullAt(2),
      s"winnow index: every value of id column '$idCol' casts to null")
    // winnowing keeps ~1/((w+1)/2) of the grams; size buckets on the
    // selected-fingerprint volume, same cube-root rule as term postings
    val nb = if (nBuckets == ShingleIndex.AutoBuckets)
      Bm25Index.autoBuckets(math.max(1L, 2L * st.getLong(1) / (w + 1)))
    else nBuckets
    // a rebuild over an existing path replaces the index whole (r17:
    // explicit reset so the manifest store restarts at generation 1)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    val gen = graft.index.Manifests.genDirName(1L)
    val idx = new WinnowIndex(spark, path, 0L, k, w, dfCap, nb)
    idx.fps(docs, idCol, textCol)
      .select(col("hash"), col("id").as("old_id"))
      .withColumn("bucket", pmod(hash(col("hash")), lit(nb)))
      .repartition(col("bucket")) // r14: see Bm25Index.build's note
      .sortWithinPartitions("bucket", "hash")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, None,
      graft.index.Manifests.listParts(spark, path, gen))
    writeStats(spark, path, st.getLong(0), k, w, dfCap, nb)
    Bm25Index.appendRange(spark, path, st.getLong(2), st.getLong(3))
    new WinnowIndex(spark, path, st.getLong(0), k, w, dfCap, nb)
  }

  /** Roll an interrupted [[WinnowIndex.merge]] forward — called by
    * every [[load]] ([[ShingleIndex.completeMerge]]'s idempotent
    * steps with the winnow stats row). */
  private[operators] def completeMerge(
      spark: SparkSession, path: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexMerge.readMarker(fs, dst).foreach { case (src, stats) =>
      val srcs = IndexMerge.splitSrcs(src)
      val m = graft.index.Manifests.require(spark, path)
      val moved = srcs.flatMap { s =>
        if (graft.index.Manifests.current(spark, s).isDefined)
          graft.index.Manifests.moveGenerations(spark, s, path)
        else Vector.empty
      }
      if (moved.nonEmpty)
        graft.index.Manifests.commit(spark, path, m.book, m.parts ++ moved)
      srcs.foreach(sp =>
        fs.delete(new org.apache.hadoop.fs.Path(sp), true))
      writeStats(spark, path, stats(0), stats(1).toInt, stats(2).toInt,
        stats(3).toInt, stats(4).toInt)
      IndexMerge.deleteMarker(fs, dst)
    }
  }

  def load(spark: SparkSession, path: String): WinnowIndex = {
    completeMerge(spark, path) // mid-merge crash roll-forward
    val dir = new org.apache.hadoop.fs.Path(s"$path/_stats")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir))
      throw new graft.index.IndexNotFoundException(
        s"no winnow index at $path")
    // one-row sidecar: driver-direct read (no Spark job per load, r17)
    val st = graft.index.DriverParquet.groups(spark, dir.toString).head
    new WinnowIndex(spark, path, st.getLong("n_docs", 0),
      st.getInteger("k", 0), st.getInteger("w", 0),
      st.getInteger("df_cap", 0), st.getInteger("n_buckets", 0))
  }
}
