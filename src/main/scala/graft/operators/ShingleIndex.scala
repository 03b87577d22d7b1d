package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted shingle index — the storage half of incremental
  * ingest dedup.
  *
  * [[TextDedup.matchesAgainst]] is the right JOIN (incoming × base
  * only, never base × base), but as a pure function it re-shingles and
  * re-explodes the BASE corpus on every call — at 100 TB that means
  * every nightly crawl re-pays a full lake pass (the 1M-lake probe in
  * BASELINE.md measured the lake explode dominating the per-crawl
  * cost). This class makes the lake's inverted index a STORED artifact,
  * following [[Bm25Index]]'s design exactly:
  *
  *  - postings `(key, old_id, nsh)` live in parquet partitioned by
  *    `bucket = pmod(hash(key), nBuckets)` and key-sorted within files,
  *    so a probe opens only its shingles' buckets (Hive partition
  *    pruning) and skips row groups on key min/max inside them;
  *  - `_stats` sidecar pins the shingle parameters (ngram width, key
  *    hashing, bucket count) so a probe can never silently run with
  *    mismatched shingling;
  *  - `_ranges` sidecar records every build/append's docid interval —
  *    re-appending an indexed doc would double its postings, so an
  *    overlapping append throws (same guard, and same `force` escape
  *    hatch, as [[Bm25Index.append]]).
  *
  * Keys are 8-byte `xxhash64(shingle)` by default — the
  * [[SubstrDedup]] precedent: word-trigram strings average ~20 bytes
  * and the hashed index is ~3× smaller and join-cheaper; a 64-bit
  * collision adds at most 1 to one pair's intersection count
  * (ShingleIndexSpec pins hashed == exact-string on the test corpus).
  * `hashKeys = false` stores the shingle verbatim for exact-at-any-
  * scale semantics.
  *
  * The reference has no dedup surface (SURVEY §2.5) — this is the
  * north-star extension's production-lifecycle form: build the lake
  * index once, probe it per crawl, append each accepted batch's own
  * shingles, never re-shingle the lake.
  */
class ShingleIndex private (
    val spark: SparkSession,
    val path: String,
    val nDocs: Long,
    val ngram: Int,
    val nBuckets: Int,
    val hashKeys: Boolean) {

  /** The CURRENT committed snapshot's postings (r17 — manifest-pinned
    * like [[Bm25Index.postings]]: maintenance is safe against
    * concurrent readers; a resolved probe plan reads its snapshot to
    * completion while compact/merge commit the next one beside it). */
  def postings: DataFrame = {
    val m = graft.index.Manifests.require(spark, path)
    graft.index.Manifests.dataFrame(spark, path, m)
  }

  /** Land a batch's keyed postings whole in a fresh generation and
    * commit (r17 — the batch becomes visible atomically; an
    * interrupted write leaves an orphan the next commit reaps). */
  private def writePostingsGeneration(
      docs: DataFrame, idCol: String, textCol: String): Unit = {
    val m = graft.index.Manifests.require(spark, path)
    val gen = graft.index.Manifests.genDirName(m.n + 1)
    keyed(docs, idCol, textCol)
      .select(col("key"), col("id").as("old_id"), col("nsh"))
      .withColumn("bucket", pmod(hash(col("key")), lit(nBuckets)))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "key")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, m.book,
      m.parts ++ graft.index.Manifests.listParts(spark, path, gen))
    ()
  }

  /** Exploded keyed shingles of `docs`: (key, id, nsh) under THIS
    * index's shingle parameters. */
  private def keyed(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // explodedShingles, not a bare explode (r18): the non-outer
    // explode's inferred generate filter re-ran the shingle kernel in
    // the scan — see TextDedup.explodedShingles' scaladoc
    val sh = TextDedup.explodedShingles(docs, idCol, textCol, ngram)
      .withColumnRenamed("shingle", "__shingle")
    val k = if (hashKeys) xxhash64(col("__shingle")) else col("__shingle")
    sh.select(k.as("key"), col("id"), col("nsh"))
  }

  /** Cross-corpus near-dup pairs of an incoming batch against the
    * INDEXED lake: [[TextDedup.matchesAgainst]]'s semantics — output
    * (new_id, old_id, jaccard ≥ threshold) — with the base side read
    * from the stored postings. The lake's text is never read and never
    * re-shingled (plan-pinned): the probe's cost is the incoming
    * batch's shingling plus a pruned index read.
    *
    * Bucket pruning: one bounded aggregate (≤ nBuckets rows) computes
    * the incoming shingles' bucket set; a small crawl batch then opens
    * only its matched buckets of the lake index — the same
    * candidates-read story as [[Bm25Index.search]]. A batch whose
    * shingles touch every bucket skips the filter (it would prune
    * nothing). */
  def probe(
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    // ONE shingle pass over the batch: the bucket-set aggregate and
    // the postings join both reuse the materialized keys (the batch is
    // the small side by the ingest contract; lineage is released by GC
    // when the result's reference drops — the DataMix localCheckpoint
    // pattern)
    val inc = keyed(incoming, idCol, textCol)
      .select(col("key"), col("id").as("new_id"), col("nsh").as("nsh_new"))
      .localCheckpoint()
    probeKeyed(inc, threshold)
  }

  /** [[probe]]'s core over the ALREADY-KEYED batch `(key, new_id,
    * nsh_new)` — split out (r14) so [[survivors]] can shingle the
    * batch once and reuse the checkpointed keys for both the lake
    * probe and the intra-batch pass. */
  private def probeKeyed(inc: DataFrame, threshold: Double): DataFrame = {
    // ONE bounded aggregate (≤ nBuckets rows) yields BOTH the bucket
    // prune set and the batch's key count — the broadcast-vs-shuffle
    // decision used to burn a second count() job on the same
    // checkpointed batch for a number this aggregate already knows
    val bStats = inc
      .groupBy(pmod(hash(col("key")), lit(nBuckets)).as("b"))
      .agg(count(lit(1)).as("n")).collect()
    val bSet = bStats.map(_.getInt(0))
    val nKeys = bStats.map(_.getLong(1)).sum
    val all = postings
    val base = if (bSet.length < nBuckets)
      all.filter(col("bucket").isin(bSet.map(Integer.valueOf).toSeq: _*))
    else all
    // the lake postings NEVER shuffle: when the batch's keyed shingles
    // fit a broadcast (the normal crawl-vs-lake asymmetry), the join is
    // a map-side hash probe riding the pruned postings scan, and the
    // only exchange left is the candidate-pair aggregation — cost
    // proportional to real overlap, not lake size. An oversized batch
    // falls back to the shuffle join rather than OOMing executors.
    val incJ = if (nKeys <= ShingleIndex.MaxBroadcastKeys)
      broadcast(inc) else inc
    incJ.join(
        base.select(col("key"), col("old_id"), col("nsh").as("nsh_old")),
        "key")
      // size-ratio prune, as in TextDedup.ngramJaccardPairs
      .filter(least(col("nsh_new"), col("nsh_old")) >=
        lit(threshold) * greatest(col("nsh_new"), col("nsh_old")))
      .groupBy("new_id", "nsh_new", "old_id", "nsh_old")
      .agg(count(lit(1)).as("__inter"))
      .withColumn("jaccard", col("__inter").cast("double") /
        (col("nsh_new") + col("nsh_old") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "old_id", "jaccard")
  }

  /** Index-routed [[TextDedup.incrementalSurvivors]]: incoming rows
    * with no near-dup in the indexed lake, min-id-deduped within the
    * batch itself. Intra-batch pairing is [[TextDedup
    * .ngramJaccardPairs]] over the (small) batch only — the lake side
    * comes entirely from [[probe]].
    *
    * `excludeSelf = true` ignores lake matches whose `old_id` is one of
    * the batch's OWN ids — the replay-safety switch for streaming
    * ingest: if a crashed attempt already appended this batch's
    * shingles, a recompute would otherwise see every row as a dup of
    * itself in the lake and deliver an empty (wrong) survivor set.
    * With self-exclusion the recompute is deterministic regardless of
    * whether the append landed (batch ids never legitimately collide
    * with lake ids — the `_ranges` overlap guard enforces exactly
    * that). One extra anti-join against the (small, broadcast) batch
    * id set; off by default for the pure-batch path. */
  def survivors(
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      excludeSelf: Boolean = false): DataFrame = {
    // ONE shingle pass for BOTH tiers (r14): the lake probe and the
    // intra-batch pass share the checkpointed keyed set — the intra
    // self-join then shuffles 8-byte hashed keys instead of
    // re-shingling the batch and shuffling shingle strings (~40% of
    // the per-crawl survivors cost at the sf0.1 shape)
    val inc = keyed(incoming, idCol, textCol)
      .select(col("key"), col("id").as("new_id"), col("nsh").as("nsh_new"))
      .localCheckpoint()
    val matches = probeKeyed(inc, threshold)
    val vsLake = if (!excludeSelf) matches
      else matches.join(
        broadcast(incoming.select(col(idCol).cast("long").as("__self"))),
        matches("old_id").cast("long") === col("__self"), "left_anti")
    // materialized (r17 optimization round): vsBase feeds TWO
    // downstream anti-joins (`fresh` and `freshKeyed`), and without
    // the checkpoint each one re-executes the whole lake-probe chain
    // (pruned postings scan + broadcast join + pair aggregate) to
    // build its broadcast side — the probe ran twice per survivors
    // call. vsBase is bounded by the batch's id count, so the
    // materialization is tiny; the probe now executes exactly once.
    val vsBase = vsLake.select(col("new_id").as(idCol)).distinct()
      .localCheckpoint()
    val fresh = incoming.join(vsBase, Seq(idCol), "left_anti")
    val freshKeyed = inc
      .join(broadcast(vsBase.select(col(idCol).as("__dup"))),
        inc("new_id") === col("__dup"), "left_anti")
      .select(col("key"), col("new_id").as("id"),
        col("nsh_new").as("nsh"))
    val intra = TextDedup.ngramJaccardPairsKeyed(freshKeyed, threshold)
    TextDedup.keepRepresentatives(fresh, idCol, intra)
  }

  /** Append a batch's shingles into their bucket partitions — the
    * accepted-crawl path (existing files untouched; the lake is never
    * re-shingled). Same docid-range overlap guard as
    * [[Bm25Index.append]]: re-appending an indexed doc would double
    * its postings; `force = true` takes that risk knowingly. Repeated
    * appends leave one small file per batch per touched bucket —
    * [[compact]] during maintenance windows. */
  def appendBatch(docs: DataFrame, idCol: String, textCol: String,
      force: Boolean = false): ShingleIndex = {
    val Array(st) = docs
      .agg(count(col(idCol)).as("n"),
        min(col(idCol).cast("long")).as("lo"),
        max(col(idCol).cast("long")).as("hi"))
      .collect()
    val nNew = st.getLong(0)
    if (nNew == 0L) return this
    require(!st.isNullAt(1),
      s"shingle append: every value of id column '$idCol' casts to null")
    val (lo, hi) = (st.getLong(1), st.getLong(2))
    if (!force) Bm25Index.readRanges(spark, path)
      .find { case (l, h) => lo <= h && l <= hi }
      .foreach { case (l, h) => throw new IllegalArgumentException(
        s"shingle append: id range [$lo,$hi] intersects already-indexed " +
        s"[$l,$h] — re-appending an indexed doc doubles its postings; " +
        "use force=true only if the overlap is intentional")
      }
    // the INTENDED range is recorded BEFORE the postings write: a crash
    // (or task retry of this driver step) between the two leaves a range
    // claim with missing postings, so a blind re-run of the same batch
    // FAILS the overlap guard loudly — repair is explicit (re-append the
    // named range with force=true, or remove its _ranges row) instead of
    // the old ordering's silent posting-doubling. Stats stay last: a
    // crash before them only undercounts nDocs (cosmetic).
    Bm25Index.appendRange(spark, path, lo, hi)
    // repartition ON the bucket (r14): without it every shuffle task
    // writes its own sliver into every bucket dir it holds rows for —
    // tasks x buckets small files PER APPEND (measured 2k+ files per
    // 10k-doc batch), which is the fragmentation the compact cadence
    // then has to clean. One small shuffle of the batch's postings
    // buys one file per touched bucket per append.
    writePostingsGeneration(docs, idCol, textCol)
    ShingleIndex.writeStats(spark, path, nDocs + nNew, ngram, nBuckets,
      hashKeys)
    new ShingleIndex(spark, path, nDocs + nNew, ngram, nBuckets, hashKeys)
  }

  /** Replay-safe [[appendBatch]]: if the batch's EXACT id range is
    * already recorded in `_ranges`, the append is SKIPPED (a previous
    * attempt claimed it) instead of throwing — the idempotent form the
    * streaming ingest path retries through. The skip window where the
    * range landed but the postings write crashed is detectable
    * ([[missingRanges]]) and repairable ([[reconcile]]); a PARTIAL
    * overlap still throws, because that is never a replay.
    *
    * Unlike [[Bm25Index.appendIfAbsent]] (r15), the blind skip here
    * does NOT carry a stats-finish protocol — deliberately: the BM25
    * lake's (n, Σdl) are SCORE-BEARING, so its
    * postings-landed-stats-crashed window permanently shifted every
    * score and needed the `_stats_pending` flag; this lake's only
    * mutable stat is `nDocs`, which no probe or survivor read ever
    * consults (Jaccard is per-pair, the df cap is computed from the
    * merged postings at probe time) — the same window here
    * undercounts a display count until the next build/compact, which
    * is the documented cosmetic trade of [[appendBatch]]'s
    * stats-last ordering. */
  def appendBatchIfAbsent(
      docs: DataFrame, idCol: String, textCol: String): ShingleIndex = {
    val Array(st) = docs
      .agg(min(col(idCol).cast("long")).as("lo"),
        max(col(idCol).cast("long")).as("hi"))
      .collect()
    if (st.isNullAt(0)) return this // empty batch: nothing to claim
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    if (Bm25Index.readRanges(spark, path).contains((lo, hi))) this
    else appendBatch(docs, idCol, textCol)
  }

  /** Ranges recorded in `_ranges` with NO postings on disk — the
    * footprint of a crash between [[appendBatch]]'s range claim and its
    * postings write. One pruned pass over the postings (broadcast
    * range-interval join, lake never shuffles). */
  def missingRanges(): Seq[(Long, Long)] = {
    val claimed = Bm25Index.readRanges(spark, path)
    if (claimed.isEmpty) return Seq.empty
    import spark.implicits._
    val ranges = broadcast(claimed.toDF("lo", "hi"))
    val present = ranges.join(postings,
        col("old_id").cast("long").between(col("lo"), col("hi")), "left_semi")
      .select("lo", "hi").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    claimed.filterNot(present)
  }

  /** Repair [[missingRanges]] from a recovery corpus (e.g. the
    * delivered-survivors store the streaming path writes BEFORE it
    * appends): re-shingles only the missing ranges' rows and lands
    * their postings under the already-claimed ranges. No-op when
    * nothing is missing. */
  def reconcile(
      recovery: DataFrame, idCol: String, textCol: String): ShingleIndex = {
    val missing = missingRanges()
    if (missing.isEmpty) return this
    val inRange = missing
      .map { case (lo, hi) => col(idCol).cast("long").between(lo, hi) }
      .reduce(_ || _)
    val docs = recovery.filter(inRange)
    val nNew = docs.count()
    writePostingsGeneration(docs, idCol, textCol)
    ShingleIndex.writeStats(spark, path, nDocs + nNew, ngram, nBuckets,
      hashKeys)
    new ShingleIndex(spark, path, nDocs + nNew, ngram, nBuckets, hashKeys)
  }

  /** The full per-crawl ingest step: gate the batch against the lake
    * and itself ([[survivors]]), then index the accepted rows so the
    * NEXT crawl dedups against them too. The survivor set is
    * materialized (localCheckpoint) BEFORE the append mutates storage —
    * the returned DataFrame must not lazily re-read an index that now
    * contains the batch itself. Returns (survivors, grown index). */
  def ingest(
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): (DataFrame, ShingleIndex) = {
    val surv = survivors(incoming, idCol, textCol, threshold)
      .localCheckpoint()
    (surv, appendBatch(surv, idCol, textCol))
  }

  /** `(fileCount, bytes)` of the current snapshot's postings tree —
    * the part of the lake [[compact]] can actually defragment (the
    * `_ranges` / `_batches` sidecars also grow a tiny file per
    * append, but they are driver-side reads, never scan inputs, and a
    * post-compact lake must read as "no compaction needed"). One
    * listing over the manifest's part dirs — the same walk every
    * post-append probe already pays, so reading it once per batch
    * adds nothing asymptotic. */
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

  /** The auto-compaction trigger ([[IngestStream]]'s `AutoCompact`
    * cadence, r14 — the [[Bm25Index.autoBuckets]] pattern applied to
    * WHEN instead of HOW MANY): compact when the on-disk file count
    * exceeds `slack ×` the IDEAL layout's file count, where ideal =
    * `max(nBuckets, bytes / targetFileBytes)` — one file per bucket
    * until buckets outgrow the target file size, then size-bounded
    * files. The rule self-scales: a growing lake raises the ideal
    * count, so compaction (a full rewrite, cost ∝ lake size) fires
    * ever less often while the small-file tax per probe stays bounded
    * at `slack ×` optimal.
    *
    * `slack = 16` is calibrated from BOTH r14 probe sweeps
    * (BASELINE.md): with the old sliver writes (tasks × buckets files
    * per append) the tax was so steep that ANY cadence won and slack 4
    * matched the measured optimum; with the bucket-repartitioned
    * writes (exactly one file per bucket per append) the measured
    * per-probe tax is ~0.5 ms/file while a rewrite costs seconds per
    * 10⁷ postings, putting the break-even at ~20+ appends — slack 4
    * then FIRES TOO EARLY and pays rewrites that save nothing (106 vs
    * 76 s at the 1M shape). 16 sits just under the measured
    * break-even: a clean-append stream compacts every ~16 batches,
    * while a legacy sliver-fragmented lake (32× the file growth)
    * still triggers almost immediately. */
  def shouldCompact(
      slack: Double = 16.0,
      targetFileBytes: Long = 256L << 20): Boolean = {
    val (files, bytes) = storageFootprint()
    IndexMerge.needsCompact(files, bytes, nBuckets, slack, targetFileBytes)
  }

  /** Absorb `other` — a shard built with IDENTICAL shingle parameters
    * over a DISJOINT docid range — into this index by whole-generation
    * directory moves (r17, was per-bucket file moves): shard postings
    * bucket by the same content hash, so the merged snapshot is just
    * both part sets. No posting is read or rewritten; the merge costs
    * O(generations) renames + ONE manifest commit however big the
    * shards are — the 100 TB build shape (shards build in parallel
    * with local sorts, merge is metadata).
    *
    * Crash-safe roll-forward: `other`'s ranges are claimed in
    * `_ranges` first (value-idempotent), then a `_merge_pending`
    * marker carrying the post-merge stats row and the source path is
    * the point of no return — every load completes an interrupted
    * merge ([[ShingleIndex.completeMerge]]). `other`'s directory is
    * deleted on completion; re-using its handle is an error. */
  def merge(other: ShingleIndex): ShingleIndex = mergeAll(Seq(other))

  /** Multi-way [[merge]] (r15) — [[Bm25Index.mergeAll]]'s one-claims-
    * pass / one-marker / one-stats-write shape over the shingle lake;
    * the pairwise chain's per-call metadata jobs dominate a
    * many-shard merge (BASELINE r15). */
  def mergeAll(others: Seq[ShingleIndex],
      compact: Boolean = false): ShingleIndex = {
    if (others.isEmpty) return this
    others.foreach { other =>
      require(other.ngram == ngram && other.nBuckets == nBuckets &&
        other.hashKeys == hashKeys,
        s"shingle merge: parameter mismatch — this=(ngram=$ngram," +
        s"buckets=$nBuckets,hashKeys=$hashKeys) other=(ngram=${other.ngram}," +
        s"buckets=${other.nBuckets},hashKeys=${other.hashKeys}); shards " +
        "must be built with identical parameters")
    }
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcs = others.map(_.path)
    graft.operators.IndexMerge.requireDistinctSources(spark, path, srcs)
    IndexMerge.requireQuiesced(spark, path, srcs)
    // an interrupted merge of a DIFFERENT source set must finish
    // first; settling rewrites `_stats`, so re-read rather than trust
    // the handle's nDocs past it (ADVICE r15 — Bm25Index.mergeAll's
    // note)
    val ownedSet = srcs.map(IndexMerge.ownedPath).toSet
    var curN = nDocs
    IndexMerge.readMarker(fs, dst).foreach { case (src, _) =>
      if (IndexMerge.splitSrcs(src).toSet != ownedSet) {
        ShingleIndex.completeMerge(spark, path)
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
      case Some((_, stats)) => stats.head // resuming: post-stats fixed
      case None =>
        try {
          IndexMerge.claimRangesAll(spark, path, owned)
          val n = curN + others.map(_.nDocs).sum
          IndexMerge.writeMarker(fs, dst, IndexMerge.joinSrcs(owned),
            Seq(n, ngram.toLong, nBuckets.toLong,
              if (hashKeys) 1L else 0L))
          n
        } catch {
          case e: Throwable => // refused before any move: hand back
            srcs.foreach(s => IndexMerge.releaseOwnership(spark, s))
            throw e
        }
    }
    // runs THIS merge to the end (r17 — whole-generation moves + ONE
    // manifest commit; pinned readers of the destination are
    // undisturbed, new readers see the absorbed shards atomically)
    ShingleIndex.completeMerge(spark, path)
    val merged = new ShingleIndex(spark, path, postN, ngram, nBuckets,
      hashKeys)
    // opt-in post-step (r16) — see Bm25Index.mergeAll's note
    if (compact && merged.shouldCompact()) merged.compact() else merged
  }

  /** Offline maintenance after repeated [[appendBatch]]es: rewrite
    * the whole lake key-sorted into ONE fresh generation and commit —
    * [[Bm25Index.compact]]'s r17 contract (safe against concurrent
    * readers: a probe pinned to the fragmented snapshot finishes
    * undisturbed; sidecars — `_stats`, `_ranges`, `_batches`,
    * `_quiesced` — never move, so nothing can be forgotten by a
    * copy list). */
  def compact(maxRecordsPerFile: Long = 5000000L): ShingleIndex = {
    // settle any interrupted merge first: compacting under a pending
    // marker would fold moved-in generations the roll-forward still
    // expects to commit
    ShingleIndex.completeMerge(spark, path)
    val m = graft.index.Manifests.require(spark, path)
    val gen = graft.index.Manifests.genDirName(m.n + 1)
    // repartition ON the bucket first (r13): without it each read
    // task writes its own slice into every bucket dir it holds rows
    // for, and "compaction" barely reduced the file count — now a
    // bucket's rows land in one task, giving whole-bucket key-sorted
    // files (split only by maxRecordsPerFile)
    graft.index.Manifests.dataFrame(spark, path, m)
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "key")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, m.book,
      graft.index.Manifests.listParts(spark, path, gen))
    new ShingleIndex(spark, path, nDocs, ngram, nBuckets, hashKeys)
  }
}

object ShingleIndex {

  /** Sentinel default: derive the bucket count from the corpus's
    * shingle volume via [[Bm25Index.autoBuckets]] (same cube-root rule;
    * a shingle posting and a term posting are the same storage unit). */
  val AutoBuckets: Int = 0

  /** Largest keyed-shingle row count [[ShingleIndex.probe]] will
    * broadcast (~20 B/row → ≤ ~100 MB hashed relation per executor —
    * the standard "dimension fits memory" budget). Above it the probe
    * degrades to a shuffle join instead of risking executor OOM. */
  val MaxBroadcastKeys: Long = 4000000L

  private def writeStats(spark: SparkSession, path: String, nDocs: Long,
      ngram: Int, nBuckets: Int, hashKeys: Boolean): Unit = {
    import spark.implicits._
    Seq((nDocs, ngram, nBuckets, hashKeys))
      .toDF("n_docs", "ngram", "n_buckets", "hash_keys")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
  }

  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      ngram: Int = 3,
      nBuckets: Int = AutoBuckets,
      hashKeys: Boolean = true): ShingleIndex = {
    val spark = docs.sparkSession
    // stats pass first (and the empty guard BEFORE the postings write
    // mutates the target path); the shingle lineage runs twice — once
    // aggregated, once exploded — which a one-time build affords
    val Array(st) = TextDedup.shingles(docs, idCol, textCol, ngram)
      .agg(count(lit(1)).as("n"), sum(col("nsh")).as("tot"),
        min(col("id").cast("long")).as("lo"),
        max(col("id").cast("long")).as("hi"))
      .collect()
    require(st.getLong(0) > 0,
      s"shingle index: no shinglable docs, refusing to build $path")
    require(!st.isNullAt(2),
      s"shingle index: every value of id column '$idCol' casts to null")
    val nb = if (nBuckets == AutoBuckets) Bm25Index.autoBuckets(st.getLong(1))
      else nBuckets
    // a rebuild over an existing path replaces the index whole (r17:
    // explicit reset so the manifest store restarts at generation 1)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    val gen = graft.index.Manifests.genDirName(1L)
    val idx = new ShingleIndex(spark, path, 0L, ngram, nb, hashKeys)
    idx.keyed(docs, idCol, textCol)
      .select(col("key"), col("id").as("old_id"), col("nsh"))
      .withColumn("bucket", pmod(hash(col("key")), lit(nb)))
      .repartition(col("bucket")) // r14: see Bm25Index.build's note
      .sortWithinPartitions("bucket", "key")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, None,
      graft.index.Manifests.listParts(spark, path, gen))
    writeStats(spark, path, st.getLong(0), ngram, nb, hashKeys)
    Bm25Index.appendRange(spark, path, st.getLong(2), st.getLong(3))
    new ShingleIndex(spark, path, st.getLong(0), ngram, nb, hashKeys)
  }

  /** Roll an interrupted [[ShingleIndex.merge]] forward — called by
    * every [[load]]: the marker carries the full post-merge stats row
    * and the source path, so every step (move remaining files, rewrite
    * `_stats` from the marker, delete the drained source, delete the
    * marker) is idempotent from any crash point. No-op without a
    * marker. */
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
        stats(3) == 1L)
      IndexMerge.deleteMarker(fs, dst)
    }
  }

  def load(spark: SparkSession, path: String): ShingleIndex = {
    completeMerge(spark, path) // mid-merge crash roll-forward
    val dir = new org.apache.hadoop.fs.Path(s"$path/_stats")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir))
      throw new graft.index.IndexNotFoundException(
        s"no shingle index at $path")
    // one-row sidecar: driver-direct read (no Spark job per load, r17)
    val st = graft.index.DriverParquet.groups(spark, dir.toString).head
    new ShingleIndex(spark, path, st.getLong("n_docs", 0),
      st.getInteger("ngram", 0), st.getInteger("n_buckets", 0),
      st.getBoolean("hash_keys", 0))
  }
}
