package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Knn, Pq}

/** Vector index stored *partitioned by IVF cluster* — the k-means twin
  * of [[LshVectorIndex]], same 100 TB storage story: vectors land in
  * `cluster=<id>/` directories at write time, and a search reads ONLY
  * the `nprobe` probed clusters (Hive partition pruning — unprobed
  * files are never opened). Unlike the hyperplane buckets, IVF cells
  * follow the data distribution, so probing the nearest cells gives
  * better recall per file read on clustered corpora (the usual case for
  * embedding spaces).
  *
  * With a PQ model supplied at build time this becomes the full faiss
  * IVF+PQ layout: each row also carries an m-byte `code` column, and
  * [[search]] runs ADC first — the probed-cluster scan touches only
  * (docid, code), i.e. partition pruning × column pruning together cut
  * a 100 TB corpus to a few GB of actual read — then re-ranks the
  * shortlist by exact cosine from the `vector` column (predicate-pushed
  * id fetch). At small scale the two-phase cost exceeds the savings;
  * at cluster scale the scan reduction is the whole game.
  *
  * The codebooks are persisted next to the data (`_centroids/` and
  * `_pq/`, underscore-prefixed dirs the partition reader ignores) so
  * `load` searches with exactly the models the index was built with —
  * floats round-trip bit-exact through parquet. */
class IvfVectorIndex private (
    val spark: SparkSession,
    val path: String,
    val model: Ivf.Model,
    val pqModel: Option[Pq.Model]) {

  def df: DataFrame = spark.read.parquet(path)

  /** Exact top-k inside the probed clusters (approximate overall;
    * nprobe = k clusters degrades gracefully to exact full-scan). */
  def search(queryVec: Array[Float], k: Int, nprobe: Int = 1): DataFrame = {
    val probes = model.nearest(queryVec, nprobe)
    Knn.search(df.filter(col("cluster").isin(probes: _*)),
      "vector", "docid", queryVec, k)
  }

  /** IVF+PQ two-phase search (requires a PQ-coded index): ADC shortlist
    * of k*refine over the probed clusters' (docid, code) columns only,
    * then exact cosine re-rank from the `vector` column. */
  def searchAdc(
      queryVec: Array[Float],
      k: Int,
      nprobe: Int = 1,
      refine: Int = 5): DataFrame = {
    val pq = pqModel.getOrElse(throw new IllegalStateException(
      s"Index at $path was built without a PQ model — use search()"))
    val probes = model.nearest(queryVec, nprobe)
    val probed = df.filter(col("cluster").isin(probes: _*))
    val shortlist = Pq.adcScore(probed.select("docid", "code"), "code",
        queryVec, pq)
      .orderBy(desc("adc_score"), col("docid").asc)
      .limit(k * refine)
      .select("docid")
      .collect().map(_.getLong(0)) // boundary set: k*refine ids
    Knn.search(
      probed.filter(col("docid").isin(shortlist.toIndexedSeq: _*)),
      "vector", "docid", queryVec, k)
  }

  /** Incremental maintenance: assign new rows with the STORED codebook
    * (so existing partition pruning stays valid — the codebook is the
    * index's contract, never retrained on append) and append their
    * files into the matching `cluster=` partitions; optionally PQ-code
    * them when the index carries codes. Unprobed clusters still never
    * open; a drifted corpus wants a rebuild, not an append — same
    * trade faiss documents for IVF.
    *
    * Crash footprint: the existing generation is never touched (pure
    * file adds; in-flight task output lives under `_temporary`, which
    * readers ignore), so an interrupted append leaves the old rows
    * fully readable — spec-pinned in IvfIndexCrashSpec. What it does
    * NOT have is the postings lakes' `_ranges` replay ledger: a crash
    * during job commit can land a visible SUBSET of the batch, and a
    * blind re-run appends the whole batch again (duplicate docids).
    * Recovery contract: re-append after `df.filter` shows the batch's
    * docids absent, or dedup by docid at read, or rebuild. */
  def append(docs: DataFrame, vecCol: String, idCol: String): IvfVectorIndex = {
    val assigned = Ivf.assign(docs, vecCol, model)
      .withColumnRenamed(vecCol, "vector")
      .withColumnRenamed(idCol, "docid")
    val coded = pqModel match {
      case Some(pq) => Pq.encode(assigned, "vector", pq)
      case None => assigned
    }
    coded.sortWithinPartitions("cluster", "docid")
      .write.mode("append").partitionBy("cluster").parquet(path)
    // note the batch's docid interval in `_ranges` (r15) — the ledger
    // the shard-merge disjointness guard reads. Noted AFTER the data
    // write (stats-last analogue): a crash in between leaves this
    // batch invisible to the guard, never a false claim; per-append
    // replay protection stays the caller's job (BatchLedger on the
    // streaming path), unchanged contract.
    val Array(idr) = docs.agg(
      min(col(idCol).cast("long")), max(col(idCol).cast("long"))).collect()
    if (!idr.isNullAt(0))
      graft.operators.IndexMerge.recordRange(
        spark, path, idr.getLong(0), idr.getLong(1))
    this
  }

  def count(): Long = df.count()

  /** Absorb `other` — a shard built with the SAME codebooks (IVF
    * centroids and, when coded, the PQ books, bit-equal) — by pure
    * file moves: every shard assigns vectors with the shared book, so
    * shard A's `cluster=7` and shard B's `cluster=7` are disjoint row
    * sets of the same merged partition. The 100 TB build shape: train
    * the codebook once on a sample, broadcast it, build shard indexes
    * in parallel (each a local sort + write), merge as O(files)
    * renames.
    *
    * Unlike the postings lakes there is no stats or ledger state to
    * tear: a crash mid-merge leaves some rows still in `other` —
    * both directories remain individually consistent and re-running
    * `merge` completes the move (idempotent). `other`'s directory is
    * deleted on completion. */
  def merge(other: IvfVectorIndex): IvfVectorIndex = mergeAll(Seq(other))

  /** Multi-way [[merge]] (r15): absorb many shards in one call —
    * docid-range claims validate ONCE over every source's `_ranges`
    * ledger ([[graft.operators.IndexMerge.claimRangesAll]], the same
    * guard the postings lakes enforce: a PARTIAL overlap between
    * shards throws instead of silently duplicating docids; indexes
    * built before the ledger existed merge unchecked — unknowable),
    * then each source's cluster files move in (renames parallel per
    * partition dir). A crash mid-way leaves every directory
    * individually consistent and a re-run completes the move (claims
    * are value-idempotent, moves skip drained sources). */
  def mergeAll(others: Seq[IvfVectorIndex],
      compact: Boolean = false): IvfVectorIndex = {
    if (others.isEmpty) return this
    others.foreach { other =>
      require(model.centroids.length == other.model.centroids.length &&
        model.centroids.zip(other.model.centroids)
          .forall { case (a, b) => java.util.Arrays.equals(a, b) },
        "ivf merge: shards must be built with the SAME IVF codebook " +
        "(bit-equal centroids) — differing books assign the same vector " +
        "to different clusters and the merged partitions would lie")
      require(pqModel.isDefined == other.pqModel.isDefined &&
        pqModel.zip(other.pqModel).forall { case (a, b) =>
          a.codebooks.length == b.codebooks.length &&
          a.codebooks.zip(b.codebooks).forall { case (ba, bb) =>
            ba.zip(bb).forall { case (ca, cb) =>
              java.util.Arrays.equals(ca, cb) } }
        },
        "ivf merge: PQ codebooks must match (or both be absent)")
    }
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.IndexMerge.requireDistinctSources(
      spark, path, others.map(_.path))
    graft.operators.IndexMerge.requireQuiesced(
      spark, path, others.map(_.path))
    IvfVectorIndex.completeRetrain(spark, path)
    // ownership rename BEFORE the claims read (r17 — see
    // [[graft.operators.IndexMerge.takeOwnership]]); the vector
    // families have no marker protocol, so a re-run of a completed
    // merge sees neither tree: allowMissing keeps that idempotent
    val owned = graft.operators.IndexMerge.takeOwnership(
      spark, others.map(_.path), allowMissing = true)
    owned.foreach(o => IvfVectorIndex.completeRetrain(spark, o))
    try graft.operators.IndexMerge.claimRangesAll(spark, path, owned)
    catch {
      case e: Throwable => // refused before any move: hand back
        others.foreach(o =>
          graft.operators.IndexMerge.releaseOwnership(spark, o.path))
        throw e
    }
    owned.zip(others).foreach { case (o, orig) =>
      graft.operators.IndexMerge.movePartitionFiles(
        fs, new org.apache.hadoop.fs.Path(o), dst, "cluster=")
      fs.delete(new org.apache.hadoop.fs.Path(o), true)
      graft.plans.AnnRouteRule.invalidate(orig.path)
    }
    // opt-in post-step (r16) — see Bm25Index.mergeAll's note
    if (compact && shouldCompact()) this.compact() else this
  }

  /** `(fileCount, bytes)` of the `cluster=*` data tree — the part a
    * many-shard merge fragments (each shard leaves its own files in
    * every cluster partition). */
  def storageFootprint(): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    graft.operators.IndexMerge.bucketFootprint(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p,
      prefix = "cluster=")
  }

  /** The auto-compaction trigger ([[graft.operators.ShingleIndex
    * .shouldCompact]]'s measured rule, ideal = one file per cluster
    * until clusters outgrow the target file size). */
  def shouldCompact(
      slack: Double = 16.0,
      targetFileBytes: Long = 256L << 20): Boolean = {
    val (files, bytes) = storageFootprint()
    graft.operators.IndexMerge.needsCompact(
      files, bytes, model.centroids.length, slack, targetFileBytes)
  }

  /** The drift RESPONDER — completes the loop [[graft.operators.Ivf
    * .drift]] opens: re-cluster ONLY the flagged clusters' rows and
    * rewrite ONLY their partitions. Mechanics:
    *
    *  1. read the drifted partitions (partition-pruned — untouched
    *     clusters' files are never opened, let alone rewritten;
    *     spec-pinned via file mtimes);
    *  2. Lloyd-refine a LOCAL codebook over those rows,
    *     [[graft.operators.Ivf.trainDistributed]] seeded from the
    *     STORED centroids of the flagged clusters (a refinement of
    *     the existing book, not a restart — ids keep their meaning);
    *  3. reassign the rows among the refined centroids (local index →
    *     the same global cluster ids), materialize BEFORE touching
    *     storage, delete exactly the flagged `cluster=` directories,
    *     append the reassigned rows, overwrite the `_centroids`
    *     sidecar with the patched codebook.
    *
    * PQ codes are content-addressed (vector × the global PQ book), so
    * rows keep their codes through reassignment — no re-encoding.
    *
    * Scope (the faiss trade, documented not hidden): rows of
    * UNTOUCHED clusters are not revisited, so a stale row that would
    * now prefer a refined centroid stays where it is until the next
    * full rebuild — retrain-in-place buys recall in the drifted
    * region for IO proportional to the drifted partitions, not the
    * corpus. Same concurrency contract as [[compact]]: maintenance
    * windows only. */
  def retrainInPlace(
      driftedClusters: Seq[Int], iters: Int = 5): IvfVectorIndex = {
    require(driftedClusters.nonEmpty, "no drifted clusters given")
    require(driftedClusters.forall(c =>
      c >= 0 && c < model.centroids.length),
      s"cluster ids out of range: $driftedClusters")
    // settle any older interrupted retrain BEFORE reading the live
    // tree: the k-means refinement below runs eager Spark jobs over
    // the drifted partitions, and a committed-but-unapplied staging
    // would leave it training on a superseded generation
    IvfVectorIndex.completeRetrain(spark, path)
    val drifted = driftedClusters.distinct.sorted
    val rows = df.filter(
      col("cluster").isin(drifted.map(Integer.valueOf): _*))
    val seeds = drifted.map(model.centroids(_)).toArray
    val local = Ivf.trainDistributed(
      rows, "vector", k = drifted.length, iters = iters,
      seeds = Some(seeds))
    // local index -> global cluster id through a tiny literal array
    val idMap = array(drifted.map(c => lit(c)): _*)
    val reassigned = Ivf.assign(rows.drop("cluster"), "vector", local)
      .withColumn("cluster",
        element_at(idMap, col("cluster") + 1))
    val patched = model.centroids.clone()
    drifted.zipWithIndex.foreach { case (g, i) =>
      patched(g) = local.centroids(i)
    }
    stageAndCommit(drifted, reassigned, patched)
  }

  /** The staged roll-forward commit shared by [[retrainInPlace]] and
    * [[growClusters]] (r14, factored r16): the old delete-then-append
    * lost the touched clusters' rows if the JVM died between the
    * partition delete and the append (the reassigned rows lived only
    * in executor-memory checkpoint blocks). Protocol, mirroring
    * [[Generations]]:
    *
    *   1. write the reassigned rows AND the patched codebook whole
    *      into `<path>/_retrain` (underscore dir — invisible to the
    *      partition reader, same filesystem so renames are renames);
    *   2. drop a COMMIT marker — the point of no return;
    *   3. per touched cluster: delete live `cluster=c`, rename the
    *      staged one in; then swap the codebook sidecar; then delete
    *      the staging dir. Every step idempotent.
    *
    * A crash BEFORE the marker rolls back at next load (index
    * untouched); a crash AFTER it rolls FORWARD at next load
    * ([[IvfVectorIndex.completeRetrain]]) — some clusters old, some
    * new mid-commit is fine because the staged data is the complete
    * row set of every touched cluster. `touched` may include ids past
    * the current codebook (the grow path's NEW clusters): their live
    * partitions simply do not exist yet and the promote renames them
    * in. */
  private def stageAndCommit(
      touched: Seq[Int],
      reassigned: DataFrame,
      patched: Array[Array[Float]]): IvfVectorIndex = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path, "_retrain")
    if (fs.exists(staging)) fs.delete(staging, true)
    // repartition ON the cluster before partitionBy (r16 — the r14
    // postings-lake lesson applied to the staging write): without it
    // every read task writes a sliver into every staged cluster dir
    // it holds rows for — tasks × clusters files, the measured cost
    // driver of a many-partition grow (GrowScaleProbe); one shuffle
    // of the touched rows buys whole-partition docid-sorted files
    reassigned.repartition(col("cluster"))
      .sortWithinPartitions("cluster", "docid")
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/_retrain/data")
    // A touched cluster that ends refinement with ZERO reassigned rows
    // (routine k-means: another refined centroid stole everything,
    // e.g. after an earlier retrain moved a neighbor onto its rows)
    // gets NO `cluster=c` dir from partitionBy — and the roll-forward
    // promotes only staged dirs, so its LIVE partition would survive
    // while its rows also land in the staged neighbors: duplicates.
    // Stage an explicit EMPTY dir for every such cluster; the promote
    // step then replaces the live partition with "no rows", which is
    // exactly the refinement's verdict. (Empty dirs keep the promote
    // loop idempotent where a cluster list in the marker would not:
    // once renamed in, the staged dir is gone and a re-run skips it —
    // re-deleting from a list would destroy an already-promoted
    // partition.)
    touched.foreach { c =>
      val stagedPart = new org.apache.hadoop.fs.Path(
        s"$path/_retrain/data/cluster=$c")
      if (!fs.exists(stagedPart)) fs.mkdirs(stagedPart)
    }
    import spark.implicits._
    patched.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_retrain/centroids")
    fs.create(new org.apache.hadoop.fs.Path(staging, "COMMIT")).close()
    IvfVectorIndex.completeRetrain(spark, path)
    new IvfVectorIndex(spark, path, Ivf.Model(patched), pqModel)
  }

  /** The drift responder for NOVEL mass — GROW the codebook instead of
    * moving it (r16, the r15 probe's finding): when incoming vectors
    * form genuinely new modes, [[retrainInPlace]] can only RELOCATE
    * the flagged centroids toward them, which measurably COSTS recall
    * (queries then probe the refined strays-cluster while related
    * base mass sits in unretrained ones — 0.564 → 0.413 @ nprobe=1
    * even mass-gated, BASELINE r15).
    *
    * Why the obvious grow is also wrong, and this one is not: the
    * same probe's headline finding is that stored-book IVF recall is
    * SELF-CONSISTENT — queries and rows route with the same codebook,
    * so however stale the book, a query lands in the cell its
    * neighbors were assigned to. Any partial change that moves SOME
    * of a mode's rows into new cells while routing-equivalent rows
    * stay behind breaks that agreement (measured: seeding new cells
    * from only the flagged partitions' rows scored 0.202 @ nprobe=1 —
    * BELOW both no-maintenance 0.447 and relocate 0.288). The
    * recall-safe grow is FROZEN-BOOK COMPETITIVE:
    *
    *  1. existing centroids never move — a row whose nearest stored
    *     centroid was `c` still has nearest OLD centroid `c` under
    *     the patched book, so the only possible reassignment is
    *     old cell → new cell;
    *  2. `add` new centroids are seeded farthest-first from the
    *     flagged clusters' rows (pruned read — the flagging batch's
    *     novel mass was just appended there; each pick is the row
    *     with the lowest nearest-centroid cosine vs stored ∪ picked,
    *     so the second seed finds the second novel mode) and refined
    *     by Lloyd rounds that recompute ONLY the new cells from the
    *     candidate rows they win against the frozen book;
    *  3. movers are then captured LAKE-WIDE: one map-only pass scores
    *     every row against the patched book (the same full-scan
    *     class as [[graft.operators.Ivf.drift]]'s reference side),
    *     and every partition holding a row that now routes to a new
    *     cell is rewritten through the staged roll-forward of
    *     [[retrainInPlace]] — so after the commit, assignment ==
    *     routing for EVERY row of the lake, restoring exact
    *     self-consistency with a strictly better-fitting book.
    *
    * IO: training is pruned to the flagged partitions; the capture
    * pass is map-only over the lake (no shuffle); the rewrite reads
    * and writes only partitions that actually contain movers. PQ
    * codes are content-addressed, so rows keep their codes; the
    * patched codebook has `k + add` rows and [[search]]'s pruning
    * contract extends to the new cells automatically. Same
    * concurrency contract as [[compact]]: maintenance windows or
    * inside the single-writer stream
    * ([[graft.streaming.IndexStream.ingestIvf]]'s `growMeanRatio`
    * wires the drift report's shape to this choice). */
  def growClusters(
      driftedClusters: Seq[Int], add: Int,
      iters: Int = 5): IvfVectorIndex = {
    require(driftedClusters.nonEmpty, "no drifted clusters given")
    require(add >= 1, s"growClusters: add=$add must be >= 1")
    require(driftedClusters.forall(c =>
      c >= 0 && c < model.centroids.length),
      s"cluster ids out of range: $driftedClusters")
    IvfVectorIndex.completeRetrain(spark, path)
    val drifted = driftedClusters.distinct.sorted
    val k0 = model.centroids.length
    val candidates = df.filter(
      col("cluster").isin(drifted.map(Integer.valueOf): _*))
    // farthest-first seeds for the new cells
    import org.apache.spark.sql.graftshim.Shim
    val newSeeds = scala.collection.mutable.ArrayBuffer
      .empty[Array[Float]]
    (0 until add).foreach { _ =>
      val book = model.centroids ++ newSeeds
      val far = candidates.select(col("docid"), col("vector"),
          Shim.column(graft.functions.CentroidCosine(
            Shim.expression(col("vector")), book)).as("__cos"))
        .orderBy(col("__cos").asc_nulls_last, col("docid").asc)
        .select(col("vector"), col("__cos")).limit(1).collect()
      require(far.nonEmpty && !far(0).isNullAt(0),
        "growClusters: flagged clusters hold no rows to seed from")
      newSeeds += far(0).getSeq[Float](0).toArray
    }
    // competitive Lloyd: assign candidates against frozen ∪ new, then
    // recompute ONLY the new cells from the rows they won — one
    // codegen'd map + one add-row aggregate per round
    val dim = model.dim
    def normalize(v: Array[Double]): Array[Float] = {
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i) * v(i); i += 1 }
      val n = if (s > 0) math.sqrt(s) else 1.0
      Array.tabulate(dim)(i => (v(i) / n).toFloat)
    }
    var newC: Array[Array[Float]] = newSeeds.toArray
    var it = 0
    while (it < iters) {
      val won = Ivf.assign(candidates.drop("cluster"), "vector",
          Ivf.Model(model.centroids ++ newC))
        .filter(col("cluster") >= k0)
        .groupBy("cluster")
        .agg(graft.Graft.vectorAvg(col("vector")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      newC = Array.tabulate(add) { i =>
        won.get(k0 + i).map(normalize).getOrElse(newC(i))
      }
      it += 1
    }
    val patched = model.centroids ++ newC
    val patchedModel = Ivf.Model(patched)
    // lake-wide capture: which partitions hold rows that now route to
    // a new cell? One map pass, a bounded (≤ k) distinct
    val touched = Ivf.assign(
        df.withColumnRenamed("cluster", "__old"), "vector", patchedModel)
      .filter(col("cluster") >= k0 && col("cluster") =!= col("__old"))
      .select("__old").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) // nothing routes to the new cells: keep the
      return this        // stored book — adding dead cells buys nothing
    val rows = df.filter(
      col("cluster").isin(touched.map(Integer.valueOf): _*))
    val reassigned = Ivf.assign(rows.drop("cluster"), "vector",
      patchedModel)
    stageAndCommit(touched ++ (k0 until k0 + add), reassigned, patched)
  }

  /** Offline maintenance: rewrite the data files at the target file
    * size (repeated appends leave one small file per append per
    * cluster; small files tax every scan's task scheduling). Rewrites
    * into a sibling directory then swaps via the two-rename
    * [[Generations.swap]] (r14 — was delete-then-rename, whose crash
    * window left NO readable index on disk); every [[IvfVectorIndex
    * .load]] runs the matching repair. Still NOT safe against
    * concurrent readers (this index trades the flat [[VectorIndex]]'s
    * versioned storage for partition layout; compact during a
    * maintenance window, or rebuild to a fresh path). */
  def compact(maxRecordsPerFile: Long = 5000000L): IvfVectorIndex = {
    // settle any interrupted retrain first: the sibling rewrite below
    // carries only data + codebook sidecars, so a pending `_retrain`
    // staging dir would be silently dropped by the swap
    IvfVectorIndex.completeRetrain(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact")
    // re-sort while rewriting: reading the old files yields arbitrary
    // row order, and compaction must restore the docid-sorted layout
    // the fetch-path row-group pruning depends on (see build)
    spark.read.parquet(path)
      .sortWithinPartitions("cluster", "docid")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("cluster")
      .parquet(tmp.toString)
    // carry the codebook sidecars over, then swap; `_pq` before
    // `_centroids` — the generation-complete marker lands last
    // (`_ranges` is the shard-merge disjointness ledger, r15)
    val cur = new org.apache.hadoop.fs.Path(path)
    Seq("_ranges", "_batches", "_quiesced", "_pq", "_centroids")
      .foreach { sub =>
      val src = new org.apache.hadoop.fs.Path(cur, sub)
      if (fs.exists(src)) org.apache.hadoop.fs.FileUtil.copy(
        fs, src, fs, new org.apache.hadoop.fs.Path(tmp, sub),
        false, spark.sparkContext.hadoopConfiguration)
    }
    Generations.swap(spark, path)
    graft.plans.AnnRouteRule.invalidate(path)
    this
  }
}

object IvfVectorIndex {

  /** Build from (docid, vector, …) rows with a trained codebook; pass
    * `pqModel` to also store m-byte PQ codes (the IVF+PQ layout). */
  def build(
      docs: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      model: Ivf.Model,
      pqModel: Option[Pq.Model] = None,
      maxRecordsPerFile: Long = 5000000L): IvfVectorIndex = {
    val spark = docs.sparkSession
    val assigned = Ivf.assign(docs, vecCol, model)
      .withColumnRenamed(vecCol, "vector")
      .withColumnRenamed(idCol, "docid")
    val coded = pqModel match {
      case Some(pq) => Pq.encode(assigned, "vector", pq)
      case None => assigned
    }
    // docid-sorted files: parquet row-group min/max stats on docid are
    // then disjoint ranges, so the shortlist re-rank (searchAdc) and
    // candidate-vector fetches (Bm25Index.hybridSearch) prune to the
    // few row groups holding their In(docid) set instead of decoding
    // every group — unsorted files have near-full-range stats and
    // prune nothing. Local sort only (no shuffle added).
    coded.sortWithinPartitions("cluster", "docid").write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("cluster")
      .parquet(path)
    // fresh build: reset the docid-range ledger to this corpus's
    // interval (r15) — [[mergeAll]]'s shard-disjointness guard
    val Array(idr) = docs.agg(
      min(col(idCol).cast("long")), max(col(idCol).cast("long"))).collect()
    if (!idr.isNullAt(0))
      graft.operators.IndexMerge.resetRange(
        spark, path, idr.getLong(0), idr.getLong(1))
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_centroids")
    pqModel.foreach { pq =>
      // flatten m x ksub x dsub to rows (subspace, centroid, values)
      pq.codebooks.zipWithIndex.flatMap { case (book, j) =>
        book.zipWithIndex.map { case (cen, c) => (j, c, cen.toSeq) }
      }.toSeq.toDF("subspace", "centroid", "values")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/_pq")
    }
    // A rebuild over an existing path replaces the codebook: sessions
    // with spark.graft.ann.autoRoute=true must not keep routing with
    // the stale cached centroids (probes against old centroids over new
    // cluster assignments silently return wrong top-k).
    graft.plans.AnnRouteRule.invalidate(path)
    new IvfVectorIndex(spark, path, model, pqModel)
  }

  /** Roll an interrupted [[IvfVectorIndex.retrainInPlace]] to a
    * consistent state — called by every [[load]] (and by retrain and
    * compact before they start):
    *
    *  - staging present WITHOUT its COMMIT marker → the crash hit
    *    before the point of no return: roll BACK (delete staging; the
    *    live index was never touched);
    *  - staging present WITH the marker → roll FORWARD, each step
    *    idempotent: per staged `cluster=c` delete the live partition
    *    and rename the staged one in (a re-run skips clusters whose
    *    staged dir is already gone), then swap the staged codebook
    *    into `_centroids` (delete live, rename staged — a crash
    *    between the two re-runs the rename next load), then delete
    *    the staging dir.
    *
    * No-op when no staging dir exists — the hot path costs one
    * exists() probe. */
  private[index] def completeRetrain(
      spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path, "_retrain")
    if (!fs.exists(staging)) return
    if (!fs.exists(new org.apache.hadoop.fs.Path(staging, "COMMIT"))) {
      fs.delete(staging, true) // uncommitted: the live index is intact
      return
    }
    val dataDir = new org.apache.hadoop.fs.Path(staging, "data")
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir)
        .filter(_.getPath.getName.startsWith("cluster="))
        .foreach { st =>
          val live = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
          if (fs.exists(live)) fs.delete(live, true)
          require(fs.rename(st.getPath, live),
            s"retrain recovery: cannot promote ${st.getPath}")
        }
    }
    val cenStaged = new org.apache.hadoop.fs.Path(staging, "centroids")
    if (fs.exists(cenStaged)) {
      val cenLive = new org.apache.hadoop.fs.Path(path, "_centroids")
      if (fs.exists(cenLive)) fs.delete(cenLive, true)
      require(fs.rename(cenStaged, cenLive),
        "retrain recovery: cannot swap the codebook sidecar")
    }
    fs.delete(staging, true)
    graft.plans.AnnRouteRule.invalidate(path)
    ()
  }

  /** Open an index, recovering the persisted codebook(s); runs the
    * two maintenance repairs first (mid-compact swap, mid-retrain
    * commit) so a crashed maintenance window never leaves an
    * unreadable index. */
  def load(spark: SparkSession, path: String): IvfVectorIndex = {
    Generations.recover(spark, path, "_centroids")
    completeRetrain(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(sub: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$sub"))
    if (!exists("_centroids")) throw new IndexNotFoundException(
      s"No IVF codebook at $path/_centroids")
    val rows = spark.read.parquet(s"$path/_centroids")
      .orderBy("cluster").collect()
    val centroids = rows.map(_.getSeq[Float](1).toArray)
    val pq =
      if (!exists("_pq")) None
      else {
        val cells = spark.read.parquet(s"$path/_pq")
          .orderBy("subspace", "centroid").collect()
          .map(r => (r.getInt(0), r.getSeq[Float](2).toArray))
        Some(Pq.Model(cells.groupBy(_._1).toSeq.sortBy(_._1)
          .map(_._2.map(_._2)).toArray))
      }
    new IvfVectorIndex(spark, path, Ivf.Model(centroids), pq)
  }
}
