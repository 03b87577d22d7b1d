package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 keyword relevance — the lexical half of a txtai-family hybrid
  * engine (the reference family's `scoring="bm25"` / hybrid search
  * config; the studied repo itself delegates keyword scoring to the
  * server it wraps). Spark-first shapes:
  *
  *  - posting construction is one `explode` + partial-aggregated
  *    `groupBy` (map-side combine collapses per-doc term repeats before
  *    the shuffle);
  *  - ad-hoc scoring keeps the whole plan declarative: corpus stats ride
  *    a broadcast 1-row crossJoin, per-term document frequencies ride a
  *    broadcast hash join, and the final top-k lowers to
  *    TakeOrderedAndProject;
  *  - at scale, [[Bm25Index]] persists postings partitioned by a hashed
  *    term bucket: a query prunes to its terms' buckets (Hive partition
  *    pruning — unmatched buckets are never opened), which is the
  *    inverted-index read pattern at 100 TB.
  *
  * Scoring is Okapi BM25 with the Lucene idf (ln(1 + (N-df+0.5)/(df+0.5)),
  * always positive). Per-term contributions are rounded to integer
  * MICROS before the per-doc sum so the aggregate is associative —
  * float summation order varies across partitions, integer sums don't —
  * making results reproducible and oracle-checkable bit-for-bit.
  * Constants (2.2, 1.2, 0.25, 0.75) are written as literals on both the
  * engine and oracle sides so they parse to identical doubles.
  */
object Bm25 {

  /** Tokenizer shared with the oracle side: RE2/Java-compatible, no
    * lookarounds, reproducible in DuckDB's regexp_extract_all. */
  val TokenPattern = "[a-z]+|[0-9]+"

  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  /** Inverted-index rows: (docid, dl, term, tf) — one row per distinct
    * (document, term), `dl` the document's token count carried
    * denormalized so scoring never joins back to the corpus. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("docid"),
        tokens(col(textCol)).as("__toks"))
      // explode_outer + isnotnull, not explode (r18): the non-outer
      // explode over the __toks attribute triggers Catalyst's
      // InferFiltersFromGenerate, whose alias-substituted predicate
      // re-ran the full tokenize in the scan (see
      // TextDedup.explodedShingles). Row-identical: tokens() elements
      // are regexp matches (never null), so the isnotnull(term) filter
      // drops exactly the null/empty-array rows explode dropped.
      .select(col("docid"), size(col("__toks")).cast("long").as("dl"),
        explode_outer(col("__toks")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy("docid", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** 1-row corpus stats (n docs, mean token count) — broadcast into the
    * scoring plan, never collected to the driver. */
  def stats(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(size(tokens(col(textCol))).cast("long").as("__dl"))
      .agg(count(lit(1)).as("n"), sum(col("__dl")).as("__sumdl"))
      .select(col("n"),
        (col("__sumdl").cast("double") / col("n")).as("avgdl"))

  /** Raw mergeable stats: (n, sumdl) as LONGS — the exact form
    * [[Bm25Index]] persists so an append merges bit-exactly (long
    * addition is associative; a stored double avgdl would drift from
    * the full-rebuild value) — plus the batch's (min_id, max_id) for
    * the append overlap guard. Null texts count in n, contribute 0 dl. */
  private[operators] def statsRaw(
      docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(size(tokens(col(textCol))).cast("long").as("__dl"),
        col(idCol).cast("long").as("__id"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("__dl")), lit(0L)).as("sumdl"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"))

  /** Per-document marker term injected into [[postingsWithMarker]]: the
    * tokenizer can never produce it ([a-z]+|[0-9]+ excludes NUL), so
    * marker rows are invisible to term matching while letting corpus
    * stats (n, avgdl) ride the SAME postings pass — including docs with
    * zero tokens, which a plain explode would drop. */
  private[operators] val DocMarker = "\u0000"

  /** Postings plus one marker row per document (see [[DocMarker]]).
    * `dl` is the REAL token count (marker excluded); a null text yields
    * just its marker row with a null dl, mirroring [[stats]] (counted
    * in n, skipped by the dl sum). */
  private[operators] def postingsWithMarker(
      docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("docid"),
        tokens(col(textCol)).as("__toks"))
      .select(col("docid"), size(col("__toks")).cast("long").as("dl"),
        explode(concat(array(lit(DocMarker)),
          coalesce(col("__toks"), array()))).as("term"))
      .groupBy("docid", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** Per-term micro-score column (see scoring notes above). Callers
    * provide tf/dl/df/n/avgdl columns; k1/b default to the standard
    * 1.2/0.75 (0.25 = 1-b and 2.2 = k1+1 are written out so the doubles
    * are literal-identical to the oracle SQL). */
  private[operators] def termMicros(
      tf: Column, dl: Column, df: Column, n: Column, avgdl: Column): Column = {
    val idf = log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
    val tfn = tf * lit(2.2) /
      (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl))
    round(idf * tfn * lit(1000000.0), 0).cast("long")
  }

  /** Ad-hoc BM25: (docid, bm25_micros) for every document matching at
    * least one query term, scored in ONE declarative plan that scans
    * and tokenizes the corpus exactly ONCE. Use [[Bm25Index]] when the
    * corpus is indexed ahead of time.
    *
    * Single-scan mechanics (the naive formulation re-tokenized the
    * corpus three times — once each for matched postings, per-term df,
    * and n/avgdl stats):
    *  - [[postingsWithMarker]] carries corpus stats IN the postings
    *    (one un-matchable marker row per doc), so n/avgdl derive from
    *    the same shuffled postings;
    *  - both consumers keep the postings exchange byte-identical so
    *    Spark's ReuseExchange runs it once: term matching is a
    *    broadcast JOIN (an `isin` filter would push below the
    *    aggregate and fork the exchange into a filtered twin) and the
    *    stats aggregate consumes every posting column (column pruning
    *    would otherwise rewrite the shared subtree per-branch);
    *  - per-term df is a window count over the matched rows (a
    *    separate groupBy branch would be a third consumer shape and,
    *    pre-reuse, was the second corpus scan).
    * The full-postings shuffle this shares is the same volume the
    * matched-side aggregation already paid; what disappears is two
    * extra corpus scans + regex tokenization passes — the measured
    * cost driver for text pipelines. */
  def score(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.filter(_ != DocMarker)
    require(terms.nonEmpty, "bm25: empty query")
    val spark = docs.sparkSession
    import spark.implicits._
    val p = postingsWithMarker(docs, textCol, idCol)
    val st = p
      .join(broadcast(Seq(DocMarker).toDF("term")), "term")
      // count(docid) + sum(dl*tf), not count(*) + sum(dl): a marker
      // row's tf is exactly 1, so the numbers are identical — but this
      // form consumes all four posting columns, which keeps the
      // postings aggregate byte-identical to the matched branch's (the
      // optimizer prunes unused aggregate functions per-branch, and a
      // pruned twin would fork the shared exchange — see reuse note)
      .agg(count(col("docid")).as("n"),
        sum(col("dl") * col("tf")).as("__sumdl"))
      .select(col("n"),
        (col("__sumdl").cast("double") / col("n")).as("avgdl"))
    val matched = p.join(broadcast(terms.toDF("term")), "term")
    matched
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .crossJoin(broadcast(st))
      .select(col("docid"),
        termMicros(col("tf"), col("dl"), col("df"), col("n"),
          col("avgdl")).as("__micros"))
      .groupBy("docid")
      .agg(sum("__micros").as("bm25_micros"))
  }

  /** Top-k convenience over [[score]]: deterministic ties on docid;
    * lowers to TakeOrderedAndProject. */
  def topK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queryTerms: Seq[String],
      k: Int): DataFrame =
    score(docs, textCol, idCol, queryTerms)
      .orderBy(desc("bm25_micros"), col("docid").asc)
      .limit(k)

  /** Hybrid lexical+semantic ranking — txtai's `hybrid: true` blend.
    * BM25 micro-scores and cosine similarities are min-max normalized
    * over the MATCHED candidate set (deterministic: both aggregates are
    * order-independent) and blended `alpha*semantic + (1-alpha)*lexical`
    * (txtai's weight convention). Output (docid, hybrid_micros) rounded
    * so ordering is reproducible.
    *
    * `embeddings` supplies (embIdCol, embVecCol); candidates missing an
    * embedding drop out (inner join) — at scale both sides shuffle on
    * the id, and the candidate side is already pruned to term matches.
    *
    * The cosine projection sits ABOVE the candidate join, so the
    * semantic side scores only the keyword-matched survivors — never a
    * full-corpus scan of the embedding table (the join itself prunes:
    * column pruning reaches the embedding scan, and Catalyst never
    * pushes expression projections below a join). The candidate set is
    * read twice (min/max bounds + final blend) but its expensive
    * lineage — postings shuffle, BM25 aggregation, embedding scan — is
    * shared via ReuseExchange; only the candidate-bounded join and
    * cosine re-run. */
  def hybrid(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      embeddings: DataFrame,
      embIdCol: String,
      embVecCol: String,
      queryTerms: Seq[String],
      queryVec: Array[Float],
      alpha: Double = 0.5): DataFrame = {
    val lex = score(docs, textCol, idCol, queryTerms)
    val emb = embeddings.select(
      col(embIdCol).cast("long").as("docid"), col(embVecCol).as("__v"))
    val cand = lex.join(emb, "docid")
      .select(col("docid"), col("bm25_micros"),
        graft.Graft.cosineSim(col("__v"), typedlit(queryVec)).as("__cos"))
    blendMinMax(cand, alpha)
  }

  /** Faceted keyword search — the reference family's
    * Aggregate-over-filtered-search (Weaviate's GraphQL `Aggregate`
    * with a `where`/`near` restriction): per-facet statistics over the
    * documents matching the query, computed in the SAME plan as the
    * match itself. One corpus pass produces the scored candidate set
    * ([[score]]'s single-scan plan), one hash-partitioned groupBy on
    * the facet column reduces it — candidates join their facet values
    * by id, so the corpus text is never carried through the facet
    * shuffle. Output (facet value, n_docs, sum/max micros) — the hit
    * counts and score mass a search UI renders next to the top-k. */
  def facets(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queryTerms: Seq[String],
      facetCol: String): DataFrame = {
    val matched = score(docs, textCol, idCol, queryTerms)
    val sides = docs.select(col(idCol).cast("long").as("docid"),
      col(facetCol).as("facet"))
    matched.join(sides, "docid")
      .groupBy("facet")
      .agg(count(lit(1)).as("n_docs"),
        sum("bm25_micros").as("sum_micros"),
        max("bm25_micros").as("max_micros"))
  }

  /** Batch keyword scoring — the lexical half of [[hybridBatch]] as
    * its own operator: (qid, docid, bm25_micros) for every document
    * matching at least one of its query's terms, all queries served by
    * ONE shared postings pass. Per-qid scores are bit-identical to
    * [[score]] with that query's terms. */
  def scoreBatch(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queries: Seq[(Long, Seq[String])]): DataFrame = {
    require(queries.nonEmpty, "bm25: empty query batch")
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = queries.flatMap { case (qid, terms) =>
      val t = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.filter(_ != DocMarker)
      require(t.nonEmpty, s"bm25: empty query $qid")
      t.map(term => (qid, term))
    }.toDF("qid", "term")
    val p = postingsWithMarker(docs, textCol, idCol)
    val st = p
      .join(broadcast(Seq(DocMarker).toDF("term")), "term")
      .agg(count(col("docid")).as("n"),
        sum(col("dl") * col("tf")).as("__sumdl"))
      .select(col("n"),
        (col("__sumdl").cast("double") / col("n")).as("avgdl"))
    p.join(broadcast(qTerms), "term")
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid", "term")))
      .crossJoin(broadcast(st))
      .select(col("qid"), col("docid"),
        termMicros(col("tf"), col("dl"), col("df"), col("n"),
          col("avgdl")).as("__micros"))
      .groupBy("qid", "docid")
      .agg(sum("__micros").as("bm25_micros"))
  }

  /** Bounded-heap top-k per qid over [[scoreBatch]] →
    * (qid, rank, docid, bm25_micros). */
  def topKBatch(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queries: Seq[(Long, Seq[String])],
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    Knn.ensureHashAggCapacity(spark, queries.length)
    Knn.topKPerQuery(
        scoreBatch(docs, textCol, idCol, queries)
          .select(col("qid"), col("docid").as("__id"),
            col("bm25_micros").cast("double").as("__score")),
        k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("docid"), col("score").cast("long").as("bm25_micros"))
  }

  /** Batch hybrid — N queries in ONE declarative plan (the reference's
    * workflow surface serves element LISTS; a per-element driver loop
    * runs N full jobs and re-tokenizes the corpus N times):
    *
    *  - the corpus postings pass runs ONCE and is shared by every
    *    query: matching joins a broadcast (qid, term) table, so a
    *    posting matched by m queries fans out m-fold AFTER the shared
    *    exchange, never by re-scanning;
    *  - per-(qid, term) document frequency is a window count over the
    *    matched rows — identical to [[score]]'s df (each (term, docid)
    *    posting appears exactly once per matching qid);
    *  - the semantic half joins candidates to embeddings once and
    *    scores each row against its own query's vector (broadcast
    *    (qid, qvec) table) — Σq |cand(q)| cosine evaluations, never
    *    queries × corpus;
    *  - per-qid min-max bounds ride a broadcast groupBy join (the
    *    batch twin of [[blendMinMax]], same literal math), and the
    *    final top-k is the bounded-heap partial aggregate shared with
    *    [[Knn.searchBatch]] — the shuffle carries per-partition heaps,
    *    not scored candidates.
    *
    * Output (qid, rank, docid, hybrid_micros), rank 1-based, ties on
    * docid ascending — bit-identical per qid to [[hybrid]] over the
    * same corpus. */
  def hybridBatch(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      embeddings: DataFrame,
      embIdCol: String,
      embVecCol: String,
      queries: Seq[(Long, Seq[String], Array[Float])],
      k: Int,
      alpha: Double = 0.5): DataFrame = {
    require(queries.nonEmpty, "bm25: empty query batch")
    val spark = docs.sparkSession
    import spark.implicits._
    // the r2 scale lesson (BASELINE.md): ObjectHashAggregate falls back
    // to sort-based at 128 distinct keys per partition, which would
    // sort-and-spill every scored candidate — raise the threshold to
    // the batch size like Knn.searchBatch does
    Knn.ensureHashAggCapacity(spark, queries.length)
    val lex = scoreBatch(docs, textCol, idCol,
      queries.map { case (qid, terms, _) => (qid, terms) })
    val qVecs = queries.map { case (qid, _, v) => (qid, v.toSeq) }
      .toDF("qid", "__qvec")
      .select(col("qid"), col("__qvec").cast("array<float>").as("__qvec"))
    val emb = embeddings.select(
      col(embIdCol).cast("long").as("docid"), col(embVecCol).as("__v"))
    val cand = lex.join(emb, "docid").join(broadcast(qVecs), "qid")
      .select(col("qid"), col("docid"), col("bm25_micros"),
        graft.Graft.cosineSim(col("__v"), col("__qvec")).as("__cos"))
    val bounds = cand.groupBy("qid").agg(
      min("bm25_micros").as("__bmin"), max("bm25_micros").as("__bmax"),
      min("__cos").as("__cmin"), max("__cos").as("__cmax"))
    val normB = when(col("__bmax") === col("__bmin"), lit(1.0))
      .otherwise((col("bm25_micros") - col("__bmin")).cast("double") /
        (col("__bmax") - col("__bmin")).cast("double"))
    val normC = when(col("__cmax") === col("__cmin"), lit(1.0))
      .otherwise((col("__cos") - col("__cmin")) /
        (col("__cmax") - col("__cmin")))
    val blended = cand.join(broadcast(bounds), "qid")
      .select(col("qid"), col("docid").as("__id"),
        round((lit(alpha) * normC + lit(1.0 - alpha) * normB) *
          lit(1000000.0), 0).as("__score"))
    Knn.topKPerQuery(blended, k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("docid"), col("score").cast("long").as("hybrid_micros"))
  }

  /** Min-max blend over a candidate set `(docid, bm25_micros, __cos)` —
    * the shared tail of [[hybrid]] and [[Bm25Index.hybridSearch]]; both
    * therefore produce bit-identical micros for the same candidates. */
  private[operators] def blendMinMax(
      cand: DataFrame, alpha: Double): DataFrame = {
    val bounds = cand.agg(
      min("bm25_micros").as("__bmin"), max("bm25_micros").as("__bmax"),
      min("__cos").as("__cmin"), max("__cos").as("__cmax"))
    val normB = when(col("__bmax") === col("__bmin"), lit(1.0))
      .otherwise((col("bm25_micros") - col("__bmin")).cast("double") /
        (col("__bmax") - col("__bmin")).cast("double"))
    val normC = when(col("__cmax") === col("__cmin"), lit(1.0))
      .otherwise((col("__cos") - col("__cmin")) /
        (col("__cmax") - col("__cmin")))
    cand.crossJoin(broadcast(bounds))
      .select(col("docid"),
        round((lit(alpha) * normC + lit(1.0 - alpha) * normB) *
          lit(1000000.0), 0).cast("long").as("hybrid_micros"))
  }
}

/** Persisted inverted index: postings stored partitioned by
  * `bucket = pmod(hash(term), nBuckets)` so a keyword query opens ONLY
  * its terms' buckets (Hive partition pruning — same 100 TB storage
  * story as [[graft.index.LshVectorIndex]]), with the corpus stats in a
  * `_stats` sidecar the partition reader ignores.
  *
  * STORAGE IS MANIFEST-PINNED SNAPSHOTS (r17 — [[graft.index
  * .Manifests]], the vector families' discipline brought to the
  * postings lakes): every postings write (build, append, streamed
  * batch, compact, merge) lands whole in a fresh `gen=…` directory
  * and becomes visible only at an atomic manifest commit, so
  * [[compact]] and [[mergeAll]] are safe against CONCURRENT READERS —
  * a query plan resolved before the maintenance reads its pinned
  * snapshot to completion (until r17 compact swapped the live
  * directory out from under in-flight probes; the contract was
  * "maintenance windows only"). Writers stay single-writer per lake.
  * The driver-read sidecars (`_stats`, `_ranges`, `_meta`,
  * `_batches`, `_stats_pending`, `_quiesced`) remain top-level and
  * unversioned: they are resolved at load/maintenance time, never by
  * a pinned scan — a [[Bm25Index]] handle captures (n, Σdl) at load,
  * so a concurrent append moves neither a pinned plan nor a pinned
  * handle's scoring. */
class Bm25Index private (
    val spark: SparkSession,
    val path: String,
    val n: Long,
    val sumdl: Long,
    val nBuckets: Int) extends org.apache.spark.internal.Logging {

  /** Derived exactly as a full rebuild would: one double division over
    * the exact long totals — so build(A)+append(B) scores are
    * bit-identical to build(A∪B). */
  val avgdl: Double = sumdl.toDouble / n

  /** The CURRENT committed snapshot's postings, resolved now and
    * pinned ([[graft.index.Manifests.DefaultRetain]]−1 further
    * maintenance commits of validity — the vector families'
    * reader contract). */
  def postings: DataFrame = {
    val m = graft.index.Manifests.require(spark, path)
    graft.index.Manifests.dataFrame(spark, path, m)
  }

  /** Incremental append — the growing-corpus path (a day's crawl lands
    * without re-tokenizing the existing 100 TB): the new docs' postings
    * append into their term-bucket partitions (existing files
    * untouched; unmatched buckets still never open on read), and the
    * `(n, sumdl)` sidecar merges with exact long addition, so ranking
    * after append is bit-identical to a full rebuild over the union.
    *
    * Caller contract (mirror of [[graft.index.VectorIndex.append]]'s
    * offset-continuing semantics): `idCol` values must be disjoint from
    * the already-indexed corpus — re-appending an indexed doc would
    * double-count its postings, same as the reference family's append
    * (weaviate.py:135-149) which never dedups server-side. The
    * contract is ENFORCED cheaply: every build/append records its
    * docid [min,max] in a `_ranges` sidecar, and an append whose id
    * range intersects a recorded one throws instead of silently
    * corrupting scores (ranges, not exact sets — O(appends) driver
    * memory at any corpus size; disjoint-range batches, the normal
    * ingest pattern, never false-positive). `force = true` skips the
    * guard for callers interleaving id ranges ON PURPOSE — the
    * double-count risk is then theirs. Repeated appends leave one
    * small file per append per bucket; [[compact]] folds them — safe
    * against concurrent readers since r17, so no maintenance window
    * is needed.
    *
    * Appending also invalidates any `keyword_score` registration of
    * this index ([[graft.Keyword.invalidateIndex]]) — the pre-append
    * stats are wrong for the grown corpus, so scoring must re-register
    * the RETURNED index rather than silently using stale n/df. */
  def append(docs: DataFrame, textCol: String, idCol: String,
      force: Boolean = false): Bm25Index = {
    val Array(st) = Bm25.statsRaw(docs, textCol, idCol).collect()
    val (nNew, sumdlNew) = (st.getLong(0), st.getLong(1))
    if (nNew == 0L) return this
    require(!st.isNullAt(2),
      s"bm25 append: every value of id column '$idCol' casts to null")
    val (lo, hi) = (st.getLong(2), st.getLong(3))
    if (!force) Bm25Index.readRanges(spark, path)
      .find { case (l, h) => lo <= h && l <= hi }
      .foreach { case (l, h) => throw new IllegalArgumentException(
        s"bm25 append: id range [$lo,$hi] intersects already-indexed " +
        s"[$l,$h] — re-appending an indexed doc double-counts its " +
        "postings; use force=true only if the overlap is intentional")
      }
    // repartition ON the bucket (r14) — one file per touched bucket
    // per append instead of tasks x buckets slivers (ShingleIndex
    // .appendBatch's note; the batch-sized shuffle is the cheap side).
    // The batch lands whole in a fresh generation and becomes visible
    // at the manifest commit (r17) — an interrupted append leaves the
    // index exactly as before, and the orphan generation is reaped by
    // the next commit.
    writeBatchPostings(docs, textCol, idCol)
    // postings first, stats second: a crash in between leaves the
    // sidecar undercounting (scores slightly conservative), never a
    // stats-without-postings index
    Bm25Index.writeStats(spark, path, n + nNew, sumdl + sumdlNew, nBuckets)
    Bm25Index.appendRange(spark, path, lo, hi)
    graft.Keyword.invalidateIndex(path)
    new Bm25Index(spark, path, n + nNew, sumdl + sumdlNew, nBuckets)
  }

  /** Replay-safe [[append]] for the STREAMING ingest path
    * ([[graft.streaming.IndexStream.ingestKeyword]]) — [[ShingleIndex
    * .appendBatchIfAbsent]]'s contract on the keyword lake:
    *
    *  - the batch's EXACT docid range already claimed in `_ranges` →
    *    a previous attempt owned this batch: the replay VERIFIES the
    *    attempt finished and completes whatever is missing (postings
    *    and/or the stats write — see below) instead of blind-skipping;
    *    a PARTIAL overlap still throws (never a replay);
    *  - otherwise a `_stats_pending/<lo>_<hi>` flag carrying the
    *    (pre, post) stats totals lands first, then the range claim
    *    (claim-before-postings is what makes the replay check sound:
    *    a crash between postings and a trailing claim would let the
    *    replay silently double the postings), then postings, then
    *    stats, then the flag delete.
    *
    * The pending flag closes BOTH residual crash windows of the r14
    * protocol (the advisor's finding): a crash between the postings
    * write and the stats write used to leave `n`/`Σdl` permanently
    * undercounting — the replay hit the exact-claim skip, and
    * [[missingRanges]] could not see it (postings exist for the
    * range). Now a replay that finds the flag still present knows the
    * previous attempt died mid-append and FINISHES it from the
    * replayed batch itself: postings absent → write them; stats still
    * at the flagged pre-totals → commit the flagged post-totals; stats
    * already at the post-totals → only the flag delete was lost.
    * Anything else means out-of-band writes landed between crash and
    * replay (violating the single-writer stream contract) and throws
    * rather than guessing. [[missingRanges]]/[[reconcile]] remain the
    * repair when the stream itself is gone and recovery must come from
    * the source corpus. */
  def appendIfAbsent(
      docs: DataFrame, textCol: String, idCol: String): Bm25Index = {
    val Array(st) = Bm25.statsRaw(docs, textCol, idCol).collect()
    val (nNew, sumdlNew) = (st.getLong(0), st.getLong(1))
    if (nNew == 0L) return this
    require(!st.isNullAt(2),
      s"bm25 append: every value of id column '$idCol' casts to null")
    val (lo, hi) = (st.getLong(2), st.getLong(3))
    val claimed = Bm25Index.readRanges(spark, path)
    if (claimed.contains((lo, hi))) // replay: already ours — finish it
      return finishReplayedAppend(docs, textCol, idCol, lo, hi)
    claimed.find { case (l, h) => lo <= h && l <= hi }
      .foreach { case (l, h) => throw new IllegalArgumentException(
        s"bm25 append: id range [$lo,$hi] intersects already-indexed " +
        s"[$l,$h] — a partial overlap is never a replay")
      }
    Bm25Index.writePendingStats(spark, path, lo, hi,
      n, sumdl, n + nNew, sumdl + sumdlNew)
    Bm25Index.appendRange(spark, path, lo, hi) // claim BEFORE postings
    writeBatchPostings(docs, textCol, idCol)
    Bm25Index.writeStats(spark, path, n + nNew, sumdl + sumdlNew, nBuckets)
    Bm25Index.deletePendingStats(spark, path, lo, hi)
    graft.Keyword.invalidateIndex(path)
    new Bm25Index(spark, path, n + nNew, sumdl + sumdlNew, nBuckets)
  }

  private def writeBatchPostings(
      docs: DataFrame, textCol: String, idCol: String): Unit = {
    val m = graft.index.Manifests.require(spark, path)
    val gen = graft.index.Manifests.genDirName(m.n + 1)
    Bm25.postings(docs, textCol, idCol)
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "term")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, m.book,
      m.parts ++ graft.index.Manifests.listParts(spark, path, gen))
    ()
  }

  /** Complete an [[appendIfAbsent]] whose exact range claim is already
    * recorded: no flag → the previous attempt fully committed (plain
    * replay skip); flag present → finish the interrupted append from
    * the replayed batch (see [[appendIfAbsent]]'s crash-window table).
    * Callers hold a FRESHLY LOADED index (the streaming path loads per
    * batch) so `n`/`sumdl` here reflect the on-disk `_stats`. */
  private def finishReplayedAppend(
      docs: DataFrame, textCol: String, idCol: String,
      lo: Long, hi: Long): Bm25Index =
    Bm25Index.readPendingStats(spark, path, lo, hi) match {
      case None => this
      case Some((nPre, sumdlPre, nPost, sumdlPost)) =>
        if (postings.filter(col("docid").between(lo, hi)).isEmpty)
          writeBatchPostings(docs, textCol, idCol)
        if (n == nPre && sumdl == sumdlPre)
          Bm25Index.writeStats(spark, path, nPost, sumdlPost, nBuckets)
        else if (!(n == nPost && sumdl == sumdlPost))
          throw new IllegalStateException(
            s"bm25 replay of [$lo,$hi]: on-disk stats ($n, $sumdl) match " +
            s"neither the flagged pre-append ($nPre, $sumdlPre) nor " +
            s"post-append ($nPost, $sumdlPost) totals — out-of-band " +
            "writes landed since the crash; reconcile from the source " +
            "corpus instead of replaying")
        Bm25Index.deletePendingStats(spark, path, lo, hi)
        graft.Keyword.invalidateIndex(path)
        new Bm25Index(spark, path, nPost, sumdlPost, nBuckets)
    }

  /** Ranges recorded in `_ranges` with NO postings on disk — the
    * footprint of a crash between [[appendIfAbsent]]'s range claim
    * and its postings write ([[ShingleIndex.missingRanges]]'s check
    * over the keyword lake; one pruned pass, the lake never
    * shuffles). */
  def missingRanges(): Seq[(Long, Long)] = {
    val claimed = Bm25Index.readRanges(spark, path)
    if (claimed.isEmpty) return Seq.empty
    import spark.implicits._
    val ranges = broadcast(claimed.toDF("lo", "hi"))
    val present = ranges.join(postings,
        col("docid").between(col("lo"), col("hi")), "left_semi")
      .select("lo", "hi").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    claimed.filterNot(present)
  }

  /** Settle orphaned `_stats_pending` flags for the OTHER crash
    * window — postings LANDED but the stats write crashed (r16,
    * ADVICE r15: [[missingRanges]] cannot see this window because the
    * range's postings exist, so with the stream gone the flag used to
    * sit orphaned and `n`/`Σdl` undercounted forever). For each flag
    * whose range has postings on disk:
    *
    *  - on-disk stats == the flagged PRE-totals → the stats write
    *    died: commit the flagged post-totals, delete the flag;
    *  - on-disk stats == the flagged POST-totals → only the flag
    *    delete was lost: delete the flag;
    *  - anything else → left in place (out-of-band writes landed
    *    since the crash; corpus-level reconcile or the operator must
    *    adjudicate — guessing at stats arithmetic corrupts scores).
    *
    * Flags whose range has NO postings are left for
    * [[missingRanges]]/[[reconcile]] — that is the claim-only window.
    * Loops to a fixpoint: settling one flag's stats can make the next
    * flag's pre-totals current (chained crashes). */
  def settlePendingStats(): Bm25Index = {
    var cur = this
    var pending = Bm25Index.listPendingStats(spark, path)
    var progress = true
    while (pending.nonEmpty && progress) {
      progress = false
      pending = pending.filter { case (lo, hi) =>
        Bm25Index.readPendingStats(spark, path, lo, hi) match {
          case None => false
          case Some((nPre, sPre, nPost, sPost)) =>
            val landed = !cur.postings
              .filter(col("docid").between(lo, hi)).isEmpty
            if (!landed) true // claim-only window: reconcile's job
            else if (cur.n == nPre && cur.sumdl == sPre) {
              Bm25Index.writeStats(spark, path, nPost, sPost, nBuckets)
              Bm25Index.deletePendingStats(spark, path, lo, hi)
              graft.Keyword.invalidateIndex(path)
              cur = new Bm25Index(spark, path, nPost, sPost, nBuckets)
              progress = true
              false
            } else if (cur.n == nPost && cur.sumdl == sPost) {
              Bm25Index.deletePendingStats(spark, path, lo, hi)
              false
            } else true // ambiguous: never guess
        }
      }
    }
    // SURFACE what could not be settled (r17, ADVICE r16: flags judged
    // ambiguous were silently left in place, so a permanent stats
    // undercount could persist invisibly across repeated reconcile
    // calls) — the operator must learn adjudication is needed instead
    // of discovering it via score drift. Claim-only leftovers are
    // missingRanges/reconcile's job and stay quiet here.
    val ambiguous = cur.ambiguousPendingStats()
    ambiguous.foreach { case (lo, hi, nPre, sPre, nPost, sPost) =>
      cur.logWarning(
        s"bm25 $path: stats-pending flag [$lo,$hi] is AMBIGUOUS — " +
        s"on-disk stats (n=${cur.n}, sumdl=${cur.sumdl}) match neither " +
        s"its pre-totals ($nPre, $sPre) nor its post-totals " +
        s"($nPost, $sPost); out-of-band writes landed since the crash. " +
        "n/sumdl may undercount this range. Adjudicate from the source " +
        "corpus (rebuild stats or delete the flag) — " +
        "ambiguousPendingStats() lists these programmatically.")
    }
    cur
  }

  /** In-flight `_stats_pending` flags [[settlePendingStats]] CANNOT
    * adjudicate (r17): the range's postings are on disk but the
    * current stats match neither the flag's pre- nor post-totals —
    * out-of-band writes landed since the crash, so any arithmetic
    * would be a guess. Each row is (lo, hi, nPre, sumdlPre, nPost,
    * sumdlPost); non-empty means `n`/`Σdl` may undercount and the
    * operator must adjudicate from the source corpus. Settle and
    * reconcile WARN with this list; this surfaces it programmatically
    * (monitoring, a maintenance job's refuse-to-proceed gate). */
  def ambiguousPendingStats(): Seq[(Long, Long, Long, Long, Long, Long)] =
    Bm25Index.listPendingStats(spark, path).flatMap { case (lo, hi) =>
      Bm25Index.readPendingStats(spark, path, lo, hi).collect {
        case (nPre, sPre, nPost, sPost)
          if !(n == nPre && sumdl == sPre) &&
             !(n == nPost && sumdl == sPost) &&
             !postings.filter(col("docid").between(lo, hi)).isEmpty =>
          (lo, hi, nPre, sPre, nPost, sPost)
      }
    }

  /** Repair [[missingRanges]] from a recovery corpus (the streamed
    * batches' source of truth): first settles any orphaned
    * postings-landed `_stats_pending` flags ([[settlePendingStats]] —
    * whose window [[missingRanges]] cannot see), then re-tokenizes
    * ONLY the missing ranges' rows, lands their postings under the
    * already-claimed ranges, and adds their (n, Σdl) to the stats the
    * skipped append never counted. No-op when nothing is missing or
    * flagged. */
  def reconcile(
      recovery: DataFrame, textCol: String, idCol: String): Bm25Index = {
    // settle BEFORE the missing-range repair: settling compares the
    // flags' absolute pre/post totals against the CURRENT stats, and
    // the repair below shifts them
    val settled = settlePendingStats()
    if (settled ne this)
      return settled.reconcile(recovery, textCol, idCol)
    val missing = missingRanges()
    if (missing.isEmpty) return this
    val inRange = missing
      .map { case (lo, hi) => col(idCol).cast("long").between(lo, hi) }
      .reduce(_ || _)
    val docs = recovery.filter(inRange)
    val Array(st) = Bm25.statsRaw(docs, textCol, idCol).collect()
    val (nNew, sumdlNew) = (st.getLong(0), st.getLong(1))
    // through the same generation write as every other postings
    // landing (r17): bucket-repartitioned (the r14 sliver fix),
    // atomically visible at the manifest commit
    writeBatchPostings(docs, textCol, idCol)
    Bm25Index.writeStats(spark, path, n + nNew, sumdl + sumdlNew, nBuckets)
    // postings missing ⇒ the crash preceded the stats write too, so the
    // incremental add above is exact; the repaired ranges' in-flight
    // flags (if any) are now settled
    missing.foreach { case (lo, hi) =>
      Bm25Index.deletePendingStats(spark, path, lo, hi) }
    graft.Keyword.invalidateIndex(path)
    new Bm25Index(spark, path, n + nNew, sumdl + sumdlNew, nBuckets)
  }

  /** `(fileCount, bytes)` of the current snapshot's postings tree —
    * the part a many-shard merge or append cadence fragments
    * ([[graft.index.IvfVectorIndex.storageFootprint]]). */
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
    * rule over the keyword lake — same measured calibration, BASELINE
    * r14). */
  def shouldCompact(
      slack: Double = 16.0,
      targetFileBytes: Long = 256L << 20): Boolean = {
    val (files, bytes) = storageFootprint()
    IndexMerge.needsCompact(files, bytes, nBuckets, slack, targetFileBytes)
  }

  /** Offline maintenance after repeated [[append]]s (each leaves one
    * small file per touched bucket; small files tax listing and lose
    * the term-sorted row-group layout across files): rewrite the
    * whole lake term-sorted into ONE fresh generation and commit —
    * readers pinned to the fragmented snapshot finish undisturbed
    * (r17, [[graft.index.Manifests]]; until then this swapped the
    * live directory and was documented "maintenance windows only").
    * Sidecars never move: they live beside the generations, not
    * inside them — the pre-r17 compact had to copy six of them and a
    * missed one was a latent bug class, now structurally gone. */
  def compact(maxRecordsPerFile: Long = 5000000L): Bm25Index = {
    // settle any interrupted merge first — compacting under a pending
    // marker would fold moved-in generations the roll-forward still
    // expects to commit (ShingleIndex.compact's note)
    Bm25Index.completeMerge(spark, path)
    val m = graft.index.Manifests.require(spark, path)
    val gen = graft.index.Manifests.genDirName(m.n + 1)
    // bucket-repartitioned first — see ShingleIndex.compact (r13)
    graft.index.Manifests.dataFrame(spark, path, m)
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "term")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, m.book,
      graft.index.Manifests.listParts(spark, path, gen))
    new Bm25Index(spark, path, n, sumdl, nBuckets)
  }

  /** Absorb `other` — a shard built with the SAME bucket count over a
    * DISJOINT docid range — by whole-generation directory moves
    * (r17, was per-bucket file moves; [[IndexMerge]]'s shard-parallel
    * build story: terms bucket by the same content hash in every
    * shard, so the merged snapshot is just both part sets). BM25
    * scoring stays exact through the merge by construction: per-term
    * df is computed from the merged postings at query time, and the
    * global (n, Σdl) sum into `_stats` via the crash-safe marker
    * protocol (claim ranges → `_merge_pending` with the post-merge
    * stats → move generations → ONE manifest commit → move `_meta`
    * shard files → rewrite stats → delete source → delete marker;
    * every load rolls an interrupted merge forward). The `_meta`
    * sidecars concatenate at file level too — shards hold disjoint
    * docid ranges, so their docid-sorted meta files keep row-group
    * min/max pruning intact. */
  def merge(other: Bm25Index): Bm25Index = mergeAll(Seq(other))

  /** Multi-way [[merge]] (r15): absorb MANY shards under ONE claims
    * pass, ONE marker, ONE stats write. The pairwise chain pays
    * ~4-5 small metadata Spark jobs per shard (measured ~0.6 s/call:
    * 36 s of pure metadata for a 64-shard merge — BASELINE r15);
    * the 100 TB build merges hundreds of segment shards, so the
    * metadata must amortize. Crash protocol unchanged in shape: all
    * sources' range claims land in one validated append
    * ([[IndexMerge.claimRangesAll]] — partial overlaps between
    * shards throw), the `_merge_pending` marker carries the FULL
    * source list (tab-joined) plus the post-merge stats, then
    * per-source moves + deletes (each idempotent — a re-run skips
    * drained sources), stats rewrite, marker delete; every load
    * rolls an interrupted multi-way merge forward exactly like a
    * pairwise one. */
  def mergeAll(others: Seq[Bm25Index],
      compact: Boolean = false): Bm25Index = {
    if (others.isEmpty) return this
    others.foreach { o => require(o.nBuckets == nBuckets,
      s"bm25 merge: bucket-count mismatch ($nBuckets vs " +
      s"${o.nBuckets}); shards must be built with the same buckets") }
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcs = others.map(_.path)
    graft.operators.IndexMerge.requireDistinctSources(spark, path, srcs)
    IndexMerge.requireQuiesced(spark, path, srcs)
    // a pending marker for a DIFFERENT source set is an older
    // interrupted merge: settle it before starting this one; the SAME
    // set (markers record the OWNED sibling names since r17) means
    // this call is the interrupted merge's re-run — resume with the
    // marker's post-stats. Settling REWRITES `_stats` on disk, so the
    // handle's (n, sumdl) are stale past it — re-read rather than
    // computing the new post-merge totals from stale fields (ADVICE
    // r15: the old marker's contribution was silently dropped from
    // the new totals).
    val ownedSet = srcs.map(IndexMerge.ownedPath).toSet
    var (curN, curSum) = (n, sumdl)
    IndexMerge.readMarker(fs, dst).foreach { case (src, _) =>
      if (IndexMerge.splitSrcs(src).toSet != ownedSet) {
        Bm25Index.completeMerge(spark, path)
        val st = spark.read.parquet(s"$path/_stats").head()
        curN = st.getLong(0); curSum = st.getLong(1)
      }
    }
    // take ownership BEFORE reading any claim (r17 — the rename is
    // the atomic point a restarted source stream can no longer race
    // past; a resume tolerates already-drained sources)
    val resume = IndexMerge.readMarker(fs, dst)
      .exists(m => IndexMerge.splitSrcs(m._1).toSet == ownedSet)
    val owned = IndexMerge.takeOwnership(spark, srcs,
      allowMissing = resume)
    val (postN, postSum) = IndexMerge.readMarker(fs, dst) match {
      case Some((_, stats)) => (stats(0), stats(1))
      case None =>
        try {
          IndexMerge.claimRangesAll(spark, path, owned)
          val s = (curN + others.map(_.n).sum,
            curSum + others.map(_.sumdl).sum)
          IndexMerge.writeMarker(fs, dst, IndexMerge.joinSrcs(owned),
            Seq(s._1, s._2, nBuckets.toLong))
          s
        } catch {
          case e: Throwable => // refused before any move: hand back
            srcs.foreach(s => IndexMerge.releaseOwnership(spark, s))
            throw e
        }
    }
    // runs THIS merge to the end (the marker makes the mainline a
    // roll-forward too, r17 — [[graft.index.Manifests.completeMerge]]
    // shape): move each source's generations whole, ONE manifest
    // commit (the destination's readers see the absorbed shards
    // atomically; pinned readers are undisturbed), move `_meta` shard
    // files, write the post-merge stats, delete sources + marker
    Bm25Index.completeMerge(spark, path)
    val merged = new Bm25Index(spark, path, postN, postSum, nBuckets)
    // opt-in post-step (r16): a hundreds-of-shards merge leaves the
    // lake with per-shard file fragmentation — a measured ~3× probe
    // tax at S=256 (BASELINE r15) until compaction folds it. The flag
    // wires the existing shouldCompact→compact cycle into the merge
    // itself so a big fan-in cannot silently stay in the taxed state.
    if (compact && merged.shouldCompact()) merged.compact() else merged
  }

  /** Docid-sorted metadata sidecar (`path/_meta`): `cols` keyed by
    * docid, range-partitioned and sorted ON docid so a bounded
    * `In(docid)` fetch skips row groups on min/max stats — the same
    * write-time layout lesson as the vector fetch (BASELINE.md finding
    * #4). This is the fetch-side store for index-routed [[facets]]
    * (and any candidates-then-attributes pattern): object attributes
    * come from here, never from a corpus re-scan. Full overwrite —
    * after an [[append]], re-run with the grown corpus (attribute
    * rows are tiny next to postings; an appendable meta store would
    * buy little and lose the global docid sort). */
  def writeMeta(docs: DataFrame, idCol: String, cols: Seq[String])
      : Bm25Index = {
    docs
      .select(col(idCol).cast("long").as("docid") +: cols.map(col): _*)
      .repartitionByRange(col("docid"))
      .sortWithinPartitions("docid")
      .write.mode("overwrite").parquet(s"$path/_meta")
    this
  }

  /** The [[writeMeta]] store (throws if never written). */
  def meta: DataFrame = spark.read.parquet(s"$path/_meta")

  /** Index-routed faceted search — [[Bm25.facets]]' Aggregate-over-
    * search (Weaviate's filtered `Aggregate`, api.http:26-57) without
    * ANY corpus scan:
    *
    *  - candidates: [[scores]] over the bucket-pruned postings (only
    *    the query terms' partitions open);
    *  - facet values: fetched from the docid-sorted [[writeMeta]]
    *    sidecar. Up to `maxFetch` matched docs ride the same bounded
    *    collect + `In(docid)` pushdown as [[hybridSearch]] (row groups
    *    outside the candidate set skip on min/max stats); a LARGER
    *    matched set (stop-word-ish terms) falls back to a distributed
    *    join of the scores against the skinny (docid, facet) sidecar —
    *    still never the corpus, and the shuffle carries ids+facets
    *    only;
    *  - the same facet groupBy as the ad-hoc path, so results are
    *    bit-identical to [[Bm25.facets]] over the indexed corpus.
    *
    * Output (facet, n_docs, sum_micros, max_micros). */
  def facets(queryTerms: Seq[String], facetCol: String,
      maxFetch: Int = 10000): DataFrame = {
    import spark.implicits._
    val sc = scores(queryTerms)
    val matched = sc.limit(maxFetch + 1).collect()
    val facetSide = meta.select(col("docid"), col(facetCol).as("facet"))
    val joined =
      if (matched.length > maxFetch) sc.join(facetSide, "docid")
      else {
        val ids = matched.map(_.getLong(0)).toIndexedSeq
        matched.toIndexedSeq.map(r => (r.getLong(0), r.getLong(1)))
          .toDF("docid", "bm25_micros")
          .join(facetSide.filter(col("docid").isin(ids: _*)), "docid")
      }
    joined
      .groupBy("facet")
      .agg(count(lit(1)).as("n_docs"),
        sum("bm25_micros").as("sum_micros"),
        max("bm25_micros").as("max_micros"))
  }

  /** Partition-pruned BM25 scores for EVERY matching document (no
    * top-k) — the candidate source for [[hybridSearch]]. df is computed
    * from the pruned postings themselves (exact: every posting of a
    * matched term lives in the matched bucket). */
  def scores(queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val buckets = terms.map(t => Bm25Index.bucketOf(t, nBuckets)).distinct
    val matched = postings
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
    val dfs = matched.groupBy("term").agg(count(lit(1)).as("df"))
    matched
      .join(broadcast(dfs), "term")
      .select(col("docid"),
        Bm25.termMicros(col("tf"), col("dl"), col("df"), lit(n),
          lit(avgdl)).as("__micros"))
      .groupBy("docid")
      .agg(sum("__micros").as("bm25_micros"))
  }

  /** Per-term document frequencies, reading ONLY the query terms'
    * bucket partitions (exact: every posting of a term lives in its
    * hashed bucket) — the stats source behind index-registered
    * `keyword_score` ([[graft.Keyword.registerIndex]]); terms absent
    * from the corpus are absent from the map. */
  def dfOf(queryTerms: Seq[String]): Map[String, Long] = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val buckets = terms.map(t => Bm25Index.bucketOf(t, nBuckets)).distinct
    postings
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Partition-pruned BM25 top-k over [[scores]]. */
  def search(queryTerms: Seq[String], k: Int): DataFrame =
    scores(queryTerms)
      .orderBy(desc("bm25_micros"), col("docid").asc)
      .limit(k)

  /** Batch form of [[hybridSearch]] — the last cell of the
    * (single/batch) × (ad-hoc/indexed) matrix: N hybrid queries where
    * BOTH halves read index storage and the postings open ONCE for the
    * whole batch.
    *
    *  - one partition-pruned postings read covers the UNION of every
    *    query's term buckets; per-term df comes from those pruned
    *    postings (qid-independent, exact — same stats as [[scores]]);
    *  - per-qid candidate selection is the bounded-heap top-`candidates`
    *    (ties on docid ascending — the same order [[search]] produces),
    *    collected once as a bounded boundary set (≤ queries ×
    *    candidates rows);
    *  - the union of candidate ids fetches vectors in ONE In(docid)
    *    scan (row groups outside the id set skip on min/max stats —
    *    the sorted-write layout);
    *  - per-qid min-max blend (literal-identical math to
    *    [[Bm25.blendMinMax]]) and bounded-heap top-k finish the job.
    *
    * Output (qid, rank, docid, hybrid_micros); per-qid results are
    * bit-identical to [[hybridSearch]] with that query's terms/vector. */
  def hybridSearchBatch(
      vectors: DataFrame,
      vecIdCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[String], Array[Float])],
      k: Int,
      alpha: Double = 0.5,
      candidates: Int = 50): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty, "bm25: empty query batch")
    Knn.ensureHashAggCapacity(spark, queries.length)
    val qt = queries.flatMap { case (qid, ts, _) =>
      val t = ts.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
      require(t.nonEmpty, s"bm25: empty query $qid")
      t.map(term => (qid, term))
    }
    val terms = qt.map(_._2).distinct
    val buckets = terms.map(t => Bm25Index.bucketOf(t, nBuckets)).distinct
    val matched = postings
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
    val dfs = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val perTerm = matched
      .join(broadcast(dfs), "term")
      .select(col("term"), col("docid"),
        Bm25.termMicros(col("tf"), col("dl"), col("df"), lit(n),
          lit(avgdl)).as("__micros"))
    val lex = perTerm
      .join(broadcast(qt.toDF("qid", "term")), "term")
      .groupBy("qid", "docid")
      .agg(sum("__micros").as("bm25_micros"))
    val candRows = Knn.topKPerQuery(
        lex.select(col("qid"), col("docid").as("__id"),
          col("bm25_micros").cast("double").as("__score")),
        candidates)
      .select(col("qid"), col("id").as("docid"),
        col("score").cast("long").as("bm25_micros"))
      .collect()
    if (candRows.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("qid", "rank", "docid", "hybrid_micros")
    val cand = candRows.toIndexedSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toDF("qid", "docid", "bm25_micros")
    val ids = candRows.map(_.getLong(1)).distinct.toIndexedSeq
    val fetched = vectors
      .select(col(vecIdCol).cast("long").as("docid"), col(vecCol).as("__v"))
      .filter(col("docid").isin(ids: _*))
    val qVecs = queries.map { case (qid, _, v) => (qid, v.toSeq) }
      .toDF("qid", "__qvec")
      .select(col("qid"), col("__qvec").cast("array<float>").as("__qvec"))
    val scored = cand.join(fetched, "docid").join(broadcast(qVecs), "qid")
      .select(col("qid"), col("docid"), col("bm25_micros"),
        graft.Graft.cosineSim(col("__v"), col("__qvec")).as("__cos"))
    val bounds = scored.groupBy("qid").agg(
      min("bm25_micros").as("__bmin"), max("bm25_micros").as("__bmax"),
      min("__cos").as("__cmin"), max("__cos").as("__cmax"))
    val normB = when(col("__bmax") === col("__bmin"), lit(1.0))
      .otherwise((col("bm25_micros") - col("__bmin")).cast("double") /
        (col("__bmax") - col("__bmin")).cast("double"))
    val normC = when(col("__cmax") === col("__cmin"), lit(1.0))
      .otherwise((col("__cos") - col("__cmin")) /
        (col("__cmax") - col("__cmin")))
    val blended = scored.join(broadcast(bounds), "qid")
      .select(col("qid"), col("docid").as("__id"),
        round((lit(alpha) * normC + lit(1.0 - alpha) * normB) *
          lit(1000000.0), 0).as("__score"))
    Knn.topKPerQuery(blended, k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id").as("docid"), col("score").cast("long").as("hybrid_micros"))
  }

  /** Index-routed hybrid — txtai `hybrid: true` shaped for 100 TB:
    * BOTH halves read index storage, neither scans a full table.
    *
    *  - lexical: top-`candidates` from the bucket-pruned postings (only
    *    the query terms' partitions open — same read path as [[search]]);
    *  - semantic: the candidate ids (a bounded boundary set, collected
    *    once like [[graft.index.IvfVectorIndex.searchAdc]]'s shortlist)
    *    fetch their vectors from `vectors` — e.g. an IVF index's `df` —
    *    via an `In` predicate the parquet scan pushes down (row groups
    *    outside the id set are skipped by min/max stats), never a
    *    full-corpus embedding scan;
    *  - blend: exact cosine + the SAME min-max blend as [[Bm25.hybrid]]
    *    ([[Bm25.blendMinMax]]), so scores are bit-identical to the
    *    ad-hoc hybrid restricted to the same candidate set — which is
    *    what keeps the result SQL-oracle-derivable.
    *
    * The lexical candidates replay as a ≤`candidates`-row local
    * relation in the final plan (the postings lineage runs exactly
    * once, at the collect). */
  def hybridSearch(
      vectors: DataFrame,
      vecIdCol: String,
      vecCol: String,
      queryTerms: Seq[String],
      queryVec: Array[Float],
      k: Int,
      alpha: Double = 0.5,
      candidates: Int = 50): DataFrame = {
    import spark.implicits._
    val lexRows = search(queryTerms, candidates).collect()
    if (lexRows.isEmpty)
      return Seq.empty[(Long, Long)].toDF("docid", "hybrid_micros")
    val lex = lexRows.toIndexedSeq
      .map(r => (r.getLong(0), r.getLong(1))).toDF("docid", "bm25_micros")
    val ids = lexRows.map(_.getLong(0)).toIndexedSeq
    val fetched = vectors
      .select(col(vecIdCol).cast("long").as("docid"), col(vecCol).as("__v"))
      .filter(col("docid").isin(ids: _*))
    val cand = lex.join(fetched, "docid")
      .select(col("docid"), col("bm25_micros"),
        graft.Graft.cosineSim(col("__v"), typedlit(queryVec)).as("__cos"))
    Bm25.blendMinMax(cand, alpha)
      .orderBy(desc("hybrid_micros"), col("docid").asc)
      .limit(k)
  }
}

object Bm25Index {

  /** Engine-side twin of the storage bucketing: Spark's `hash` (Murmur3
    * seed 42) mod nBuckets, computed driver-side for pruning. */
  private[operators] def bucketOf(term: String, nBuckets: Int): Int = {
    val bytes = term.getBytes("UTF-8")
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42)
    ((h % nBuckets) + nBuckets) % nBuckets
  }

  /** Sentinel default for [[build]]'s `nBuckets`: derive the bucket
    * count from the corpus itself via [[autoBuckets]]. */
  val AutoBuckets: Int = 0

  /** Bucket count from postings volume — BASELINE.md's bucket-count
    * probe found the sweet spot SCALES with corpus size (64 buckets win
    * at 100k docs ≈ 5.4M tokens, 256 at 5M docs ≈ 270M tokens: listing
    * overhead dominates small corpora, per-bucket data volume dominates
    * large ones). Both measured optima sit on `cbrt(tokens / 20)`
    * rounded to the nearest power of two (5.4M → 64, 270M → 256;
    * cube-root growth keeps BOTH the bucket count and the per-bucket
    * bytes growing as the corpus grows, splitting the overhead), so
    * that is the recorded rule, clamped to [16, 4096]. Power of two
    * only for layout familiarity — the pmod hash needs no alignment. */
  def autoBuckets(totalTokens: Long): Int = {
    val target = math.cbrt(math.max(1L, totalTokens) / 20.0)
    val pow2 =
      math.pow(2.0, math.round(math.log(target) / math.log(2.0)).toDouble)
    math.min(4096, math.max(16, pow2.toInt))
  }

  /** `(n, sumdl, n_buckets)` sidecar — sumdl kept as a LONG so append
    * merges are exact (see [[Bm25Index.append]]). */
  private def writeStats(spark: SparkSession, path: String,
      n: Long, sumdl: Long, nBuckets: Int): Unit = {
    import spark.implicits._
    Seq((n, sumdl, nBuckets))
      .toDF("n", "sumdl", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_stats")
  }

  /** `_ranges` sidecar: one (lo, hi) docid interval per build/append —
    * the [[Bm25Index.append]] overlap guard's memory. Tiny (O(appends)
    * rows), read driver-side only. */
  private[operators] def readRanges(spark: SparkSession, path: String)
      : Seq[(Long, Long)] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_ranges")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty // pre-guard index: unknowable
    spark.read.parquet(dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toIndexedSeq
  }

  private[operators] def appendRange(spark: SparkSession, path: String,
      lo: Long, hi: Long): Unit =
    appendRanges(spark, path, Seq((lo, hi)))

  /** Batch form of [[appendRange]] — one parquet append regardless of
    * how many claims land (the multi-way merge's one-write claims). */
  private[operators] def appendRanges(spark: SparkSession, path: String,
      ranges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    ranges.toDF("lo", "hi")
      .coalesce(1).write.mode("append").parquet(s"$path/_ranges")
  }

  private def pendingStatsPath(path: String, lo: Long, hi: Long) =
    new org.apache.hadoop.fs.Path(path, s"_stats_pending/r_${lo}_$hi")

  /** `_stats_pending/<range>` flag — [[Bm25Index.appendIfAbsent]]'s
    * in-flight marker, written BEFORE the range claim and deleted
    * after the stats commit. Carries (nPre, sumdlPre, nPost,
    * sumdlPost) so a replay can tell "stats not yet applied" from
    * "only the flag delete was lost". Single small create, terminated
    * like [[IndexMerge.writeMarker]]. */
  private[operators] def writePendingStats(
      spark: SparkSession, path: String, lo: Long, hi: Long,
      nPre: Long, sumdlPre: Long, nPost: Long, sumdlPost: Long): Unit = {
    val p = pendingStatsPath(path, lo, hi)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$nPre\n$sumdlPre\n$nPost\n$sumdlPost\nend\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read an in-flight append flag: (nPre, sumdlPre, nPost,
    * sumdlPost), or None when absent. A torn flag cannot coexist with
    * the range claim (the flag write strictly precedes the claim and
    * nothing rewrites it), so a parse failure here means out-of-band
    * tampering — throw rather than guess at stats arithmetic. */
  private[operators] def readPendingStats(
      spark: SparkSession, path: String, lo: Long, hi: Long)
      : Option[(Long, Long, Long, Long)] = {
    val p = pendingStatsPath(path, lo, hi)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    val lines = raw.split("\n").filter(_.nonEmpty)
    require(lines.length == 5 && lines(4) == "end",
      s"bm25: malformed stats-pending flag at $p — refusing to guess; " +
      "remove it and reconcile from the source corpus")
    Some((lines(0).toLong, lines(1).toLong, lines(2).toLong,
      lines(3).toLong))
  }

  /** All in-flight append flags under `_stats_pending/` — the
    * load-time sweep's inventory (one directory listing; names carry
    * the range, `r_<lo>_<hi>`). */
  private[operators] def listPendingStats(
      spark: SparkSession, path: String): Seq[(Long, Long)] = {
    val dir = new org.apache.hadoop.fs.Path(path, "_stats_pending")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case name if name.startsWith("r_") =>
        val parts = name.stripPrefix("r_").split('_')
        require(parts.length == 2,
          s"bm25: unparseable stats-pending flag name $name at $dir")
        (parts(0).toLong, parts(1).toLong)
      }
  }

  private[operators] def deletePendingStats(
      spark: SparkSession, path: String, lo: Long, hi: Long): Unit = {
    val p = pendingStatsPath(path, lo, hi)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    ()
  }

  def build(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      path: String,
      nBuckets: Int = AutoBuckets): Bm25Index = {
    val spark = docs.sparkSession
    // stats first: an empty corpus must fail loudly BEFORE the postings
    // write mutates the target path (n=0 would also make avgdl NULL and
    // surface later as an opaque NPE)
    val Array(st) = Bm25.statsRaw(docs, textCol, idCol).collect()
    require(st.getLong(0) > 0, s"bm25: empty corpus, refusing to build $path")
    require(!st.isNullAt(2),
      s"bm25: every value of id column '$idCol' casts to null")
    val nb = if (nBuckets == AutoBuckets) autoBuckets(st.getLong(1))
      else nBuckets
    // term-sorted files: row-group min/max stats on term then carve the
    // bucket into disjoint term ranges, so a query's term filter prunes
    // row groups INSIDE its matched buckets too (partition pruning
    // picks the buckets; the sort makes the within-bucket read
    // proportional to the matched posting lists). The write is
    // bucket-repartitioned (r14): without it every task writes a
    // sliver into every bucket dir — tasks x buckets files, which at
    // cluster scale (1e5 tasks x 4096 buckets) is a catastrophic file
    // count. One postings shuffle buys whole-bucket term-sorted files;
    // the bucket count scales cube-root with the corpus, so write
    // parallelism scales too.
    // a rebuild over an existing path replaces the index whole
    // (pre-r17 behavior via mode=overwrite; now an explicit reset so
    // the manifest store restarts at generation 1)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    val gen = graft.index.Manifests.genDirName(1L)
    Bm25.postings(docs, textCol, idCol)
      .withColumn("bucket", pmod(hash(col("term")), lit(nb)))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "term")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$gen")
    graft.index.Manifests.commit(spark, path, None,
      graft.index.Manifests.listParts(spark, path, gen))
    writeStats(spark, path, st.getLong(0), st.getLong(1), nb)
    // fresh build: reset the range log to exactly this corpus's interval
    appendRange(spark, path, st.getLong(2), st.getLong(3))
    new Bm25Index(spark, path, st.getLong(0), st.getLong(1), nb)
  }

  /** Roll an interrupted [[Bm25Index.merge]]/[[Bm25Index.mergeAll]]
    * forward — called by every [[load]] (and by `mergeAll` itself,
    * where the just-written marker makes the mainline merge a
    * roll-forward too). [[graft.index.Manifests.completeMerge]]'s
    * shape plus the lake's own two steps (`_meta` shard-file moves
    * and the post-merge stats rewrite the marker carries); every step
    * is idempotent from any crash point: generation moves skip
    * already-moved dirs, the manifest commit dedups part lines,
    * `_meta` moves skip moved files, drained sources skip, and the
    * stats write repeats the same totals. */
  private[operators] def completeMerge(
      spark: SparkSession, path: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    IndexMerge.readMarker(fs, dst).foreach { case (src, stats) =>
      val srcs = IndexMerge.splitSrcs(src)
      val m = graft.index.Manifests.require(spark, path)
      val moved = srcs.flatMap { s =>
        // a source is movable while its manifest store survives; a
        // tree already drained (or torn by a crashed delete) is
        // finished by the delete below
        if (graft.index.Manifests.current(spark, s).isDefined)
          graft.index.Manifests.moveGenerations(spark, s, path)
        else Vector.empty
      }
      if (moved.nonEmpty)
        graft.index.Manifests.commit(spark, path, m.book, m.parts ++ moved)
      srcs.foreach { sp =>
        val srcP = new org.apache.hadoop.fs.Path(sp)
        IndexMerge.moveFlatFiles(fs,
          new org.apache.hadoop.fs.Path(srcP, "_meta"),
          new org.apache.hadoop.fs.Path(dst, "_meta"))
        fs.delete(srcP, true)
      }
      writeStats(spark, path, stats(0), stats(1), stats(2).toInt)
      IndexMerge.deleteMarker(fs, dst)
      graft.Keyword.invalidateIndex(path) // stats changed under the path
    }
  }

  def load(spark: SparkSession, path: String): Bm25Index = {
    completeMerge(spark, path) // mid-merge crash roll-forward
    // one-row sidecar: driver-direct read (no Spark job per load —
    // the index-routed query family constructs an index per query,
    // r17 optimization round). Re-read every call, never cached.
    val st = graft.index.DriverParquet.groups(spark, s"$path/_stats").head
    new Bm25Index(spark, path, st.getLong("n", 0), st.getLong("sumdl", 0),
      st.getInteger("n_buckets", 0))
  }
}
