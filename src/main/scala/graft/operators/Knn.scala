package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Exact k-nearest-neighbor search over an `array<float>` column.
  *
  * Replaces the reference's delegated ANN path (weaviate.py:175-201:
  * GraphQL `nearVector` + `with_limit` against a Weaviate HNSW server)
  * with Spark-native plans:
  *
  *  - single query: codegen'd score + `orderBy(desc).limit(k)` — Catalyst
  *    lowers this to `TakeOrderedAndProject` (per-partition bounded heap,
  *    no global sort; only numPartitions*k rows reach the driver side of
  *    the final ordering). This is the right 100 TB plan: one scan, no
  *    wide shuffle.
  *  - query batch: broadcast the (small) query set against the (huge)
  *    document side, score in codegen, then `topk_by_score` — a
  *    TypedImperativeAggregate bounded heap with map-side partial
  *    aggregation, so the shuffle carries ≤ numPartitions*k rows per
  *    query instead of every scored pair (a window row_number would sort
  *    ALL pairs). Fixes the reference's single-query limitation
  *    (weaviate.py:177 serves only queries[0]).
  *
  * Scores are txtai cosine *similarity* (higher = closer), i.e. the
  * reference's `1 - cosine_distance` normalization (weaviate.py:17-20)
  * already applied. Ties break on ascending id for determinism.
  */
object Knn {

  /** Top-k rows most similar to `queryVec`; appends a `score` column. */
  def search(
      index: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Array[Float],
      k: Int): DataFrame = {
    val scored = index.withColumn(
      "score", Graft.cosineSim(col(vecCol), typedlit(queryVec)))
    scored.orderBy(desc("score"), col(idCol).asc).limit(k)
  }

  /** Batch kNN: for every row of `queries` (small side — broadcast),
    * the top-k ids of `index` by cosine similarity.
    * Output: (qid, rank starting at 1, id, score). */
  /** ObjectHashAggregate falls back to SORT-based aggregation once a
    * partition's hash map passes `fallbackThreshold` DISTINCT KEYS
    * (default 128). Every partition sees every qid in a batch search,
    * so a batch of >128 queries would sort-and-spill the entire scored
    * cross product (measured: 1000 queries x 10M vectors tried to
    * spill ~240 GB and died; the heaps themselves are k x 16 bytes per
    * query — trivial).
    *
    * The raise is scoped to need, not a blanket 65536: batches that fit
    * the session's current threshold leave the conf UNTOUCHED (no
    * hidden memory-behavior change for other object-hash aggregates),
    * and larger batches raise it only to the next power of two >= 2x
    * the batch (capped at 64K — beyond that, chunk the query side).
    * The conf must hold at ACTION time (execution reads it), so a
    * save/restore around this lazy plan-build would be a no-op; opt out
    * entirely with spark.graft.knn.autoRaiseHashAggThreshold=false. */
  private[operators] def ensureHashAggCapacity(
      spark: SparkSession, nQueries: Long): Unit = {
    if (!spark.conf.get("spark.graft.knn.autoRaiseHashAggThreshold", "true")
          .toBoolean) return
    val fallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val cur = spark.conf.getOption(fallbackKey).map(_.toInt).getOrElse(128)
    if (nQueries <= cur) return
    var needed = 256
    while (needed < nQueries * 2 && needed < 65536) needed <<= 1
    if (needed > cur) spark.conf.set(fallbackKey, needed.toString)
  }

  /** Hard cap on the driver-materialized query side of the batch-search
    * family (here, [[graft.operators.Ivf.searchBatch]],
    * [[graft.operators.Pq.searchBatch]]). The batch contract broadcasts
    * the query set from the driver; past this bound that contract is
    * being misused, and the guard turns a silent driver OOM into an
    * error message naming the fix. */
  val MaxBatchQueries: Int = 65536

  /** Collect a query side that is "small by contract" WITHOUT letting a
    * contract violation materialize an unbounded set: the plan is capped
    * at `max + 1` rows before collect (so the driver holds at most that
    * many), and the guard fires if the cap was reached. Within the
    * bound, identical to a plain collect(). */
  private[operators] def collectBoundedQueries(
      qSel: DataFrame, what: String,
      max: Int = MaxBatchQueries): Array[org.apache.spark.sql.Row] = {
    val rows = qSel.limit(max + 1).collect()
    require(rows.length <= max,
      s"$what: query side exceeds the $max-row batch contract — the " +
        "batch form broadcasts the query set from the driver; chunk " +
        "the query set, or treat the larger side as the corpus")
    rows
  }

  /** Bounded-heap top-k per qid over (qid, __id, __score) rows →
    * (qid, rank, id, score). The shuffle carries only per-partition
    * heaps (partial topk_by_score), never the scored pairs. */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("qid")
      .agg(Graft.topKByScore(col("__score"), col("__id"), k).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(
        col("qid"),
        (col("pos") + 1).as("rank"),
        col("hit.id").as("id"),
        col("hit.score").as("score"))

  def searchBatch(
      index: DataFrame,
      vecCol: String,
      idCol: String,
      queries: DataFrame,
      qVecCol: String,
      qidCol: String,
      k: Int): DataFrame = {
    val spark = index.sparkSession
    Graft.init(spark)
    // packed-layout dispatch: if the index stores fixed-width binary
    // vectors, pack the (small) query side too and use the packed kernel
    val packed = index.schema(vecCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    val qvec =
      if (packed && queries.schema(qVecCol).dataType !=
        org.apache.spark.sql.types.BinaryType)
        Graft.packVector(col(qVecCol))
      else col(qVecCol)
    // the query side is small by contract: collect it ONCE — the row
    // count sizes the hash-agg threshold and the rows become a local
    // relation, so the (possibly expensive) query lineage is never
    // executed a second time by a separate count() job or the broadcast
    val qSel = queries.select(col(qidCol).as("qid"), qvec.as("__qvec"))
    val qRows = collectBoundedQueries(qSel, "knn searchBatch")
    ensureHashAggCapacity(spark, qRows.length)
    val q = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qSel.schema))
    val score =
      if (packed) Graft.cosineSimPacked(col(vecCol), col("__qvec"))
      else Graft.cosineSim(col(vecCol), col("__qvec"))
    val scored = index
      .crossJoin(q)
      .select(
        col("qid"),
        col(idCol).cast("long").as("__id"),
        score.as("__score"))
    topKPerQuery(scored, k)
  }

  /** Brute-force similarity of a query against an ephemeral corpus —
    * txtai `Embeddings.similarity` (01_simple.ipynb cell 7): same kernel
    * as search, no index. */
  def similarity(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Array[Float]): DataFrame =
    corpus
      .withColumn("score", Graft.cosineSim(col(vecCol), typedlit(queryVec)))
      .orderBy(desc("score"), col(idCol).asc)
}
