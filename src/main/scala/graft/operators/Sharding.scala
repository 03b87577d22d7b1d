package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-export sharding — the pipeline's last mile: after clean /
  * dedup / gate / mix / pack, the corpus ships as S shard files in a
  * DETERMINISTIC pseudo-random order (every public training stack
  * consumes exactly this shape: Megatron/GPT-NeoX data shards, the
  * "global shuffle then shard" step of T5/PaLM data builds). Both the
  * shard id and the within-shard order are pure functions of the row
  * id through the repo's portable mix ([[Sampling.portableMix]] — the
  * content-addressed discipline of `withSplit`), so a re-run, another
  * engine, or a resumed job reproduces byte-identical shards, and the
  * training order is auditable instead of an RNG accident.
  *
  * Shape at 100 TB: assignment is a pure map; the export is ONE
  * shuffle (`repartition(S, shard)` + `sortWithinPartitions(order)` —
  * Spark's shuffle-sort does the ordering for free in the exchange);
  * the manifest is one groupBy(shard) aggregate whose `min_by` picks
  * each shard's first document without a window. Nothing driver-side,
  * no skew risk beyond the mix's uniformity (spec-checked balance). */
object Sharding {

  /** Add `shard` ∈ [0, shards) and `train_order` (the within-shard
    * sort key) — both content-addressed from the id. */
  def withShard(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val ord = Sampling.portableMix(col(idCol))
    df.withColumn("train_order", ord)
      .withColumn("shard", pmod(col("train_order"), lit(shards.toLong)))
  }

  /** The export layout: every shard's rows land in ONE task
    * (repartition on the shard key), contiguous and in training order
    * within it (shard-major sortWithinPartitions — Spark's hash
    * partitioner may co-locate two shard values in one task, so the
    * shard prefix keeps them contiguous rather than interleaved).
    * `.write.partitionBy("shard")` on this frame emits one sorted
    * file per shard. */
  def exportOrdered(df: DataFrame, idCol: String, shards: Int): DataFrame =
    withShard(df, idCol, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "train_order", idCol)

  /** Per-shard manifest: (shard, n_docs, n_tokens, first_doc) —
    * the auditable summary the export writes next to the shards
    * (first_doc = the document a reader must see first, ties on the
    * mix value broken by id). */
  def manifest(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shards: Int): DataFrame =
    withShard(docs, idCol, shards)
      .select(col("shard"), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("__n"),
        col("train_order"))
      .groupBy("shard")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("__n").cast("long").as("n_tokens"),
        min_by(col(idCol), struct(col("train_order"), col(idCol)))
          .as("first_doc"))
}
