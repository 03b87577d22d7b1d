package graft.streaming

import org.apache.spark.sql.SparkSession

/** The delivered-micro-batch ledger shared by the streaming sinks: a
  * tiny `_batches` parquet sidecar (one row per committed batch) next
  * to the target store. Structured Streaming's foreachBatch is
  * at-least-once — the window is a crash AFTER the batch's effects
  * landed but BEFORE the checkpoint commit, which replays the same
  * batchId on restart. Recording the id as the LAST step of the batch
  * and skipping already-recorded ids on entry closes exactly that
  * window; a crash in the middle of a batch's effects still needs the
  * sink's own story (range guards + reconcile for [[IngestStream]],
  * uid upsert or compact-time dedup for [[IndexStream]]).
  *
  * Keys are (streamId, batchId) — batch ids restart from 0 for every
  * new checkpoint, so a bare-batchId ledger would silently swallow the
  * first batches of a NEW stream writing into the same store. The
  * stream id is the checkpoint location by convention: unique per
  * logical stream, stable across restarts (which is exactly the
  * replay identity Structured Streaming's own commit log uses). */
object BatchLedger {

  /** Batch ids of `streamId` whose delivery fully committed (read
    * driver-side at batch start; O(#batches) rows). */
  def delivered(spark: SparkSession, storePath: String,
      streamId: String): Set[Long] = {
    val dir = new org.apache.hadoop.fs.Path(s"$storePath/_batches")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Set.empty
    spark.read.parquet(dir.toString)
      .where(org.apache.spark.sql.functions.col("stream_id") === streamId)
      .collect().map(_.getAs[Long]("batch_id")).toSet
  }

  /** Record a batch as fully delivered (the batch's LAST step). */
  def record(spark: SparkSession, storePath: String, streamId: String,
      batchId: Long): Unit = {
    import spark.implicits._
    Seq((streamId, batchId)).toDF("stream_id", "batch_id")
      .coalesce(1).write.mode("append").parquet(s"$storePath/_batches")
  }
}
