package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{ShingleIndex, SimHash}

/** Continuous crawl ingest with BOTH dedup tiers — the end-to-end
  * composition of the pieces the batch path already proves:
  *
  *  - tier 1, on the stream itself: the exact-fingerprint gate
  *    ([[graft.operators.SimHash.filterAgainstExact]]) against the
  *    static base corpus — a stream-static left-anti equi-join, no
  *    state, append-mode legal, so exact and token-reshuffled dups of
  *    the base never even reach a micro-batch;
  *  - tier 2, per micro-batch (`foreachBatch`): near-dup survivors
  *    against the GROWING persisted lake
  *    ([[graft.operators.ShingleIndex.ingest]]) — each batch probes
  *    the stored inverted shingle index, keeps min-id representatives
  *    within itself, appends its accepted rows to the lake store, and
  *    indexes their shingles so the NEXT micro-batch dedups against
  *    them. The lake corpus is never re-shingled.
  *
  * Streamed == batch (spec-enforced): the accepted set equals folding
  * the same micro-batches through `filterAgainstExact` + `ingest`
  * sequentially.
  *
  * Delivery semantics: the sink appends, so this path is
  * at-least-once; a RETRIED micro-batch is surfaced loudly by the
  * index's `_ranges` id-overlap guard (the retry tries to re-append
  * already-indexed ids) instead of silently double-ingesting — a
  * production deployment records delivered batch ids next to the
  * store and skips them before calling [[ShingleIndex.ingest]]. */
object IngestStream {

  /** Start the two-tier ingest query. `indexPath` must hold an
    * already-built [[ShingleIndex]] over `base` (the one-time lake
    * build); accepted rows land in `outPath` as appended parquet. */
  def ingestQuery(
      stream: DataFrame,
      base: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      outPath: String,
      threshold: Double,
      checkpoint: String): StreamingQuery = {
    val spark = stream.sparkSession
    val gated = SimHash.filterAgainstExact(base, stream, idCol, textCol)
    gated.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // reload per batch: cheap (one sidecar row) and always
        // consistent with the appends earlier batches made
        val idx = ShingleIndex.load(spark, indexPath)
        val (surv, _) = idx.ingest(batch, idCol, textCol, threshold)
        surv.write.mode("append").parquet(outPath)
        ()
      }
      .start()
  }

  /** The batch twin of one micro-batch step, for parity checks and
    * backfills: gate against the base, ingest against the lake index. */
  def ingestBatch(
      batch: DataFrame,
      base: DataFrame,
      idCol: String,
      textCol: String,
      idx: ShingleIndex,
      threshold: Double): (DataFrame, ShingleIndex) = {
    val gated = SimHash.filterAgainstExact(base, batch, idCol, textCol)
    idx.ingest(gated, idCol, textCol, threshold)
  }
}
