package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The merge/stream drain handshake (r16). The shard-merge surfaces
  * ([[graft.operators.Bm25Index.mergeAll]] and its four siblings)
  * DELETE every drained source tree; a source whose ingest stream is
  * still live could be mid-append when its files are renamed away.
  * Until r16 only convention prevented that race (every caller
  * stopped its streams first) — this marker makes the contract
  * checkable:
  *
  *  - [[mark]] after stopping a lake's stream declares "no writer is
  *    live here"; [[graft.operators.IndexMerge.requireQuiesced]]
  *    refuses to merge a stream-fed lake (one with a `_batches`
  *    delivery ledger) that is not marked;
  *  - every streaming delivery calls [[clear]] at batch ENTRY —
  *    before any effect lands — so a RESTARTED stream un-quiesces its
  *    lake first and a concurrent merge refuses instead of racing.
  *
  * The marker is a zero-byte file: its existence is the statement,
  * creation/deletion are single atomic namenode ops, and a crash
  * between a stream stop and [[mark]] merely leaves the lake
  * conservatively unmergeable (re-mark to proceed). */
object Quiesce {

  /** Marker file name, directly under the lake/index root. */
  val Marker = "_quiesced"

  /** Declare the lake at `path` writer-free (call AFTER stopping its
    * ingest stream — [[IndexStream.stopAndQuiesce]] bundles both). */
  def mark(spark: SparkSession, path: String): Unit = {
    val p = new Path(path, Marker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) { fs.create(p, true).close() }
  }

  /** Withdraw the declaration — the first thing every streaming batch
    * delivery does, so the marker can never coexist with a live
    * writer's effects. Idempotent. */
  def clear(spark: SparkSession, path: String): Unit = {
    val p = new Path(path, Marker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    ()
  }

  def isMarked(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, Marker)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
