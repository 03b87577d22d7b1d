package graft.index

import org.apache.spark.sql.SparkSession

/** Crash-safe directory-generation swap, used by the POSTINGS lakes
  * ([[graft.operators.Bm25Index]] and its two siblings) for compact.
  * The vector indexes moved OFF this protocol in r17 — their storage
  * is manifest-pinned snapshots ([[Manifests]]), which besides crash
  * safety also gives concurrent-reader isolation (a swap rename
  * breaks a reader's resolved file paths even when both generations
  * survive; the lakes therefore keep the documented
  * maintenance-window contract for compact, the natural next
  * candidate for the manifest treatment). A maintenance rewrite
  * lands whole in a `<path>.compact` sibling and replaces the live
  * directory via TWO renames with the old generation retained —
  * never delete-then-rename, whose crash window leaves NO readable
  * index on disk:
  *
  *   1. rename(live, `<path>.old`) — old generation retired whole;
  *   2. rename(`<path>.compact`, live) — new generation promoted;
  *   3. delete(`<path>.old`).
  *
  * Crash anywhere: before 1 the live index is untouched (a partial
  * sibling is overwritten by the next rewrite); between 1 and 2 the
  * old generation survives complete at `.old` and [[recover]] —
  * called by every load — renames it back; after 2 the new
  * generation is live and the stray `.old` is reaped by the next
  * load or swap.
  *
  * `marker` names the sidecar whose presence proves a generation is
  * COMPLETE (the last thing each family's rewrite copies in):
  * `_stats` for the postings lakes, `_centroids` for the IVF index.
  * Recovery keys on the marker, not the bare directory, so a torn
  * partial directory is never mistaken for a live generation. */
object Generations {

  def swap(spark: SparkSession, path: String): Unit = {
    val cur = new org.apache.hadoop.fs.Path(path)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (fs.exists(old)) fs.delete(old, true) // stray from a past crash
    require(fs.rename(cur, old), s"compact swap: cannot retire $cur")
    require(fs.rename(tmp, cur), s"compact swap: cannot promote $tmp")
    fs.delete(old, true)
    ()
  }

  /** Load-time repair for [[swap]]'s one crash window: if the live
    * directory is GONE but a complete old generation sits at
    * `<path>.old`, rename it back (the completed `.compact` sibling,
    * if any, is simply overwritten by the next compact — recovering
    * the OLD generation is always consistent). When the live index is
    * healthy, a stray `.old` is reaped. No-op otherwise. */
  def recover(spark: SparkSession, path: String, marker: String): Unit = {
    val cur = new org.apache.hadoop.fs.Path(path)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    val liveMarker = new org.apache.hadoop.fs.Path(s"$path/$marker")
    if (!fs.exists(cur) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$path.old/$marker"))) {
      require(fs.rename(old, cur),
        s"compact recovery: cannot restore $old to $cur")
    } else if (fs.exists(liveMarker) && fs.exists(old)) {
      fs.delete(old, true) // crash after promotion: reap the leftover
      ()
    }
  }
}
