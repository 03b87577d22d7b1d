package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is purely request/response (SURVEY §2.5: no streaming
  * surface); these are the north-star streaming extensions. Each
  * transform is written against an unbounded DataFrame so the SAME
  * function serves batch backfill (`spark.read`) and live streams
  * (`spark.readStream`) — the Structured Streaming contract.
  */
object EventStream {

  /** Event time as a session-zoned TIMESTAMP truncated to whole
    * seconds (the testdata parquet stores TIMESTAMP(MICROS) without a
    * zone, which Spark scans as TIMESTAMP_NTZ; sessions run UTC, so
    * the cast is instant-preserving). Second truncation keeps session
    * boundaries and window buckets bit-stable against sub-second
    * jitter — and matches the oracle's floor(epoch(ts)). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time",
      date_trunc("second", col("ts")).cast("timestamp"))

  /** Tumbling-window counts per event type, watermarked for state
    * cleanup when run as a stream; identical results in batch mode. */
  def windowedCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val streaming = events.isStreaming
    val timed = withEventTime(events)
    val src = if (streaming) timed.withWatermark("event_time", watermark) else timed
    src.groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  case class SessionEvent(user_id: Long, event_time: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class UserSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Gap-based sessionization with custom state
    * (`flatMapGroupsWithState`): a session closes after `gapSeconds` of
    * user inactivity. `flushOpen = true` (batch semantics) also emits
    * each user's still-open trailing session at end of input — matching
    * [[sessionizeBatch]]; set it false for incremental/streaming use,
    * where open sessions must stay in state across micro-batches (close
    * them with a state timeout in a production streaming job). */
  def sessionize(
      events: Dataset[SessionEvent],
      gapSeconds: Long,
      flushOpen: Boolean = true): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Option[SessionState], UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[Option[SessionState]]) =>
          def emit(s: SessionState) = UserSession(uid,
            new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)
          val sorted = it.toSeq.sortBy(_.event_time.getTime)
          var open = state.getOption.flatten
          val closed = scala.collection.mutable.ListBuffer[UserSession]()
          sorted.foreach { e =>
            val t = e.event_time.getTime
            open match {
              case Some(cur) if t - cur.end <= gapSeconds * 1000 =>
                // late events (t < cur.end across micro-batches) merge
                // but must never move the session end backwards
                open = Some(cur.copy(
                  start = math.min(cur.start, t),
                  end = math.max(cur.end, t),
                  n = cur.n + 1,
                  sum = cur.sum + e.value))
              case Some(cur) =>
                closed += emit(cur)
                open = Some(SessionState(t, t, 1, e.value))
              case None =>
                open = Some(SessionState(t, t, 1, e.value))
            }
          }
          if (flushOpen) {
            open.foreach(closed += emit(_))
            state.remove()
          } else state.update(open)
          closed.iterator
      }
  }

  /** Sessionization via Spark's native `session_window` — the built-in
    * gap-window aggregate (works streaming with watermark and batch).
    * The merge boundary is end-INCLUSIVE: sessions merge when
    * `next.start <= current.end`, so a gap of exactly `gapSeconds`
    * still merges — the SAME boundary as [[sessionizeBatch]]'s
    * `diff > gap` split (oracle-verified on data containing an
    * exact-gap pair; an earlier note here claimed the end was
    * exclusive, which one extra session row disproved). */
  def sessionizeNative(events: DataFrame, gapSeconds: Long): DataFrame = {
    val timed = withEventTime(events)
    timed
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
  }

  /** Batch-mode sessionization over the full table — same gap semantics
    * expressed relationally (lag + cumulative session ids), used as the
    * batch backfill twin and oracle for [[sessionize]]. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val timed = withEventTime(events)
      .select(col("user_id"), col("event_time"), col("value"))
    val byUser = Window.partitionBy("user_id").orderBy("event_time")
    timed
      .withColumn("prev", lag("event_time", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull ||
          unix_timestamp(col("event_time")) - unix_timestamp(col("prev"))
            > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        min("event_time").as("session_start"),
        max("event_time").as("session_end"),
        count(lit(1)).as("n_events"),
        sum("value").as("sum_value"))
      .drop("session_id")
  }
}
