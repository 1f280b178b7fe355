package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface over the `events` shape: the streaming twins
  * of the batch queries an11 (hourly windowed aggregation) and an12
  * (sessionization), built on watermarks + `window()` and
  * `flatMapGroupsWithState` respectively.
  *
  * The reference is batch-only (SURVEY.md §2.9); this is the extension a
  * 100 TB training-data pipeline needs for incremental ingest. Both
  * transforms are input-agnostic: tests drive them with MemoryStream, a
  * deployment points `spark.readStream` at a file/kafka source and
  * `writeStream` at the sink. State is keyed (user_id / window), so it
  * shards across executors; the watermark bounds state size.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)
  // public: the state encoder's generated code needs constructor access
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Watermarked 1-hour tumbling-window counts per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** One micro-batch of a user's events folded into the open session state.
    * Events at-or-before the current session end (late arrivals across
    * batches) merge into the open session without moving its end backwards.
    * Exposed for direct unit testing. */
  private[graft] def foldBatch(
      userId: Long,
      batch: Seq[Event],
      initial: Option[SessionState],
      gapMs: Long): (Seq[Session], Option[SessionState]) = {
    val sorted = batch.sortBy(e => (e.ts.getTime, e.event_id))
    val closed = Seq.newBuilder[Session]
    var cur    = initial
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(st) if t <= st.last =>
          cur = Some(st.copy(start = math.min(st.start, t), n = st.n + 1))
        case Some(st) if t - st.last <= gapMs =>
          cur = Some(st.copy(last = t, n = st.n + 1))
        case Some(st) =>
          closed += Session(userId, new Timestamp(st.start), new Timestamp(st.last), st.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    (closed.result(), cur)
  }

  /** Streaming exact dedup: first event per `event_id` wins, duplicates
    * inside the watermark horizon are dropped (`dropDuplicates` keyed
    * state). The streaming twin of dd01's batch dedup — at-least-once
    * sources (kafka redeliveries, file-source replays) become effectively-
    * once downstream. State is one entry per key within the watermark and
    * is evicted as the watermark advances, so state size is bounded by the
    * key arrival rate × horizon, not the stream's lifetime. */
  def dedupe(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom stateful sessionization: 30-min inactivity gap, emitted on
    * processing-time timeout — the `flatMapGroupsWithState` pattern.
    *
    * `withTimeout = false` disables the processing-time timeout (open
    * sessions stay in state; only gap-closed sessions emit). That is the
    * mode for finite replays (`Trigger.AvailableNow` backfills/verification
    * runs): pending processing-time timeouts make the engine schedule
    * no-data batches indefinitely, so an AvailableNow query would never
    * terminate. Unbounded deployments keep the default. */
  def sessionize(events: Dataset[Event], withTimeout: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    val mode =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](OutputMode.Append(), mode) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(st => Session(userId, new Timestamp(st.start), new Timestamp(st.last), st.n))
            state.remove()
            out.iterator
          } else {
            val (closed, next) = foldBatch(userId, batch.toSeq, state.getOption, gapMs)
            next.foreach(state.update)
            if (withTimeout) state.setTimeoutDuration("30 minutes")
            closed.iterator
          }
      }
  }
}
