package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for stateful processing. */
final case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long, value: Double,
    ts: java.sql.Timestamp) // event-time column: must survive projection so the watermark reaches the stateful op

/** One closed session. */
final case class SessionSummary(user_id: Long, session_id: Long, n_events: Long,
    start_us: Long, end_us: Long, sum_value: Double)

/** Gap-based sessionization as a custom stateful operator — the engine's
  * "arbitrary stateful reduce" capability, generalizing the reference's
  * per-key reduce contract (MapReduceClient.h:61-64) to event time.
  *
  * Two faithful realizations of one session function:
  *   - batch: `flatMapGroups` — each key seen once with all events;
  *   - streaming: `flatMapGroupsWithState` with event-time timeout —
  *     events buffer per key, and sessions seal when the watermark passes
  *     the gap horizon.
  * State is sharded by user_id across executors; per-key state is bounded
  * by the open session's events, so memory scales with active users, not
  * with history.
  */
object Sessions {
  val GapUs: Long = 30L * 60 * 1000 * 1000 // 30 minutes

  /** Splits one user's events into gap-delimited sessions (pure). */
  private[streaming] def split(userId: Long, events: Iterator[SessionEvent]): Iterator[SessionSummary] = {
    val sorted = events.toVector.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Vector.newBuilder[SessionSummary]
      // 1-based ids, matching the declarative q_sessionize twin
      var sid = 1L; var n = 0L; var start = 0L; var end = 0L; var sum = 0.0
      for (e <- sorted) {
        if (n > 0L && e.ts_us - end > GapUs) {
          out += SessionSummary(userId, sid, n, start, end, sum)
          sid += 1; n = 0L; sum = 0.0
        }
        if (n == 0L) start = e.ts_us
        n += 1; end = e.ts_us; sum += e.value
      }
      out += SessionSummary(userId, sid, n, start, end, sum)
      out.result().iterator
    }
  }

  /** Batch sessionization — the whole-group reduce shape. */
  def sessionize(ds: Dataset[SessionEvent]): Dataset[SessionSummary] =
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroups((uid: Long, it: Iterator[SessionEvent]) => split(uid, it))(
        Encoders.product[SessionSummary])

  private def stateFn(userId: Long, events: Iterator[SessionEvent],
      state: GroupState[Vector[SessionEvent]]): Iterator[SessionSummary] = {
    if (state.hasTimedOut) {
      // Watermark passed the gap horizon: every buffered session is sealed.
      val buffered = state.getOption.getOrElse(Vector.empty)
      state.remove()
      split(userId, buffered.iterator)
    } else {
      val buffered = state.getOption.getOrElse(Vector.empty) ++ events
      state.update(buffered)
      // Seal once no event for this user can arrive within the gap. A late
      // event (flatMapGroupsWithState does NOT drop late rows) could put
      // last+gap at or below the watermark, which setTimeoutTimestamp
      // rejects — clamp just above it so the group seals next batch.
      val candidate = buffered.map(_.ts_us / 1000).max + GapUs / 1000
      val floor = state.getCurrentWatermarkMs() + 1000
      state.setTimeoutTimestamp(math.max(candidate, floor))
      Iterator.empty
    }
  }

  /** Streaming sessionization — requires a watermark on the source's
    * event-time column; sessions emit when the watermark passes the last
    * event + gap.
    */
  def sessionizeStream(ds: Dataset[SessionEvent]): Dataset[SessionSummary] =
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(stateFn)(
        Encoders.kryo[Vector[SessionEvent]], Encoders.product[SessionSummary])
}
