package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user event on the stream (events table shape). */
case class UserEvent(user_id: Long, ts: Timestamp)

/** An open per-user session held in state. */
case class OpenSession(start: Timestamp, end: Timestamp, n: Long)

/** A closed session emitted downstream. */
case class ClosedSession(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long)

/** Gap-based session windows with custom state — the streaming
  * equivalent of the batch `events_sessionize` entry (lag → flag →
  * cumsum), built on `flatMapGroupsWithState` + event-time timeout.
  *
  * Per key the state is ONE open session (start, end, count) — bytes
  * per user, not events per user — and it closes two ways:
  *   - in-batch: a new event ≥ gap after the open session's end closes
  *     it immediately and starts the next;
  *   - by timeout: when the watermark passes `end + gap`, the state
  *     times out and the final session flushes — no unbounded wait for
  *     a key that went quiet.
  * Late events behind the watermark are dropped by the watermark
  * itself, so a closed session is never reopened (append-mode safe).
  * State partitions by user across executors and checkpoints with the
  * query — the formulation that holds at 100 TB of events.
  */
object SessionWindows {

  /** Full-precision epoch micros (getTime alone truncates to ms — the
    * batch formulation's gap math is exact integer microseconds, so
    * the stream's must be too for the two paths to agree). */
  private[streaming] def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Event-time timeout deadline (epoch ms) for an open session ending
    * at `end`: strictly AFTER the exact-microsecond strict-gap boundary
    * `micros(end) + gap`. `setTimeoutTimestamp` is millisecond-grained
    * while the merge rule compares microseconds, so a ms-truncated
    * deadline (`end.getTime + gapMs`) could expire up to ~1 ms inside
    * the window an event at the boundary is still entitled to join. */
  private[streaming] def timeoutDeadlineMs(end: Timestamp, gapMs: Long): Long =
    Math.floorDiv(micros(end) + gapMs * 1000L, 1000L) + 1L

  /** Fold a (sorted) batch of timestamps into the open session,
    * emitting sessions closed by in-batch gaps. A gap STRICTLY greater
    * than `gapMs` starts a new session — same boundary rule as the
    * batch `events_sessionize` lag -> flag -> cumsum formulation
    * (parity asserted in SessionWindowsSpec). Pure — unit-testable
    * without a stream. */
  private[streaming] def fold(open: Option[OpenSession],
      sorted: Seq[Timestamp], gapMs: Long): (Option[OpenSession], Seq[OpenSession]) =
    sorted.foldLeft((open, Vector.empty[OpenSession])) {
      case ((None, closed), t) => (Some(OpenSession(t, t, 1L)), closed)
      case ((Some(s), closed), t) =>
        if (micros(t) - micros(s.end) > gapMs * 1000L)
          (Some(OpenSession(t, t, 1L)), closed :+ s)
        else if (t.compareTo(s.end) > 0)
          (Some(s.copy(end = t, n = s.n + 1)), closed)
        else (Some(s.copy(n = s.n + 1)), closed) // in-batch disorder
    }

  def sessionize(ds: Dataset[UserEvent], gapMs: Long,
      watermarkDelay: String): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.scalaLong
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.start, s.end, s.n))
          } else {
            // full-precision sort (compareTo includes nanos — getTime
            // alone would scramble µs-apart events, same pitfall as the
            // StatefulLatest guard)
            val sorted = rows.map(_.ts).toSeq.sortWith(_.compareTo(_) < 0)
            val (open, closed) = fold(state.getOption, sorted, gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(timeoutDeadlineMs(s.end, gapMs))
            }
            closed.iterator.map(s => ClosedSession(uid, s.start, s.end, s.n))
          }
      }
  }
}
