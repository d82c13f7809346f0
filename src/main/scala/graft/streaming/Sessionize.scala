package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event sessionization with keyed state — the
  * `flatMapGroupsWithState` twin of the batch gaps-and-islands query
  * [[graft.queries.Pipeline.sessionize]], with identical semantics: a
  * session is a maximal run of one user's events where consecutive
  * gaps are ≤ `gapSeconds`; emitted fields are (user, start, end,
  * count, value sum).
  *
  * Correctness under out-of-order arrival: per-user state holds ALL
  * sessions the watermark hasn't finalized (as merged intervals), not
  * just the latest — a late event inside the watermark may extend a
  * session backwards or BRIDGE two open sessions into one, exactly as
  * Spark's native session-window state store does. A session is
  * emitted only once the watermark strictly passes `end + gap`, at
  * which point no admissible event can touch it (events earlier than
  * the watermark are dropped upstream). State per user is O(open
  * sessions within the watermark horizon), which the watermark bounds;
  * Spark shards it by key across executors and checkpoints it
  * incrementally — the shape that scales to any key cardinality.
  *
  * Upstream must set `withWatermark` on the event-time column.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class Open(startUs: Long, endUs: Long, n: Long, sum: Double)
  final case class OpenSessions(sessions: Seq[Open])
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  def sessions(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSessions]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fold(gapSeconds * 1000000L))
  }

  /** Insert one event, merging every open session it touches (an
    * event within `gap` of two sessions bridges them into one).
    */
  private def insert(gapUs: Long, ss: Seq[Open], us: Long, v: Double): Seq[Open] = {
    val (touching, rest) = ss.partition(o =>
      us >= o.startUs - gapUs && us <= o.endUs + gapUs)
    val merged = touching.foldLeft(Open(us, us, 1L, v)) { (a, o) =>
      Open(math.min(a.startUs, o.startUs), math.max(a.endUs, o.endUs),
        a.n + o.n, a.sum + o.sum)
    }
    merged +: rest
  }

  private def fold(gapUs: Long)(
      user: Long, batch: Iterator[Event], state: GroupState[OpenSessions]): Iterator[Session] = {
    var sessions: Seq[Open] = state.getOption.map(_.sessions).getOrElse(Seq.empty)
    batch.foreach(e => sessions = insert(gapUs, sessions, micros(e.ts), e.value))

    // finalize: watermark strictly past end+gap ⇒ no admissible event
    // (all future events have ts ≥ watermark) can extend the session
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (done, open) = sessions.partition(o => o.endUs + gapUs < wmUs)

    if (open.isEmpty) state.remove()
    else {
      state.update(OpenSessions(open))
      state.setTimeoutTimestamp(open.map(o => o.endUs + gapUs).min / 1000L + 1L)
    }
    done.sortBy(_.startUs).iterator.map(close(user, _))
  }

  private def micros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  private def close(user: Long, o: Open): Session =
    Session(user, fromMicros(o.startUs), fromMicros(o.endUs), o.n, o.sum)
}
