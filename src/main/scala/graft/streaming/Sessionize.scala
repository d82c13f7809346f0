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
  * Mechanics: per-user state holds the open session; each micro-batch
  * folds its (sorted) events in, emitting every session closed by an
  * over-gap event; an event-time timeout at `session_end + gap` past
  * the watermark emits the final open session. State is O(1) per
  * active user — the shape that scales to any key cardinality, since
  * Spark shards state by key across executors and checkpoints it
  * incrementally.
  *
  * Upstream must set `withWatermark` on the event-time column;
  * out-of-order events within the watermark are handled by the
  * per-batch sort, later ones are dropped by Spark before reaching
  * the state function.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class Open(startUs: Long, endUs: Long, n: Long, sum: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  def sessions(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val openEnc = Encoders.product[Open]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fold(gapSeconds * 1000000L))
  }

  private def fold(gapUs: Long)(
      user: Long, batch: Iterator[Event], state: GroupState[Open]): Iterator[Session] = {
    if (batch.isEmpty && state.hasTimedOut) {
      // watermark passed session_end + gap: nothing can extend it
      val out = state.getOption.map(close(user, _)).iterator
      state.remove()
      return out
    }
    val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.value))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val us = micros(e.ts)
      open match {
        case Some(o) if us - o.endUs <= gapUs =>
          open = Some(Open(o.startUs, math.max(o.endUs, us), o.n + 1, o.sum + e.value))
        case Some(o) =>
          closed += close(user, o)
          open = Some(Open(us, us, 1L, e.value))
        case None =>
          open = Some(Open(us, us, 1L, e.value))
      }
    }
    open match {
      case Some(o) =>
        state.update(o)
        state.setTimeoutTimestamp((o.endUs + gapUs) / 1000L + 1L)
      case None => state.remove()
    }
    closed.result().iterator
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
