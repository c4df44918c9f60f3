package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming face of gap sessionization (batch q63): per
  * user, events accumulate into the open session held in `GroupState`;
  * the session CLOSES — and emits exactly one result row — either when
  * a later event arrives past the gap or when the event-time watermark
  * passes `session end + gap` (the timeout path), so state is bounded
  * by the number of users active inside the gap horizon, not the
  * stream length.
  *
  * Correctness contract: arrival disorder must stay within the
  * watermark delay, and the delay must not exceed the gap — then every
  * event lands either inside the open session's gap window or beyond
  * it (starting a new session), and the batch window
  * (q63's lag + running-sum plan) and this stream produce identical
  * session rows. An event older than `open start − gap` (possible only
  * within the disorder bound) is a complete earlier session by itself
  * and is emitted immediately.
  */
object SessionStream {

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  case class Sess(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

  def sessionize(events: Dataset[Ev], gapMs: Long,
      watermarkDelayMs: Long = 0L): Dataset[Sess] = {
    import events.sparkSession.implicits._
    require(watermarkDelayMs <= gapMs,
      "watermark delay must not exceed the session gap (disorder bound)")
    val src =
      if (events.isStreaming)
        events.withWatermark("ts", s"$watermarkDelayMs milliseconds")
      else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[Sess, Sess](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, incoming: Iterator[Ev], state: GroupState[Sess]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: nothing can join this session
            val s = state.get
            state.remove()
            Iterator.single(s)
          } else {
            // in-batch disorder is free to fix: process in event order
            val evs = incoming.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Sess]
            var cur = state.getOption
            evs.foreach { e =>
              cur = cur match {
                case Some(s) if e.ts.getTime > s.end.getTime + gapMs =>
                  closed ::= s
                  Some(Sess(uid, e.ts, e.ts, 1L))
                case Some(s) if e.ts.getTime < s.start.getTime - gapMs =>
                  // late straggler forming a complete EARLIER session
                  closed ::= Sess(uid, e.ts, e.ts, 1L)
                  Some(s)
                case Some(s) =>
                  val st = if (e.ts.before(s.start)) e.ts else s.start
                  val en = if (e.ts.after(s.end)) e.ts else s.end
                  Some(Sess(uid, st, en, s.n_events + 1L))
                case None =>
                  Some(Sess(uid, e.ts, e.ts, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must arm strictly past the current watermark
              state.setTimeoutTimestamp(math.max(
                s.end.getTime + gapMs + 1,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.reverse.iterator
          }
      }
  }
}
