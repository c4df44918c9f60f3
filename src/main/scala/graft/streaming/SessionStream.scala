package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming face of gap sessionization (batch q63): per
  * user, events accumulate into OPEN sessions held in `GroupState`; a
  * session emits — exactly once — only when the event-time WATERMARK
  * passes `end + gap`, i.e. when no admissible future event could
  * still join or bridge it. Closing on watermark (not eagerly on the
  * next out-of-gap arrival) is what makes arbitrary arrival disorder
  * within the watermark delay safe: a late bridging event can MERGE
  * two sessions that are both still open, which eager closing would
  * have split — SessionStreamSpec's disorder test exercises exactly
  * that.
  *
  * State per user is its open-session list, bounded by
  * ceil(delay / gap) + 1 sessions (a session stays open only while the
  * watermark — at most `delay` behind max event time — has not passed
  * its end + gap). Correctness contract: events later than the
  * watermark delay are out of contract (the standard watermark
  * trade-off); delay <= gap is NOT required, any delay works.
  */
object SessionStream {

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  case class Sess(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)
  case class OpenSessions(sessions: Seq[Sess])

  def sessionize(events: Dataset[Ev], gapMs: Long,
      watermarkDelayMs: Long = 0L): Dataset[Sess] = {
    import events.sparkSession.implicits._
    val src =
      if (events.isStreaming)
        events.withWatermark("ts", s"$watermarkDelayMs milliseconds")
      else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Sess](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, incoming: Iterator[Ev], state: GroupState[OpenSessions]) =>
          val wm = state.getCurrentWatermarkMs()
          var open: Seq[Sess] = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          if (!state.hasTimedOut) {
            incoming.toArray.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              val idx = open.indexWhere(s =>
                t >= s.start.getTime - gapMs && t <= s.end.getTime + gapMs)
              open =
                if (idx < 0) (open :+ Sess(uid, e.ts, e.ts, 1L))
                  .sortBy(_.start.getTime)
                else {
                  val s = open(idx)
                  val st = if (t < s.start.getTime) e.ts else s.start
                  val en = if (t > s.end.getTime) e.ts else s.end
                  open.updated(idx, Sess(uid, st, en, s.n_events + 1L))
                    .sortBy(_.start.getTime)
                }
              // a bridging event can pull two neighbors within the gap
              open = open.foldLeft(Seq.empty[Sess]) { (acc, s) =>
                acc.lastOption match {
                  case Some(p) if s.start.getTime <= p.end.getTime + gapMs =>
                    acc.init :+ Sess(uid, p.start,
                      if (s.end.after(p.end)) s.end else p.end,
                      p.n_events + s.n_events)
                  case _ => acc :+ s
                }
              }
            }
          }
          // the watermark proves closure: nothing admissible can still
          // join a session once wm has passed its end + gap
          val (closed, stillOpen) = open.partition(_.end.getTime + gapMs < wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(OpenSessions(stillOpen))
            val nextClose = stillOpen.map(_.end.getTime + gapMs).min
            state.setTimeoutTimestamp(math.max(nextClose, wm + 1))
          }
          closed.sortBy(_.start.getTime).iterator
      }
  }
}
