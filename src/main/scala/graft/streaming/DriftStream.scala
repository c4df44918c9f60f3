package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming face of the two-sided CUSUM drift monitor
  * (batch q180): per source, metric readings fold into the Page
  * recurrence s⁺ = max(0, s⁺ + (v − k⁺)), s⁻ = max(0, s⁻ + (k⁻ − v))
  * ONLINE, emitting one alarm row per reading whose statistic sits at
  * or above the threshold — exactly the rows batch q180 counts.
  *
  * CUSUM is order-sensitive, so a reading folds only once the
  * event-time watermark proves nothing earlier can still arrive:
  * incoming rows buffer in state, and each trigger folds the buffered
  * prefix with ts <= watermark in (ts, event_id) order. State per key
  * is the two running statistics plus the in-flight buffer — bounded
  * by the readings inside the watermark delay, NOT the stream length
  * (the q180 identity needs the whole prefix; the recurrence needs
  * O(1)). Arrival disorder within the delay is safe by construction;
  * later disorder is out of contract (the standard watermark
  * trade-off, same as [[SessionStream]]).
  */
object DriftStream {

  case class Reading(user_id: Long, event_id: Long, ts: Timestamp, vb: Long)
  case class Alarm(user_id: Long, event_id: Long, ts: Timestamp,
      dir: String, stat: Long)
  case class DriftState(su: Long, sd: Long, pending: Seq[Reading])

  def monitor(readings: Dataset[Reading], upDrift: Long, dnDrift: Long,
      threshold: Long, watermarkDelayMs: Long = 0L): Dataset[Alarm] = {
    import readings.sparkSession.implicits._
    // batch input would crash at getCurrentWatermarkMs (no watermark
    // exists without a streaming plan) — the batch face of this
    // monitor is q180's window identity; fail loud, not at runtime
    // inside the first group
    require(readings.isStreaming,
      "DriftStream.monitor needs a streaming Dataset; use q180_cusum for batch")
    val src = readings.withWatermark("ts", s"$watermarkDelayMs milliseconds")
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[DriftState, Alarm](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, incoming: Iterator[Reading], state: GroupState[DriftState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(DriftState(0L, 0L, Seq.empty))
          val buffered = st.pending ++ incoming
          // fold everything the watermark has sealed, in event order
          // (strictly below: Spark still admits arrivals AT the
          // watermark, so ts == wm is not yet provably complete)
          val (ready, pending) = buffered.partition(_.ts.getTime < wm)
          var su = st.su; var sd = st.sd
          val alarms = Seq.newBuilder[Alarm]
          ready.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
            su = math.max(0L, su + (r.vb - upDrift))
            sd = math.max(0L, sd + (dnDrift - r.vb))
            if (su >= threshold) alarms += Alarm(uid, r.event_id, r.ts, "up", su)
            if (sd >= threshold) alarms += Alarm(uid, r.event_id, r.ts, "dn", sd)
          }
          if (pending.isEmpty && su == 0L && sd == 0L) state.remove()
          else {
            state.update(DriftState(su, sd, pending))
            // wake when the watermark can seal the earliest pending row
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(pending.map(_.ts.getTime).min, wm + 1))
          }
          alarms.result().iterator
      }
  }
}
