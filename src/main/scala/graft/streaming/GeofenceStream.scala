package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.geo.CellIndex
import graft.spatial.PointInRingExpr

/** Structured-Streaming face of geofence transition detection (batch
  * q123): a live position stream against a STATIC broadcast fence
  * layer, emitting `enter`/`exit` the moment the event-time watermark
  * proves per-user order.
  *
  * Scale shape: the fence layer is the SMALL side (thousands of
  * polygons) and rides to every executor once, as a driver-built
  * cell→fence index (the streaming analog of the batch cover
  * equi-join — each position probes its own cell, then the same
  * boundary-inclusive PIP used by q123 refines). The position stream —
  * the big side — is touched exactly once, with no stream-stream join
  * and no shuffle beyond the per-user grouping.
  *
  * Ordering under disorder: a transition is defined against the
  * PREVIOUS position in (ts, event_id) order, so an event is
  * processed only once the watermark passes its timestamp — no
  * admissible late arrival can then sort before it. Buffered
  * not-yet-provable events are per-user state bounded by the
  * watermark delay window; the last processed containment set (one
  * row) is retained per user so a user resuming after a quiet period
  * diffs against their true previous position.
  */
object GeofenceStream {

  case class Fence(way_id: Long, xs: Array[Double], ys: Array[Double])
  case class Pos(user_id: Long, event_id: Long, ts: Timestamp,
      lon: Double, lat: Double)
  case class Transition(user_id: Long, event_id: Long, way_id: Long,
      direction: String)
  /** Per-user state: last processed containment set + proof-pending buffer. */
  case class UserState(hasLast: Boolean, lastInside: Seq[Long], pending: Seq[Pos])

  /** Driver-built prefilter: every cell a fence's bbox touches at
    * `res` → fence ordinals. Superset candidates; the PIP refine is
    * what decides (mirrors the batch cover join's contract). */
  private def cellIndex(fences: Array[Fence], res: Int): Map[Long, Array[Int]] = {
    val lonEdge = 360.0 / (1L << res)
    val latEdge = 180.0 / (1L << res)
    val m = scala.collection.mutable.HashMap.empty[Long, List[Int]]
    fences.zipWithIndex.foreach { case (f, i) =>
      val (x0, x1) = (f.xs.min, f.xs.max)
      val (y0, y1) = (f.ys.min, f.ys.max)
      var lon = x0
      while (lon <= x1 + lonEdge) {
        var lat = y0
        while (lat <= y1 + latEdge) {
          val c = CellIndex.cellAt(math.min(lon, x1), math.min(lat, y1), res)
          m(c) = i :: m.getOrElse(c, Nil)
          lat += latEdge
        }
        lon += lonEdge
      }
    }
    m.view.mapValues(_.distinct.toArray).toMap
  }

  /** Transitions of `positions` against `fences`, exactly batch q123's
    * semantics (boundary-inclusive PIP, per-user (ts, event_id) order,
    * first position emits nothing). */
  def transitions(positions: Dataset[Pos], fences: Seq[Fence], res: Int,
      watermarkDelayMs: Long = 0L): Dataset[Transition] = {
    val spark = positions.sparkSession
    import spark.implicits._
    val farr = fences.toArray
    require(farr.length <= 1000000,
      s"fence layer ${farr.length} too large to broadcast — partition the layer")
    // rings pre-wrapped ONCE as columnar ArrayData at broadcast build
    // (UnsafeArrayData is Externalizable) — the per-event probe must
    // not copy ring arrays (O(ring) garbage per candidate otherwise)
    val wrapped: Array[(Long, ArrayData, ArrayData)] = farr.map { f =>
      (f.way_id,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(f.xs): ArrayData,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(f.ys): ArrayData)
    }
    val bc = spark.sparkContext.broadcast((wrapped, cellIndex(farr, res)))
    val streaming = positions.isStreaming

    def insideSet(lon: Double, lat: Double): Seq[Long] = {
      val (fs, idx) = bc.value
      idx.getOrElse(CellIndex.cellAt(lon, lat, res), Array.empty[Int])
        .iterator.map(fs(_))
        .filter(f => PointInRingExpr.contains(f._2, f._3, lon, lat))
        .map(_._1).toSeq.distinct.sorted
    }

    val src =
      if (streaming)
        positions.withWatermark("ts", s"$watermarkDelayMs milliseconds")
      else positions
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, incoming: Iterator[Pos], state: GroupState[UserState]) =>
          // batch execution has no watermark (getCurrentWatermarkMs
          // throws): the group is complete, so everything is provable
          val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
          val st = state.getOption.getOrElse(UserState(false, Seq.empty, Seq.empty))
          val all = st.pending ++ (if (state.hasTimedOut) Nil else incoming.toSeq)
          // provable: no admissible future arrival (ts >= wm) can sort
          // before an event with ts < wm
          val (ready, pending) = all.partition(_.ts.getTime < wm)
          var hasLast = st.hasLast
          var lastInside = st.lastInside
          val out = Seq.newBuilder[Transition]
          ready.sortBy(p => (p.ts.getTime, p.event_id)).foreach { p =>
            val cur = insideSet(p.lon, p.lat)
            if (hasLast) {
              cur.filterNot(lastInside.contains)
                .foreach(w => out += Transition(uid, p.event_id, w, "enter"))
              lastInside.filterNot(cur.contains)
                .foreach(w => out += Transition(uid, p.event_id, w, "exit"))
            }
            hasLast = true
            lastInside = cur
          }
          if (streaming) {
            state.update(UserState(hasLast, lastInside, pending))
            // re-fire once the watermark moves, so buffered events
            // flush without needing new data for THIS user
            if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1)
          }
          out.result().iterator
      }
  }
}
