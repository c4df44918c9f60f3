package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked TUMBLING-WINDOW aggregation in APPEND mode — the one
  * Structured Streaming aggregation primitive the engine's other
  * streaming faces don't exercise (SketchStream aggregates without
  * time at all, SessionStream/DriftStream/GeofenceStream fold custom
  * GroupState, StreamJoin buffers a stream-stream join): the live
  * per-(hour, tile) occupancy rollup a position hose feeds into the
  * tile-pyramid / hotspot jobs (batch q131/q170).
  *
  * Semantics under the watermark contract: a (window, tile) row is
  * emitted EXACTLY ONCE — when the watermark (max event time − delay)
  * passes the window's end, i.e. when the window can no longer
  * change. Until then the partial count lives in the aggregation
  * state; after emission the state row is EVICTED, so total state is
  * bounded by occupied tiles × the handful of windows still inside
  * the lateness horizon, never by the stream's lifetime
  * ([[WindowAggStreamSpec]] measures both the exactly-once emission
  * and the eviction).
  *
  * At scale this is the canonical shuffle-once shape: the window
  * expression is computed map-side, the aggregation combines
  * partially before the (window, tile) exchange, and the state store
  * shards on the same key.
  */
object WindowAggStream {

  case class Ping(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, tile: Long)

  /** Hourly tile occupancy, append-mode. Output: (win_start, tile, n)
    * — each key exactly once, when its hour seals. */
  def tileCounts(pings: Dataset[Ping], delay: String = "30 minutes"): DataFrame = {
    require(pings.isStreaming,
      "WindowAggStream.tileCounts maintains a live rollup; batch rollups are q131's shape")
    pings
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("tile"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("tile"), col("n"))
  }
}
