package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the attribution shape
  * (each click joins every impression of the same user in the
  * preceding gap window), run as Structured Streaming's native
  * watermarked inner join so BOTH sides' buffers are state-bounded:
  * the equality key routes rows to the same state partition and the
  * two-sided time-range condition plus watermarks lets the engine
  * evict a buffered row as soon as the other side's watermark proves
  * no future match can arrive (the standard stream-stream join
  * contract). Batch face = graft.queries q166 (oracle-proven); the
  * spec drives both streams in disorder and asserts set parity.
  *
  * At corpus scale this is ONE user-keyed co-partitioned state store —
  * no broadcast, no cross product; the watermark delay is the only
  * state-size knob, exactly like the batch plan's shuffle-on-user.
  */
object StreamJoin {

  case class Click(click_id: Long, user_id: Long, cts: Timestamp)
  case class Imp(imp_id: Long, user_id: Long, its: Timestamp)

  /** Clicks x impressions of the same user with
    * `its <= cts <= its + gapMs`. Inner join: rows emit on match
    * arrival; watermarks only bound the buffers. */
  def attribution(
      clicks: Dataset[Click],
      imps: Dataset[Imp],
      gapMs: Long,
      watermarkDelayMs: Long): DataFrame = {
    val c = clicks.withWatermark("cts", s"$watermarkDelayMs milliseconds")
    val i = imps.withWatermark("its", s"$watermarkDelayMs milliseconds")
      .withColumnRenamed("user_id", "i_user")
    c.join(i,
        expr(s"user_id = i_user AND its <= cts AND " +
          s"cts <= its + interval $gapMs milliseconds"))
      .select(col("click_id"), col("imp_id"), col("user_id"))
  }
}
