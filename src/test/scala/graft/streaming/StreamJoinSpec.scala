package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.{SparkEntry, SparkTestBase}

/** The watermarked stream-stream interval join must emit exactly the
  * oracle-proven batch q166 pair set under arrival disorder bounded by
  * the watermark delay, on the production RocksDB backend — and its
  * join state must shrink once the watermarks pass (eviction is the
  * whole point of the two-sided time-range condition). */
class StreamJoinSpec extends SparkTestBase {

  test("streamed attribution equals batch q166 under disorder (RocksDB), state evicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sc = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val e = graft.queries.Tables.events(spark, sfSmoke)
      // ts is TIMESTAMP_NTZ; session TZ is UTC, cast keeps the instant
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts")).collect()
    val clicks = e.filter(_.getLong(0) % 5 == 0)
      .map(r => StreamJoin.Click(r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val imps = e.filter(_.getLong(0) % 5 != 0)
      .map(r => StreamJoin.Imp(r.getLong(0), r.getLong(1), r.getTimestamp(2)))

    val expected = SparkEntry.queries("q166_attribution")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "degenerate fixture: no attributed pairs")

    // arrival = event time + deterministic jitter strictly under the
    // watermark delay, independently per stream
    val delayMs = 3600 * 1000L
    def jitter(id: Long, t: Timestamp): Long =
      t.getTime + (id * 2654435761L % delayMs) - delayMs / 2
    val cArr = clicks.sortBy(c => (jitter(c.click_id, c.cts), c.click_id))
    val iArr = imps.sortBy(i => (jitter(i.imp_id, i.its), i.imp_id))
    val maxTs = e.map(_.getTimestamp(2).getTime).max

    val cIn = MemoryStream[StreamJoin.Click]
    val iIn = MemoryStream[StreamJoin.Imp]
    val ckpt = Files.createTempDirectory("graft-attrib-ckpt").toString
    val q = StreamJoin.attribution(cIn.toDS(), iIn.toDS(),
        gapMs = 30L * 60 * 1000, watermarkDelayMs = delayMs)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("attribution")
      .start()
    try {
      val chunks = 5
      val cChunks = cArr.grouped(cArr.length / chunks + 1).toSeq
      val iChunks = iArr.grouped(iArr.length / chunks + 1).toSeq
      (0 until chunks).foreach { k =>
        if (k < cChunks.length) cIn.addData(cChunks(k).toSeq)
        if (k < iChunks.length) iIn.addData(iChunks(k).toSeq)
        q.processAllAvailable()
      }
      val stateBefore = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // sentinels at an unused user advance BOTH watermarks far past
      // every real event: all buffered rows become provably unmatchable
      // and the state store must shed them
      (1 to 2).foreach { k =>
        val t = new Timestamp(maxTs + 4 * delayMs + k * 1000L)
        cIn.addData(StreamJoin.Click(-k.toLong, -1L, t))
        iIn.addData(StreamJoin.Imp(-k.toLong, -1L, t))
        q.processAllAvailable()
      }
      val got = spark.table("attribution")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        .filter(_._3 >= 0) // drop sentinel self-matches
      assert(got == expected,
        s"stream ${got.size} vs batch ${expected.size}: " +
          s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
      val stateAfter = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateBefore > 0, "join kept no state at all?")
      // eviction happens continuously as the watermarks advance (the
      // mid-run total is already small); after the sentinels pass
      // every real event, ONLY the 4 sentinel rows may remain buffered
      assert(stateAfter <= 4,
        s"watermark passed every event but $stateAfter rows stayed buffered")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    graft.Bench.clearState(spark)
  }
}
