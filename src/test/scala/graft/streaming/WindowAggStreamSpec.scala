package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The append-mode windowed rollup must (a) equal the batch groupBy
  * over the same pings once the watermark seals every hour, (b) emit
  * each (window, tile) key exactly once across all triggers, and (c)
  * evict sealed windows from state — the property that keeps an
  * always-on occupancy stream's memory bounded by the lateness
  * horizon instead of the stream's lifetime. */
class WindowAggStreamSpec extends SparkTestBase {

  test("windowed tile counts equal batch, emit exactly once, and shed state (RocksDB)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // real event times, synthetic tiles; arrival = event order with
      // jitter bounded WELL under the 30-minute delay (the watermark
      // contract), so disorder is exercised but nothing is droppable
      val pings = graft.queries.Tables.events(spark, sfSmoke)
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_id") * 17 % 5).as("tile"))
        .as[WindowAggStream.Ping].collect()
        .sortBy(p => p.ts.getTime + (p.event_id * 37 % 300000)) // <= 5 min jitter
      assert(pings.length >= 400)

      val input = MemoryStream[WindowAggStream.Ping]
      val out = WindowAggStream.tileCounts(input.toDS(), "30 minutes")
      val ckpt = Files.createTempDirectory("graft-winagg-ckpt").toString
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("stream_winagg").start()
      try {
        var maxState = 0L
        pings.grouped(200).foreach { chunk =>
          input.addData(chunk.toSeq)
          q.processAllAvailable()
          val p = q.lastProgress
          if (p != null && p.stateOperators.nonEmpty)
            maxState = math.max(maxState, p.stateOperators.map(_.numRowsTotal).max)
        }
        // flush: one far-future ping seals every real window
        val far = new java.sql.Timestamp(
          pings.map(_.ts.getTime).max + 7L * 24 * 3600 * 1000)
        input.addData(Seq(WindowAggStream.Ping(999999L, 1L, far, 0L)))
        q.processAllAvailable()

        val got = spark.table("stream_winagg")
          .collect().map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2))
        // exactly-once: every sealed key appended a single row
        assert(got.length === got.map(_._1).distinct.length,
          "append mode must emit each (window, tile) exactly once")

        // batch parity over the same pings (the sentinel's window never
        // seals, so the reference is the real pings only)
        val batch = spark.createDataset(pings.toSeq)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("tile"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("win_start"), col("tile"), col("n"))
          .collect().map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        assert(got.toMap === batch)

        // eviction: the stream spans ~720 hours of keys, but live state
        // only ever holds the unsealed tail — far fewer than the total
        assert(maxState > 0 && maxState * 4 < batch.size,
          s"state must shed sealed windows: saw $maxState of ${batch.size} keys")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    graft.Bench.clearState(spark)
  }
}
