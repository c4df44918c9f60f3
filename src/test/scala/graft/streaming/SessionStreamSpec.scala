package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Streaming gap sessionization must emit exactly the batch q63
  * sessions once the watermark closes them, with state bounded by the
  * users still inside the gap horizon. */
class SessionStreamSpec extends SparkTestBase {

  test("streamed sessions equal batch q63 sessions after watermark flush") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // real testdata events for a handful of users, replayed in event-
    // time order (the replication contract: disorder <= watermark delay)
    val evs = graft.queries.Tables.events(spark, sfSmoke)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[SessionStream.Ev]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    assert(evs.length > 50, s"need a real workload, got ${evs.length}")

    val gapMs = 30L * 60 * 1000
    val input = MemoryStream[SessionStream.Ev]
    val sessions = SessionStream.sessionize(input.toDS(), gapMs)
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString
    val q = sessions.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("stream_sessions")
      .start()
    try {
      // three in-order chunks, then a far-future sentinel for a dummy
      // user pushes the watermark past every real session's gap horizon
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val far = new Timestamp(evs.map(_.ts.getTime).max + 30L * 86400000)
      input.addData(Seq(SessionStream.Ev(9999L, 1L, far)))
      q.processAllAvailable()

      val got = spark.table("stream_sessions")
        .filter(col("user_id") =!= 9999L)
        .select(col("user_id"), col("n_events"),
          ((col("end").cast("long")) - col("start").cast("long")).as("duration_s"))
        .as[(Long, Long, Long)].collect().sorted

      val expect = graft.queries.RelationalQueries
        .queries("q63_sessionize")(spark, sfSmoke)
        .filter(col("user_id") < 8)
        .select(col("user_id"), col("n_events"), col("duration_s"))
        .as[(Long, Long, Long)].collect().sorted

      assert(got.length === expect.length,
        s"session count ${got.length} != batch ${expect.length}")
      assert(got === expect)

      // state bounded: only the dummy user's open session survives
      assert(q.lastProgress.stateOperators.head.numRowsTotal <= 1L,
        "closed sessions must evict their state")
    } finally q.stop()
    graft.Bench.clearState(spark)
  }

  test("arrival disorder within the watermark delay preserves batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evs = graft.queries.Tables.events(spark, sfSmoke)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[SessionStream.Ev]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    // bounded disorder: arrival order = sort by ts + jitter with
    // jitter in [0, delay) — any event arriving after another is then
    // at most `delay` older than it, the exact watermark contract
    val delayMs = 10L * 60 * 1000
    val rng = new scala.util.Random(42)
    val disordered = evs.map(e => (e, e.ts.getTime + rng.nextLong(delayMs)))
      .sortBy(_._2).map(_._1).toSeq

    val gapMs = 30L * 60 * 1000
    val input = MemoryStream[SessionStream.Ev]
    val sessions = SessionStream.sessionize(input.toDS(), gapMs,
      watermarkDelayMs = delayMs)
    val ckpt = Files.createTempDirectory("graft-sess-dis-ckpt").toString
    val q = sessions.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("stream_sessions_dis")
      .start()
    try {
      disordered.grouped(math.max(1, disordered.length / 5 + 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val far = new Timestamp(evs.map(_.ts.getTime).max + 30L * 86400000)
      input.addData(Seq(SessionStream.Ev(9999L, 1L, far)))
      q.processAllAvailable()

      val got = spark.table("stream_sessions_dis")
        .filter(col("user_id") =!= 9999L)
        .select(col("user_id"), col("n_events"),
          ((col("end").cast("long")) - col("start").cast("long")).as("duration_s"))
        .as[(Long, Long, Long)].collect().sorted

      val expect = graft.queries.RelationalQueries
        .queries("q63_sessionize")(spark, sfSmoke)
        .filter(col("user_id") < 8)
        .select(col("user_id"), col("n_events"), col("duration_s"))
        .as[(Long, Long, Long)].collect().sorted

      assert(got === expect)
    } finally q.stop()
    graft.Bench.clearState(spark)
  }
}
