package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The streamed CUSUM must emit exactly the alarm rows batch q180
  * counts — per user, per direction — even when arrival order is
  * shuffled within the watermark delay, and its state must stay
  * bounded by the in-flight buffer, not the stream length. */
class DriftStreamSpec extends SparkTestBase {

  test("streamed alarms equal the sequential fold under shuffled arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val rows = graft.queries.Tables.events(spark, sfSmoke)
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp"),
        graft.queries.Tables.bp(col("value")).as("vb"))
      .as[DriftStream.Reading].collect()
      .sortBy(r => (r.ts.getTime, r.event_id))
    assert(rows.length > 50)

    // brute sequential fold — the same recurrence q180's windows encode
    val expect = rows.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      var su = 0L; var sd = 0L
      es.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
        su = math.max(0L, su + (e.vb - 550000L))
        sd = math.max(0L, sd + (450000L - e.vb))
        Seq((u, e.event_id, "up", su)).filter(_._4 >= 2000000L) ++
          Seq((u, e.event_id, "dn", sd)).filter(_._4 >= 2000000L)
      }
    }.sorted
    assert(expect.nonEmpty, "workload fires no alarms — test is vacuous")

    // shuffle arrival, then set the watermark delay to the measured
    // disorder horizon (how far behind the running max any row lands)
    // + margin — the contract under test is "disorder <= delay is safe"
    val rnd = new scala.util.Random(42)
    val disordered = rows.grouped(40).flatMap(c => rnd.shuffle(c.toSeq)).toSeq
    var mx = Long.MinValue; var worst = 0L
    disordered.foreach { r =>
      mx = math.max(mx, r.ts.getTime)
      worst = math.max(worst, mx - r.ts.getTime)
    }
    val delayMs = worst + 60000L

    val input = MemoryStream[DriftStream.Reading]
    val alarms = DriftStream.monitor(input.toDS(), 550000L, 450000L,
      2000000L, watermarkDelayMs = delayMs)
    val ckpt = Files.createTempDirectory("graft-drift-ckpt").toString
    val q = alarms.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("stream_drift").start()
    try {
      disordered.grouped(60).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val far = new Timestamp(rows.map(_.ts.getTime).max + 30L * 86400000)
      input.addData(Seq(DriftStream.Reading(9999L, 1L, far, 500000L)))
      q.processAllAvailable()

      val got = spark.table("stream_drift")
        .filter(col("user_id") =!= 9999L)
        .select(col("user_id"), col("event_id"), col("dir"), col("stat"))
        .as[(Long, Long, String, Long)].collect().toSeq.sorted
      assert(got === expect)
    } finally q.stop()
  }
}
