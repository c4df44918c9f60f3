package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.{SparkEntry, SparkTestBase}

/** Streaming geofence transitions must equal the oracle-proven batch
  * q123 exactly — under event-time disorder, on the production RocksDB
  * state backend — because both sides define a transition the same
  * way: containment flip between (ts, event_id)-consecutive per-user
  * positions, boundary-inclusive PIP. */
class GeofenceStreamSpec extends SparkTestBase {

  test("streamed transitions equal batch q123 under arrival disorder (RocksDB)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sc = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // the SAME fence layer the batch query joins against
    val fences = graft.spatial.SpatialJoin.polygons(
        graft.synth.SynthUniverse.wayMembers(spark, sfSmoke),
        graft.synth.SynthUniverse.nodes(spark, sfSmoke))
      .select(col("way_id"), col("xs"), col("ys"))
      .collect().map(r => GeofenceStream.Fence(r.getLong(0),
        r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)).toSeq
    assert(fences.nonEmpty)

    // the SAME position derivation as q123
    val positions = graft.queries.Tables.events(spark, sfSmoke)
      .select(col("user_id"), col("event_id"), col("ts"),
        ((col("event_id") * 17 % 320000).cast("double") / 1000.0 - 160.0).as("lon"),
        ((col("event_id") * 23 % 150000).cast("double") / 1000.0 - 75.0).as("lat"))
      .as[GeofenceStream.Pos].collect()

    val expected = SparkEntry
      .queries("q123_geofence_transitions")(spark, sfSmoke)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(expected.nonEmpty, "degenerate fixture: no transitions at all")
    assert(expected.exists(_._4 == "enter") && expected.exists(_._4 == "exit"))

    // the BATCH face of the same operator (no watermark: the group is
    // complete, everything is provable) must also equal q123
    val batchGot = GeofenceStream.transitions(
        positions.toSeq.toDS(), fences,
        res = graft.queries.SpatialQueries.PipRes)
      .collect().map(t => (t.user_id, t.event_id, t.way_id, t.direction)).toSet
    assert(batchGot == expected,
      s"batch face ${batchGot.size} vs q123 ${expected.size}")

    // arrival order = event time + deterministic jitter strictly under
    // the watermark delay — the disorder the watermark contract covers
    val delayMs = 3600 * 1000L
    val arrival = positions.sortBy(p =>
      (p.ts.getTime + (p.event_id * 2654435761L % delayMs) - delayMs / 2, p.event_id))
    val maxTs = positions.map(_.ts.getTime).max

    val input = MemoryStream[GeofenceStream.Pos]
    val ckpt = Files.createTempDirectory("graft-geofence-ckpt").toString
    val q = GeofenceStream.transitions(input.toDS(), fences,
        res = graft.queries.SpatialQueries.PipRes, watermarkDelayMs = delayMs)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("geofence_transitions")
      .start()
    try {
      arrival.grouped(arrival.length / 5 + 1).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // two sentinel pokes: the first advances the watermark past every
      // real event, the second fires the event-time timeouts that flush
      // the remaining buffered positions (a sentinel at an unused user
      // emits nothing itself)
      (1 to 2).foreach { i =>
        input.addData(GeofenceStream.Pos(-1L, -i.toLong,
          new Timestamp(maxTs + 2 * delayMs + i * 1000L), 0.0, 0.0))
        q.processAllAvailable()
      }
      val got = spark.table("geofence_transitions")
        .as[GeofenceStream.Transition]
        .collect().map(t => (t.user_id, t.event_id, t.way_id, t.direction)).toSet
      assert(got == expected,
        s"stream ${got.size} vs batch ${expected.size}: " +
          s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    graft.Bench.clearState(spark)
  }
}
