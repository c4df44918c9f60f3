package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.osm.{ChangePipeline, OscReader}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ST5 under Structured Streaming: per-key GroupState keeps the newest
  * version across triggers; stale ops arriving later emit nothing. */
class ChangeStreamSpec extends SparkTestBase {

  private def osc(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<osmChange version="0.6">$body</osmChange>""".stripMargin

  val file1: String = osc(
    """<create>
      |  <node id="1" version="1" timestamp="2024-01-01T00:00:00Z" lat="1.0" lon="1.0"/>
      |  <node id="2" version="1" timestamp="2024-01-01T00:00:00Z" lat="2.0" lon="2.0"/>
      |</create>
      |<modify>
      |  <node id="1" version="2" timestamp="2024-02-01T00:00:00Z" lat="1.5" lon="1.5"/>
      |</modify>""".stripMargin)

  // seq 2: newer node 1 (v3), a STALE node 2 (v1 older ts), a delete of 1
  val file2: String = osc(
    """<modify>
      |  <node id="1" version="3" timestamp="2024-03-01T00:00:00Z" lat="1.9" lon="1.9"/>
      |  <node id="2" version="1" timestamp="2023-12-01T00:00:00Z" lat="9.9" lon="9.9"/>
      |</modify>
      |<delete>
      |  <node id="1" version="4" timestamp="2024-04-01T00:00:00Z" visible="false"/>
      |</delete>""".stripMargin)

  test("streamed stateful dedup-to-latest equals batch W1 window") {
    import spark.implicits._
    val dir = Files.createDirectories(Paths.get("target/test-change-stream"))
    Files.list(dir).forEach(p => Files.delete(p))
    Files.write(dir.resolve("000000001.osc"), file1.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("000000002.osc"), file2.getBytes(StandardCharsets.UTF_8))

    val q = ChangeStream.fromChangeDir(spark, dir.toString)
      .writeStream.format("memory").queryName("winners")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // emitted rows only move forward per key → the newest emitted row
    // per key IS the final state
    val emitted = spark.table("winners").as[graft.osm.ChangeOp].collect()
    val finalByKey = emitted.groupBy(o => (o.kind, o.id)).map { case (k, os) =>
      k -> os.maxBy(o => (o.version, o.ts.getTime, o.seq))
    }

    val allOps = (OscReader.parseFile("000000001.osc",
      file1.getBytes(StandardCharsets.UTF_8)) ++
      OscReader.parseFile("000000002.osc",
        file2.getBytes(StandardCharsets.UTF_8))).toSeq
    val batchWinners = ChangePipeline
      .dedupLatest(allOps.toDF())
      .as[graft.osm.ChangeOp].collect()
      .map(o => (o.kind, o.id) -> o).toMap

    assert(finalByKey.keySet === batchWinners.keySet)
    finalByKey.foreach { case (k, o) =>
      val b = batchWinners(k)
      assert((o.version, o.action, o.seq) === (b.version, b.action, b.seq), s"key $k")
    }
    // the stale node-2 op from seq 2 must NOT have been emitted
    val node2 = emitted.filter(o => o.id == 2L)
    assert(node2.length === 1 && node2.head.seq === 1)
    // node 1 ends deleted at v4
    assert(finalByKey(("node", 1L)).action === "delete")
    assert(finalByKey(("node", 1L)).version === 4)
  }

  test("watermark TTL bounds dedup state to recently-active keys (RocksDB)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // 20 triggers x 50 FRESH keys each, event time advancing 1 min per
    // trigger, TTL 2 min: without eviction the state would hold 1000
    // keys; with the watermark TTL it must stay bounded by the keys
    // active inside the 2-minute horizon (plus the watermark lag).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[graft.osm.ChangeOp]
      val winners = ChangeStream.latestPerKey(input.toDS(), ttlMs = Some(120000L))
      val ckpt = Files.createTempDirectory("graft-ttl-ckpt").toString
      val q = winners.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("ttl_winners")
        .start()
      try {
        val base = 1704067200000L
        for (b <- 0 until 20) {
          val ops = (0 until 50).map { i =>
            graft.osm.ChangeOp(seq = b, action = "modify", kind = "node",
              id = (b * 50 + i).toLong, version = 1,
              ts = new java.sql.Timestamp(base + b * 60000L),
              visible = true, lon = Some(1.0), lat = Some(2.0),
              nodeRefs = Nil, members = Nil, tags = Map.empty)
          }
          input.addData(ops)
          q.processAllAvailable()
        }
        val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
        assert(stateRows < 500,
          s"state not bounded: $stateRows rows for 1000 short-lived keys")
        // every op was still emitted exactly once (eviction loses no output)
        assert(spark.table("ttl_winners").count() === 1000L)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
