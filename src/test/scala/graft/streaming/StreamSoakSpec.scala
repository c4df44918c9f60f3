package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import graft.SparkTestBase
import graft.osm.{ChangeOp, Replicator}
import graft.tables.SnapshotTable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.Trigger

/** VERDICT r4 item 8 — the streaming mirror of ReplicatorSpec's 7-diff
  * batch soak: ChangeStream drives [[Replicator.applyOps]] over 7 diff
  * files under the RocksDB state store, with
  *  (a) an INJECTED CRASH after a mid-stream batch's MERGE lands but
  *      before its offset commits (the worst-case kill point — the
  *      batch is re-delivered on restart and the idempotent MERGE must
  *      absorb the double application), and
  *  (b) a cold restart from the SAME checkpoint after 4 more diffs
  *      arrive (the live-loop catch-up shape).
  * Final three-layer store must be row-identical to a one-shot batch
  * [[Replicator.catchUp]] over the same 7 diffs. */
class StreamSoakSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = Paths.get(s"target/test-stream-soak/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private def osc(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<osmChange version="0.6" generator="t">$body</osmChange>""".stripMargin
  private def node(id: Long, v: Int, lon: Double, lat: Double): String =
    s"""<node id="$id" version="$v" timestamp="2024-01-0${v}T00:00:00Z" lat="$lat" lon="$lon"/>"""
  private def way(id: Long, v: Int, refs: Seq[Long]): String =
    s"""<way id="$id" version="$v" timestamp="2024-01-0${v}T00:00:00Z">""" +
      refs.map(r => s"""<nd ref="$r"/>""").mkString + "</way>"
  private def rel(id: Long, v: Int, members: Seq[(String, Long, String)]): String =
    s"""<relation id="$id" version="$v" timestamp="2024-01-0${v}T00:00:00Z">""" +
      members.map { case (t, r, ro) => s"""<member type="$t" ref="$r" role="$ro"/>""" }
        .mkString + "</relation>"

  private val diffs: Seq[String] = Seq(
    osc(s"<create>${node(10, 1, 1.0, 1.0)}${node(11, 1, 2.0, 2.0)}</create>" +
      s"<modify>${node(1, 2, 10.5, 20.5)}</modify>"),
    osc(s"<create>${way(20, 1, Seq(1, 2))}</create>" +
      s"<modify>${node(2, 2, 6.0, 6.0)}</modify>"),
    osc(s"<modify>${node(1, 3, 11.0, 21.0)}</modify>" +
      s"<create>${rel(200, 1, Seq(("way", 20L, "outer")))}</create>"),
    osc("<delete><node id=\"11\" version=\"2\" timestamp=\"2024-02-01T00:00:00Z\"" +
      " visible=\"false\" lat=\"0\" lon=\"0\"/></delete>" +
      s"<modify>${way(20, 2, Seq(1, 2, 3))}</modify>"),
    osc(s"<create>${node(12, 1, 3.0, 3.0)}</create>" +
      s"<modify>${node(10, 2, 1.5, 1.5)}</modify>"),
    osc(s"<modify>${rel(200, 2, Seq(("way", 20L, "inner"), ("node", 12L, "pt")))}</modify>"),
    osc("<delete><relation id=\"200\" version=\"3\" timestamp=\"2024-02-03T00:00:00Z\"" +
      " visible=\"false\"/><way id=\"20\" version=\"3\"" +
      " timestamp=\"2024-02-03T00:00:00Z\" visible=\"false\"/></delete>" +
      s"<modify>${node(3, 2, 7.5, 7.5)}</modify>"))

  private def writeDiffs(dir: String, range: Range): Unit =
    range.foreach { i =>
      Files.write(Paths.get(dir, f"00000000${i + 1}%d.osc"),
        diffs(i).getBytes(StandardCharsets.UTF_8))
    }

  private def mkRoot(name: String): String = {
    val root = fresh(name)
    SnapshotTable.create(spark, s"$root/nodes",
      Seq((1L, 0.0, 0.0), (2L, 5.0, 5.0), (3L, 7.0, 7.0))
        .toDF("node_id", "lon", "lat"), Seq("node_id"))
    SnapshotTable.create(spark, s"$root/ways", Seq(
      (15L, "1;3",
        "LINESTRING(0.0000000 0.0000000, 7.0000000 7.0000000)"))
      .toDF("way_id", "members", "wkt"), Seq("way_id"))
    SnapshotTable.create(spark, s"$root/rels",
      Seq((100L, "way/15/outer")).toDF("rel_id", "members"), Seq("rel_id"))
    root
  }

  private def state(root: String) = {
    val r = new Replicator(spark, root)
    (SnapshotTable.load(spark, s"$root/nodes").read()
        .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq,
      r.ways.read().select("way_id", "members").as[(Long, String)]
        .collect().sortBy(_._1).toSeq,
      r.rels.read().select("rel_id", "members").as[(Long, String)]
        .collect().sortBy(_._1).toSeq)
  }

  test("7-diff streaming soak: post-merge crash + checkpoint restart + late diffs == batch catchUp (RocksDB)") {
    // one-shot batch truth over all 7 diffs
    val batchDir = fresh("batch-changes")
    writeDiffs(batchDir, 0 until 7)
    val rootB = mkRoot("batch")
    new Replicator(spark, rootB).catchUp(batchDir)

    // streaming side: diffs 1-3 first
    val streamDir = fresh("stream-changes")
    writeDiffs(streamDir, 0 until 3)
    val rootS = mkRoot("stream")
    val replS = new Replicator(spark, rootS)
    val ckpt = fresh("ckpt")
    @volatile var crashed = false
    def run(crashAtBatch: Long): Unit = {
      val q = ChangeStream.fromChangeDir(spark, streamDir)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (winners: Dataset[ChangeOp], batchId: Long) =>
          replS.applyOps(winners.toDF())
          // crash AFTER the merge landed, BEFORE the offset commits —
          // this batch will be re-delivered and re-merged on restart
          if (batchId == crashAtBatch && !crashed) {
            crashed = true
            throw new RuntimeException("injected post-merge crash")
          }
          ()
        }
        .start()
      try q.awaitTermination(180000)
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally if (q.isActive) q.stop()
    }

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      run(crashAtBatch = 1) // dies mid-stream after batch 1's merge
      assert(crashed, "crash injection did not fire")
      run(crashAtBatch = -1) // restart: re-delivers batch 1, finishes 1-3
      // live loop continues: 4 more diffs arrive, cold restart
      writeDiffs(streamDir, 3 until 7)
      run(crashAtBatch = -1)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    assert(state(rootS) === state(rootB))
    // sanity on the truth itself: way 20 and rel 200 deleted, node 11
    // deleted, nodes 10/12 live
    val (nodes, ways, rels) = state(rootB)
    assert(nodes.map(_._1) === Seq(1L, 2L, 3L, 10L, 12L))
    assert(ways.map(_._1) === Seq(15L))
    assert(rels.map(_._1) === Seq(100L))
  }
}
