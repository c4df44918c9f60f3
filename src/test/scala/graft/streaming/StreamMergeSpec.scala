package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import graft.SparkTestBase
import graft.osm.{ChangeOp, Replicator}
import graft.tables.SnapshotTable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming face of the replication loop END TO END: per-trigger
  * GroupState winners → foreachBatch MERGE INTO the node snapshot
  * table must land exactly the state batch [[Replicator.catchUp]]
  * produces over the same change dir — run under the RocksDB state
  * store provider (the spill-capable backend a 100 TB live-update
  * deployment would configure; the default HDFS-backed store keeps all
  * key state on-heap). */
class StreamMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = Paths.get(s"target/test-stream-merge/$name")
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

  private val batch1: String = osc(
    s"""<modify>${node(1, 2, 10.5, 20.5)}</modify>
       |<create>${node(5, 1, 1.0, 2.0)}</create>""".stripMargin)
  private val batch2: String = osc(
    s"""<modify>${node(1, 3, 11.0, 21.0)}</modify>
       |<delete><node id="2" version="2" timestamp="2024-02-01T00:00:00Z" visible="false"/>
       |<node id="5" version="2" timestamp="2024-02-01T00:00:00Z" visible="false" lat="0" lon="0"/></delete>""".stripMargin)

  private def nodeState(root: String): Map[Long, (Double, Double)] =
    SnapshotTable.load(spark, s"$root/nodes").read()
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("streamed foreachBatch MERGE equals batch catch-up (RocksDB state store)") {
    val changes = fresh("changes")
    Files.write(Paths.get(changes, "000000001.osc"), batch1.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(changes, "000000002.osc"), batch2.getBytes(StandardCharsets.UTF_8))
    def base = Seq((1L, 0.0, 0.0), (2L, 5.0, 5.0), (3L, 7.0, 7.0))
      .toDF("node_id", "lon", "lat")

    val rootB = fresh("batch")
    SnapshotTable.create(spark, s"$rootB/nodes", base, Seq("node_id"))
    new Replicator(spark, rootB).catchUp(changes)

    val rootS = fresh("stream")
    SnapshotTable.create(spark, s"$rootS/nodes", base, Seq("node_id"))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = ChangeStream.fromChangeDir(spark, changes)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", fresh("ckpt"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (winners: Dataset[ChangeOp], _: Long) =>
          val nodeOps = winners.toDF()
            .filter(col("kind") === "node")
            .select(col("id").as("node_id"), col("lon"), col("lat"),
              (col("action") === "delete").as("deleted"))
          SnapshotTable.load(spark, s"$rootS/nodes")
            .mergeInto(nodeOps, Seq("node_id"), deleteMarker = Some("deleted"))
          ()
        }
        .start()
      q.awaitTermination(180000)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    val expect = Map(1L -> (11.0, 21.0), 3L -> (7.0, 7.0))
    assert(nodeState(rootB) === expect)
    assert(nodeState(rootS) === expect)
  }

  test("streamed three-layer replication equals batch catch-up") {
    def wayXml(id: Long, v: Int, refs: Seq[Long]): String =
      s"""<way id="$id" version="$v" timestamp="2024-01-0${v}T00:00:00Z">""" +
        refs.map(r => s"""<nd ref="$r"/>""").mkString + "</way>"
    def relXml(id: Long, v: Int, members: Seq[(String, Long, String)]): String =
      s"""<relation id="$id" version="$v" timestamp="2024-01-0${v}T00:00:00Z">""" +
        members.map { case (t, r, ro) => s"""<member type="$t" ref="$r" role="$ro"/>""" }
          .mkString + "</relation>"
    val b1 = osc(
      s"""<modify>${node(1, 2, 10.5, 20.5)}</modify>
         |<create>${wayXml(20, 1, Seq(2, 3))}${relXml(200, 1, Seq(("way", 20L, "a")))}</create>""".stripMargin)
    val b2 = osc(
      """<delete><way id="20" version="2" timestamp="2024-02-01T00:00:00Z" visible="false"/>
        |<relation id="200" version="2" timestamp="2024-02-01T00:00:00Z" visible="false"/></delete>""".stripMargin)
    val changes = fresh("changes3")
    Files.write(Paths.get(changes, "000000001.osc"), b1.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(changes, "000000002.osc"), b2.getBytes(StandardCharsets.UTF_8))

    def mkRoot(name: String): String = {
      val root = fresh(name)
      SnapshotTable.create(spark, s"$root/nodes",
        Seq((1L, 0.0, 0.0), (2L, 5.0, 5.0), (3L, 7.0, 7.0))
          .toDF("node_id", "lon", "lat"), Seq("node_id"))
      SnapshotTable.create(spark, s"$root/ways", Seq(
        (10L, "1;2;3",
          "LINESTRING(0.0000000 0.0000000, 5.0000000 5.0000000, 7.0000000 7.0000000)"))
        .toDF("way_id", "members", "wkt"), Seq("way_id"))
      SnapshotTable.create(spark, s"$root/rels",
        Seq((100L, "way/10/outer")).toDF("rel_id", "members"), Seq("rel_id"))
      root
    }

    val rootB = mkRoot("batch3")
    new Replicator(spark, rootB).catchUp(changes)

    val rootS = mkRoot("stream3")
    val replS = new Replicator(spark, rootS)
    val q = ChangeStream.fromChangeDir(spark, changes)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", fresh("ckpt3"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (winners: Dataset[ChangeOp], _: Long) =>
        replS.applyOps(winners.toDF()); ()
      }
      .start()
    q.awaitTermination(180000)

    def state(root: String): (Map[Long, (Double, Double)], Map[Long, (String, String)], Map[Long, String]) = {
      val r = new Replicator(spark, root)
      (nodeState(root),
        r.ways.read().as[(Long, String, String)].collect()
          .map(x => x._1 -> (x._2, x._3)).toMap,
        r.rels.read().as[(Long, String)].collect().toMap)
    }
    val (bn, bw, br) = state(rootB)
    val (sn, sw, sr) = state(rootS)
    assert(sn === bn)
    assert(sw === bw)
    assert(sr === br)
    // and the merged geometry reflects the moved node through the
    // stale-way rebuild on BOTH faces
    assert(bw(10L)._2 ===
      "LINESTRING(10.5000000 20.5000000, 5.0000000 5.0000000, 7.0000000 7.0000000)")
  }
}
