package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import graft.SparkTestBase
import graft.geo.GeoFunctions
import graft.osm.{ChangeOp, Replicator}
import graft.tables.SnapshotTable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming IVM of an AGGREGATE view (q80's count-delta rule driven
  * from a stream): each trigger maintains a stored tile-count table
  * with n' = n − removed + added computed against the PRE-merge node
  * layer, then merges the layer itself. After the stream drains, the
  * maintained view must equal a from-scratch rollup of the batch
  * catch-up's final layer. */
class StreamTileSpec extends SparkTestBase {
  import spark.implicits._

  private val Res = 2 // coarse tiles: several nodes share one

  private def fresh(name: String): String = {
    val p = Paths.get(s"target/test-stream-tiles/$name")
    SnapshotTable.deleteRecursively(p)
    Files.createDirectories(p)
    p.toString
  }

  private def osc(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<osmChange version="0.6" generator="t">$body</osmChange>""".stripMargin

  private def node(id: Long, v: Int, lon: Double, lat: Double): String =
    s"""<node id="$id" version="$v" timestamp="2024-01-0${v}T00:00:00Z" lat="$lat" lon="$lon"/>"""

  private def base = Seq(
    (1L, 10.0, 10.0), (2L, 12.0, 11.0),    // same coarse tile
    (3L, -120.0, 40.0), (4L, -121.0, 41.0),
    (5L, 100.0, -30.0)).toDF("node_id", "lon", "lat")

  private def tileOf = GeoFunctions.cellAt(col("lon"), col("lat"), Res)

  private def mkRoot(name: String): String = {
    val root = fresh(name)
    SnapshotTable.create(spark, s"$root/nodes", base, Seq("node_id"))
    SnapshotTable.create(spark, s"$root/tiles",
      base.groupBy(tileOf.as("tile")).agg(count(lit(1)).as("n")), Seq("tile"))
    root
  }

  test("streamed count-delta tile view equals the batch rollup") {
    val changes = fresh("changes")
    // b1: move node 1 across the world (tile change), add node 6 next
    // to node 5; b2: delete node 2, move node 6 again
    val b1 = osc(
      s"""<modify>${node(1, 2, -119.0, 39.0)}</modify>
         |<create>${node(6, 1, 101.0, -31.0)}</create>""".stripMargin)
    val b2 = osc(
      s"""<modify>${node(6, 2, 10.0, 12.0)}</modify>
         |<delete><node id="2" version="2" timestamp="2024-02-01T00:00:00Z" visible="false" lat="0" lon="0"/></delete>""".stripMargin)
    Files.write(Paths.get(changes, "000000001.osc"), b1.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(changes, "000000002.osc"), b2.getBytes(StandardCharsets.UTF_8))

    val rootB = mkRoot("batch")
    new Replicator(spark, rootB).catchUp(changes)

    val rootS = mkRoot("stream")
    val q = ChangeStream.fromChangeDir(spark, changes)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", fresh("ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (winners: Dataset[ChangeOp], _: Long) =>
        val ops = winners.toDF().filter(col("kind") === "node")
          .select(col("id").as("node_id"), col("lon"), col("lat"),
            (col("action") === "delete").as("deleted"))
        val nodesTbl = SnapshotTable.load(spark, s"$rootS/nodes")
        val pre = nodesTbl.read()
        val touched = ops.select(col("node_id")).distinct()
        val removed = pre.join(touched, Seq("node_id"), "left_semi")
          .groupBy(tileOf.as("tile")).agg(count(lit(1)).as("r"))
        val added = ops.filter(!col("deleted"))
          .groupBy(tileOf.as("tile")).agg(count(lit(1)).as("a"))
        val tilesTbl = SnapshotTable.load(spark, s"$rootS/tiles")
        val delta = removed.join(added, Seq("tile"), "full_outer")
          .join(tilesTbl.read(), Seq("tile"), "left")
          .select(col("tile"),
            (coalesce(col("n"), lit(0L)) - coalesce(col("r"), lit(0L)) +
              coalesce(col("a"), lit(0L))).as("n"))
          .withColumn("deleted", col("n") <= 0)
        tilesTbl.mergeInto(delta, Seq("tile"), deleteMarker = Some("deleted"))
        nodesTbl.mergeInto(ops, Seq("node_id"), deleteMarker = Some("deleted"))
        ()
      }
      .start()
    q.awaitTermination(180000)

    def tiles(root: String): Map[Long, Long] =
      SnapshotTable.load(spark, s"$root/tiles").read()
        .as[(Long, Long)].collect().toMap
    val want = SnapshotTable.load(spark, s"$rootB/nodes").read()
      .groupBy(tileOf.as("tile")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(want.nonEmpty)
    assert(tiles(rootS) === want, "maintained view != batch rollup")
    // the batch root's UNTOUCHED tile table must differ (proves the
    // stream actually maintained something)
    assert(tiles(rootS) !== tiles(rootB))
  }
}
