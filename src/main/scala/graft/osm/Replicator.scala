package graft.osm

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.SnapshotTable

/** The replication catch-up loop (reference entry point 2,
  * /root/reference/src/osm/OsmUpdater.cpp:41-115) over snapshot tables:
  *
  *  - ST1 start-offset resolution: user seq ▸ user timestamp (as-of
  *    lookup on the server-state table) ▸ last applied seq + 1;
  *  - ST2 batch-collapse: ALL pending change files merge into one
  *    logical batch, W1 dedup-to-latest applied across the window —
  *    only the final version of each object is applied;
  *  - ST3 up-to-date short-circuit (no pending files → no-op);
  *  - ST4 exactly-once application: MERGE INTO is idempotent by key and
  *    the applied-seq checkpoint commits AFTER the merge;
  *  - ST5 duplicate/late ops collapse inside the W1 window.
  */
class Replicator(spark: SparkSession, root: String) {

  val nodes: SnapshotTable = SnapshotTable.load(spark, s"$root/nodes")
  private val ckpt = Paths.get(root, "applied_seq")

  def appliedSeq: Option[Int] =
    if (Files.exists(ckpt))
      Some(new String(Files.readAllBytes(ckpt), StandardCharsets.UTF_8).trim.toInt)
    else None

  /** ST1: resolve the first sequence number to apply.
    * `serverStates` is (seq INT, ts TIMESTAMP) — cf. state.txt parsing
    * (/root/reference/src/osm/OsmDataFetcher.cpp:163-202). */
  def decideStartSeq(userSeq: Option[Int], userTs: Option[java.sql.Timestamp],
      serverStates: DataFrame): Int =
    userSeq.getOrElse {
      userTs.flatMap { t =>
        // backward walk becomes a degenerate as-of join: max seq at ts<=t
        val r = serverStates.filter(col("ts") <= lit(t)).agg(max(col("seq"))).head()
        if (r.isNullAt(0)) None else Some(r.getInt(0))
      }.orElse(appliedSeq.map(_ + 1)).getOrElse(0)
    }

  /** Apply every pending change file under `changeDir` as ONE merged
    * batch. Returns the number of winning ops applied (0 = up to date). */
  def catchUp(changeDir: String): Long = {
    import spark.implicits._
    val from = appliedSeq.map(_ + 1).getOrElse(0)
    val all = OscReader.read(spark, s"$changeDir/*.osc*")
      .filter(col("seq") >= from)
    if (all.isEmpty) return 0L // ST3

    val ops = all.toDF()
    val winners = ChangePipeline.dedupLatest(ops) // ST2+ST5, whole window
    val nodeOps = winners.filter(col("kind") === "node")
      .select(col("id").as("node_id"),
        col("lon").as("lon"), col("lat").as("lat"),
        (col("action") === "delete").as("deleted"))
    val applied = nodeOps.count()
    nodes.mergeInto(nodeOps, Seq("node_id"), deleteMarker = Some("deleted")) // ST4
    val maxSeq = ops.agg(max(col("seq"))).head().getInt(0)
    Files.createDirectories(ckpt.getParent)
    Files.write(ckpt, maxSeq.toString.getBytes(StandardCharsets.UTF_8))
    applied
  }
}
