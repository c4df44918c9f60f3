package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Shared plumbing for the bounded DRIVER fast paths of the iterative
  * graph operators (r6 optimization wave 2 — same contract as
  * [[ConnectedComponents.DefaultDriverEdgeCap]] / knnBroadcastLimit):
  * a closed-form or touched-component graph whose edge set fits under
  * a constant cap is collected once and solved by the IDENTICAL
  * recurrence in tight JVM code, skipping 2k+ rounds of fixed-overhead
  * Spark jobs (each round = join + distinct + checkpoint ≈ 0.2-0.5 s
  * of scheduler/exchange latency for microseconds of actual work on
  * these sizes — guide §1.2: fix the algorithmic shape first, and the
  * shape here IS "don't run a distributed round on 15k edges").
  *
  * The collect is bounded by the cap (default 1e6 edges), never
  * corpus-scale: bigger inputs take the unchanged distributed path,
  * so the 100 TB story is intact. Specs pin fast == distributed on
  * randomized graphs per operator.
  */
object DriverGraph {

  val DefaultEdgeCap = 1000000L

  /** Per-session override: spark.graft.graphDriverEdgeCap (0 disables
    * every driver graph fast path that routes through this helper). */
  def edgeCap(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.graphDriverEdgeCap")
      .map(_.toLong).getOrElse(DefaultEdgeCap)

  /** Collect a 2-long-column frame as edge pairs. Caller must have
    * bounded the size (count <= cap) first. */
  def collectEdges(df: DataFrame): Array[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))

  def collectIds(df: DataFrame): Array[Long] =
    df.collect().map(_.getLong(0))

  /** Multi-source K-bounded BFS over an adjacency list — the driver
    * mirror of the frontier⋈links round loop: hops = first round a
    * node is reached, seeds at 0, unreached absent. */
  def bfs(seeds: Array[Long], edges: Array[(Long, Long)], k: Int): scala.collection.mutable.LongMap[Long] = {
    val adj = new scala.collection.mutable.LongMap[scala.collection.mutable.ArrayBuffer[Long]]()
    edges.foreach { case (s, d) =>
      adj.getOrElseUpdate(s, new scala.collection.mutable.ArrayBuffer[Long]()) += d
    }
    val dist = new scala.collection.mutable.LongMap[Long]()
    var frontier = new scala.collection.mutable.ArrayBuffer[Long]()
    seeds.foreach { s => if (!dist.contains(s)) { dist.update(s, 0L); frontier += s } }
    var h = 1L
    while (h <= k && frontier.nonEmpty) {
      val next = new scala.collection.mutable.ArrayBuffer[Long]()
      frontier.foreach { u =>
        adj.get(u).foreach(_.foreach { v =>
          if (!dist.contains(v)) { dist.update(v, h); next += v }
        })
      }
      frontier = next
      h += 1
    }
    dist
  }

  /** (doc_id, hops) rows back to a small distributed frame — same
    * partition sizing as the CC fast path. */
  def toHopsDf(spark: SparkSession, rows: Array[(Long, Long)],
      names: (String, String) = ("doc_id", "hops")): DataFrame = {
    val schema = StructType(Seq(
      StructField(names._1, LongType, nullable = true),
      StructField(names._2, LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.toIndexedSeq.map(r => Row(r._1, r._2)),
        math.max(1, math.min(spark.sparkContext.defaultParallelism,
          1 + rows.length / 10000))), schema)
  }
}
