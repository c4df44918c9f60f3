package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-core decomposition (fixed-k membership) by iterative
  * peeling: drop every vertex whose degree among the SURVIVING vertices
  * is below k, until a fixpoint — the standard crawl-graph denoising /
  * community-seed primitive (a vertex is in the k-core iff it survives).
  *
  * Shape per round: two semi-joins restrict the edge set to surviving
  * endpoints, one map-side-combined count builds degrees, one filter
  * peels — all equi-joins on the vertex key, so at crawl scale every
  * round reuses the edge table's hash partitioning and nothing ever
  * sorts or broadcasts the graph. The survivor frame is
  * localCheckpoint'd each round (q49/q119's treatment) so the logical
  * plan stays O(1) across rounds instead of growing a 4x/round DAG.
  *
  * Rounds are bounded by `maxRounds`, FAIL-LOUD (IllegalStateException)
  * if the fixpoint isn't reached — the caller picks a bound proven for
  * its graph family; the paired oracle unrolls the same number of
  * rounds, which is safe because the peel step is idempotent at the
  * fixpoint.
  */
object KCore {

  /** Vertices of the k-core of the undirected simple graph `edges`
    * (columns u, v; each undirected edge once), with their in-core
    * degree. Returns (node, deg). */
  def membership(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("u"), col("v")).cache()
    val ends = e.select(col("u").as("x")).unionByName(e.select(col("v").as("x")))
    var surv = ends.distinct().localCheckpoint()
    var n = surv.count()
    var rounds = 0
    var stable = false
    while (!stable) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"k-core peel did not converge in $maxRounds rounds (still $n vertices)")
      val e2 = e
        .join(surv.withColumnRenamed("x", "u"), Seq("u"), "left_semi")
        .join(surv.withColumnRenamed("x", "v"), Seq("v"), "left_semi")
      val deg = e2.select(col("u").as("x")).unionByName(e2.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
      val next = deg.filter(col("d") >= k).select(col("x")).localCheckpoint()
      val m = next.count()
      stable = m == n
      surv = next
      n = m
      rounds += 1
    }
    val e2 = e
      .join(surv.withColumnRenamed("x", "u"), Seq("u"), "left_semi")
      .join(surv.withColumnRenamed("x", "v"), Seq("v"), "left_semi")
    val out = e2.select(col("u").as("node")).unionByName(e2.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    e.unpersist()
    out
  }
}
