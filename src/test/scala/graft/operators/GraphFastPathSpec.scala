package graft.operators

import graft.{Bench, SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The r6 DriverGraph fast paths (bounded-collect BFS / incremental
  * BFS maintenance) must be row-identical to the distributed round
  * loops they replace — toggled via spark.graft.graphDriverEdgeCap
  * (0 = force the distributed path), same convention as the CC
  * union-find fast path. */
class GraphFastPathSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  private def withCap[A](cap: Long)(f: => A): A = {
    spark.conf.set("spark.graft.graphDriverEdgeCap", cap.toString)
    try f finally spark.conf.unset("spark.graft.graphDriverEdgeCap")
  }

  test("bfs-family queries: driver fast path equals distributed rounds") {
    for (q <- Seq("q161_bfs_hops", "q264_scc_mutual", "q253_incremental_bfs",
        "q251_harmonic_centrality", "q274_temporal_reach",
        "q291_hyperball")) {
      val fast = rows(SparkEntry.queries(q)(spark, sfSmoke))
      Bench.clearState(spark)
      val dist = withCap(0L) { rows(SparkEntry.queries(q)(spark, sfSmoke)) }
      Bench.clearState(spark)
      assert(fast == dist, s"$q fast path diverged from the distributed loop")
      assert(fast.nonEmpty, s"$q returned no rows")
    }
  }

  test("IncrementalBfs.maintain fast path equals distributed on random rewires") {
    for (seed <- Seq(5L, 23L)) {
      val n = 300L
      val docs = spark.range(n).select(col("id").as("doc_id"))
      val baseLinks = docs.select(col("doc_id").as("src"),
        explode(array((1 to 3).map(k =>
          pmod(col("doc_id") * 31 + k * 7, lit(n))): _*)).as("dst"))
      val postDocs = docs.filter(pmod(col("doc_id") + seed, lit(13)) =!= 5)
      val postLinksAll = postDocs.select(col("doc_id").as("src"),
        explode(array((1 to 3).map(k =>
          when(pmod(col("doc_id") + seed, lit(7)) === 3,
            pmod(col("doc_id") * 37 + k * 11 + seed, lit(n)))
            .otherwise(pmod(col("doc_id") * 31 + k * 7, lit(n)))): _*)).as("dst"))
      val changedSrc = docs
        .filter(pmod(col("doc_id") + seed, lit(7)) === 3 ||
          pmod(col("doc_id") + seed, lit(13)) === 5)
        .select(col("doc_id").as("src"))
      val seeds = docs.filter(col("doc_id") % 50 === 0)
      // stored = exact base-graph BFS, computed through maintain's own
      // contract inputs (distributed bfs via an empty change batch
      // would be circular — use a driver reference instead)
      val baseEdges = baseLinks.collect().map(r => (r.getLong(0), r.getLong(1)))
      val storedRef = DriverGraph.bfs(
        seeds.collect().map(_.getLong(0)), baseEdges, 4).toArray
      val stored = DriverGraph.toHopsDf(spark, storedRef)
      val seedsPost = seeds.join(postDocs, Seq("doc_id"), "left_semi")
      val fast = rows(IncrementalBfs.maintain(postDocs, baseLinks,
        postLinksAll, changedSrc, stored, seedsPost, 4))
      Bench.clearState(spark)
      val dist = withCap(0L) { rows(IncrementalBfs.maintain(postDocs, baseLinks,
        postLinksAll, changedSrc, stored, seedsPost, 4)) }
      Bench.clearState(spark)
      assert(fast == dist, s"maintain fast path diverged for seed $seed")
      assert(fast.nonEmpty)
    }
  }
}
