package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental bounded-hop BFS must (a) land exactly on a full
  * recompute of the post-change graph, (b) pass stored distances
  * outside the union-graph halo through untouched — proven by
  * poisoning one and watching the poison survive — and (c) overwrite
  * every halo node — poison one and watch it vanish. The fixture makes
  * the delete case bite: removing an edge INCREASES a downstream
  * node's distance, the non-monotone direction a naive
  * insert-only-relaxation IVM gets wrong. */
class IncrementalBfsSpec extends SparkTestBase {

  private def df2(rows: Seq[(Long, Long)], c1: String, c2: String): DataFrame = {
    import spark.implicits._
    rows.toDF(c1, c2)
  }
  private def docsDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  // a directed path 0→1→2→3→4 plus a shortcut 0→3, and an isolated
  // far branch 10→11 unreachable from the seed; seed = {0}, K = 4.
  // Batch: node 0 is REWIRED to drop the 0→3 shortcut (keeps 0→1),
  // so d(3) worsens 1→3 and d(4) worsens 2→4 — the non-monotone case.
  private val ids = Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L)
  private lazy val docs = docsDf(ids)
  private lazy val base = df2(
    Seq((0L, 1L), (0L, 3L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)),
    "src", "dst")
  private lazy val post = df2(
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)),
    "src", "dst")
  private lazy val changed = docsDf(Seq(0L)).withColumnRenamed("doc_id", "src")
  private lazy val seeds = docsDf(Seq(0L))

  private def bfsFull(l: DataFrame): Map[Long, Long] = {
    var visited = seeds.select(col("doc_id"), lit(0L).as("hops"))
    var frontier = visited.select(col("doc_id"))
    for (h <- 1 to 4) {
      val next = frontier.join(l, frontier("doc_id") === l("src"))
        .select(col("dst").as("doc_id")).distinct()
        .join(visited.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(h.toLong).as("hops"))
      visited = visited.unionByName(next)
      frontier = next.select(col("doc_id"))
    }
    visited.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def run(stored: DataFrame): Map[Long, Long] =
    operators.IncrementalBfs.maintain(docs, base, post, changed, stored,
      seeds, 4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val storedBase = {
    import spark.implicits._
    bfsFull(base).toSeq.toDF("doc_id", "hops")
  }

  test("incremental BFS equals full recompute; distances WORSEN under the delete") {
    val got = run(storedBase)
    val want = bfsFull(post)
    assert(got === want)
    // the non-monotone direction actually fired
    val old = bfsFull(base)
    assert(old(3L) == 1L && want(3L) == 3L, s"d(3): ${old(3L)} -> ${want(3L)}")
    assert(old(4L) == 2L && want(4L) == 4L)
  }

  test("stored distances outside the halo pass through (poison survives); halo overwrites (poison dies)") {
    import spark.implicits._
    // node 11 is unreachable from D = old∪new dst(0) = {1, 3} in the
    // union graph — a poisoned stored row for it must ride the
    // anti-join through verbatim (a recompute would never emit it)
    val got = run(storedBase.unionByName(
      Seq((11L, 999L)).toDF("doc_id", "hops")))
    assert(got(11L) === 999L, "out-of-halo poison must survive the anti-join")
    // node 3 sits in the halo: its poisoned stored value must vanish
    val got2 = run(storedBase
      .withColumn("hops", when(col("doc_id") === 3L, 999L).otherwise(col("hops"))))
    assert(got2(3L) === 3L, "halo poison must be overwritten by the re-derive")
  }
}
