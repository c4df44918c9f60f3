package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental 2-iteration PageRank must (a) land exactly on a
  * full recompute of the post-change graph, (b) touch NOTHING outside
  * the proven 2-hop impact halo — proven by poisoning the stored rank
  * of an unaffected node and watching the poison survive — and (c)
  * overwrite every affected node — poison one and watch it vanish. */
class IncrementalPageRankSpec extends SparkTestBase {

  private def df2(rows: Seq[(Long, Long)], c1: String, c2: String): DataFrame = {
    import spark.implicits._
    rows.toDF(c1, c2)
  }
  private def docsDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  private val n = 12L
  private val allIds = (0L until n)
  // every node links +1,+2,+3 (mod 12): out-degree exactly 3
  private def ring(ids: Seq[Long], offs: Long => Seq[Long]): Seq[(Long, Long)] =
    ids.flatMap(s => offs(s).map(o => (s, (s + o) % n)))

  private def rank2Full(docs: DataFrame, links: DataFrame): DataFrame = {
    val r0 = docs.select(col("doc_id"), lit(1000000L).as("rank"))
    queries.GraphQueries.step(docs, links,
      queries.GraphQueries.step(docs, links, r0))
  }

  private def collectRanks(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // touched = {0}, rerouted +4,+5,+6: D = {1..6}, A = D ∪ out(D) = {1..9};
  // unaffected = {0, 10, 11}
  private lazy val base = df2(ring(allIds, _ => Seq(1, 2, 3)), "src", "dst")
  private lazy val post = df2(
    ring(Seq(0L), _ => Seq(4, 5, 6)) ++ ring(allIds.drop(1), _ => Seq(1, 2, 3)),
    "src", "dst")
  private lazy val docs = docsDf(allIds)
  private lazy val touched = docsDf(Seq(0L)).withColumnRenamed("doc_id", "src")
  private lazy val r1Base = rank2FullR1(docs, base)
  private lazy val r2Base = rank2Full(docs, base).withColumnRenamed("rank", "rank2")

  private def rank2FullR1(d: DataFrame, l: DataFrame): DataFrame =
    queries.GraphQueries.step(d, l,
      d.select(col("doc_id"), lit(1000000L).as("rank")))
      .withColumnRenamed("rank", "rank1")

  test("incremental update equals a full recompute on the post graph") {
    val got = collectRanks(operators.IncrementalPageRank.maintain(
      docs, base, post, touched, r1Base, r2Base))
    val want = collectRanks(rank2Full(docs, post)
      .select(col("doc_id"), col("rank").as("rank_micro")))
    assert(got == want)
    // the rewiring genuinely moved some ranks (non-vacuous)
    val stored = collectRanks(r2Base.select(col("doc_id"), col("rank2")))
    assert(allIds.exists(i => stored(i) != want(i)))
  }

  test("stored ranks outside the 2-hop halo pass through untouched (poison survives)") {
    val poisoned = r2Base.withColumn("rank2",
      when(col("doc_id") === 10L, lit(424242L)).otherwise(col("rank2")))
    val got = collectRanks(operators.IncrementalPageRank.maintain(
      docs, base, post, touched, r1Base, poisoned))
    val want = collectRanks(rank2Full(docs, post)
      .select(col("doc_id"), col("rank").as("rank_micro")))
    assert(got(10L) == 424242L, "unaffected node 10 must pass the stored value through")
    assert((got - 10L) == (want - 10L))
  }

  test("affected nodes are rebuilt (poison inside the halo vanishes)") {
    val poisoned = r2Base.withColumn("rank2",
      when(col("doc_id") === 5L, lit(424242L)).otherwise(col("rank2")))
    val got = collectRanks(operators.IncrementalPageRank.maintain(
      docs, base, post, touched, r1Base, poisoned))
    val want = collectRanks(rank2Full(docs, post)
      .select(col("doc_id"), col("rank").as("rank_micro")))
    assert(got == want, "node 5 is in dst(changed) and must be recomputed")
  }

  test("deletions drop the node and its out-edges; survivors still exact") {
    // delete node 11: its out-edges vanish, node 0 keeps base edges
    val postDocs = docsDf(allIds.filterNot(_ == 11L))
    val postDel = df2(ring(allIds.filterNot(_ == 11L), _ => Seq(1, 2, 3)), "src", "dst")
    val touchedDel = docsDf(Seq(11L)).withColumnRenamed("doc_id", "src")
    val got = collectRanks(operators.IncrementalPageRank.maintain(
      postDocs, base, postDel, touchedDel, r1Base, r2Base))
    val want = collectRanks(rank2Full(postDocs, postDel)
      .select(col("doc_id"), col("rank").as("rank_micro")))
    assert(got == want)
    assert(!got.contains(11L))
  }
}
