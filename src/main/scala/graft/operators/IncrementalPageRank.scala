package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of the 2-iteration integer PageRank
  * (graft.queries.GraphQueries q90) under an edge-level change batch —
  * the graph-axis member of the IVM family (q60/q71/q80/q81/q95/q101/
  * q110/q124/q136).
  *
  * Key fact: with a FIXED iteration count K from a uniform init, a
  * node's rank is a function of its K-hop in-neighborhood only. So a
  * batch that rewires the out-edges of a touched source set perturbs
  *
  *   rank1 only at  D  = dst(changed edges)          (1-hop impact)
  *   rank2 only at  A  = D ∪ out_post(D)             (2-hop impact)
  *
  * and every node outside A keeps its STORED rank2 bit-for-bit. The
  * proof is the same cancellation the queries' scaladoc states: for
  * x ∉ A no in-edge of x changed (x ∉ D) and no in-neighbor's rank1
  * changed (else x ∈ out_post(D)).
  *
  * Scale shape: every step is an equi-join or a map-side-combined
  * aggregate keyed on the node id — at corpus scale the link table is
  * hash-partitioned on src once and D/A ride broadcast-sized deltas.
  * Nothing ever recomputes outside A; the stored layers pass through
  * by ONE anti-join.
  *
  * Integer contract (identical to q90's): contributions are
  * `rank div 3` (out-degree is exactly 3 for every living node), the
  * damping step multiplies before dividing
  * (`150000 + (85 * in_sum) div 100`), so aggregation order cannot
  * diverge by an ulp on any engine.
  */
object IncrementalPageRank {

  private val Uniform3 = 1000000L / 3L // rank0 div 3, out-degree 3

  /** @param postDocs    living nodes after the batch: (doc_id)
    * @param baseLinks   pre-batch edges: (src, dst)
    * @param postLinks   post-batch edges: (src, dst)
    * @param touchedSrc  sources whose out-edges changed (updated or
    *                    deleted docs): (src)
    * @param rank1Stored stored 1-iteration ranks on the base graph:
    *                    (doc_id, rank1)
    * @param rank2Stored stored 2-iteration ranks on the base graph:
    *                    (doc_id, rank2)
    * @return (doc_id, rank_micro) — equals a full 2-iteration
    *         recompute on the post graph over postDocs
    */
  def maintain(
      postDocs: DataFrame,
      baseLinks: DataFrame,
      postLinks: DataFrame,
      touchedSrc: DataFrame,
      rank1Stored: DataFrame,
      rank2Stored: DataFrame): DataFrame = {
    // D: every dst an old or new edge of a touched source points at
    val changedDst = baseLinks.join(touchedSrc, "src").select(col("dst"))
      .unionByName(postLinks.join(touchedSrc, "src").select(col("dst")))
      .distinct()
    // rank1 rebuilt ONLY at D, from post in-edges (uniform init, so
    // in_sum is just count * (1e6 div 3))
    val in1 = postLinks.join(changedDst, "dst")
      .groupBy(col("dst"))
      .agg((count(lit(1)) * lit(Uniform3)).as("in_sum1"))
    val rank1New = changedDst.join(in1, Seq("dst"), "left")
      .select(col("dst").as("doc_id"),
        (lit(150000L) + expr("(85 * coalesce(in_sum1, 0L)) div 100")).as("rank1"))
    val rank1Final = rank1Stored
      .join(changedDst.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(rank1New)
    // A: D plus everything D points at in the post graph
    val affected = changedDst
      .unionByName(
        postLinks.join(changedDst.withColumnRenamed("dst", "src"), "src")
          .select(col("dst")))
      .distinct()
    // rank2 rebuilt ONLY at A, folding rank1Final over post in-edges
    val in2 = postLinks.join(affected, "dst")
      .join(rank1Final.withColumnRenamed("doc_id", "src"), "src")
      .groupBy(col("dst"))
      .agg(sum(expr("rank1 div 3")).as("in_sum2"))
    val rank2New = affected.join(in2, Seq("dst"), "left")
      .select(col("dst").as("doc_id"),
        (lit(150000L) + expr("(85 * coalesce(in_sum2, 0L)) div 100")).as("rank_micro"))
    val affectedIds = affected.withColumnRenamed("dst", "doc_id")
    postDocs.join(rank2Stored, Seq("doc_id"))
      .join(affectedIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("rank2").as("rank_micro"))
      .unionByName(
        postDocs.join(rank2New, Seq("doc_id"))
          .select(col("doc_id"), col("rank_micro")))
  }
}
