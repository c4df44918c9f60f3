package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Distributed triangle counting with DEGREE-ordered edge orientation
  * (the compact-forward / Cohen MapReduce formulation): orient every
  * undirected edge from its lower to its higher endpoint under the
  * total order (degree, id), build wedges by one equi-join on the
  * pivot, close them with a semi-join back to the oriented edge set.
  *
  * Why degree order and not id order: wedge fan-out at a vertex is
  * C(out-degree, 2). Under id orientation a hub of degree d can keep
  * all d edges outgoing and fans O(d²) wedges — a scale-killer on a
  * power-law web graph. Under (degree, id) orientation every wedge
  * pivots on its LOWEST-degree vertex, which bounds any vertex's
  * out-degree by O(√m) on an m-edge graph, so total wedge rows are
  * O(m^1.5) worst case and near-linear on real link graphs. Each
  * triangle {x,y,z} with x<y<z in the order materializes exactly once,
  * as the wedge (x; y,w=z) closed by the directed edge y→z.
  *
  * Reference semantics: the same count as the id-oriented formulation
  * (q107); the orientation changes the plan's fan-out, not the answer.
  */
object Triangles {

  private def dkey(d: Column, v: Column): Column = struct(d.as("d"), v.as("v"))

  /** Orient a DISTINCT undirected edge set `(u, v)` (u ≠ v, one row per
    * unordered pair) low→high under (degree, id). Output columns:
    * `src`, `dst`, plus `dk` = (degree(dst), dst) — carried so the
    * wedge join can order its two legs without re-joining degrees.
    * Two shuffles: the degree aggregate and the (reused) join on each
    * endpoint; the degree table shuffles on vertex id, never collected. */
  def orientByDegree(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("x"))
      .unionAll(edges.select(col("v").as("x")))
      .groupBy(col("x")).agg(F.count(lit(1)).as("d"))
    val uFirst = dkey(col("du"), col("u")) < dkey(col("dv"), col("v"))
    edges
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, dkey(col("dv"), col("v")))
          .otherwise(dkey(col("du"), col("u"))).as("dk"))
  }

  /** Wedge rows (u, v, w) of an oriented edge set: both (u,v) and
    * (u,w) are directed edges and v precedes w in the (degree, id)
    * order. Exposed separately so tests can assert the fan-out bound
    * under a planted hub. */
  def wedges(oriented: DataFrame): DataFrame =
    oriented.as("a").join(oriented.as("b"),
        col("a.src") === col("b.src") && col("a.dk") < col("b.dk"))
      .select(col("a.src").as("u"), col("a.dst").as("v"), col("b.dst").as("w"))

  /** Triangle count of a DISTINCT undirected edge set `(u, v)`.
    * One row, column `n_triangles`. */
  def count(edges: DataFrame): DataFrame = {
    val o = orientByDegree(edges)
    wedges(o).join(o.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"), "left_semi")
      .agg(F.count(lit(1)).as("n_triangles"))
  }
}
