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

  /** Triangles of `edges` containing at least one edge of `marked`
    * (both DISTINCT undirected `(u, v)` sets, `marked ⊆ edges`), each
    * triangle counted EXACTLY once — attributed to its
    * lexicographically-smallest marked edge. A triangle with 2 or 3
    * marked edges would be double/triple-counted by the naive
    * per-marked-edge common-neighbor sum; the ordering rule (each side
    * edge must be unmarked OR a marked edge strictly greater than the
    * attributing one) is the standard exactness fix.
    *
    * Cost is O(|marked| × endpoint degree), never a full recount: the
    * two adjacency probes are equi-joins of the marked set against the
    * edge list keyed by one endpoint — at scale the edge table stays
    * hash-partitioned on that key and both probes reuse the exchange.
    * One row, column `n_touch`. */
  def countTouching(edges: DataFrame, marked: DataFrame): DataFrame = {
    val tagged = edges.join(
        marked.select(col("u"), col("v"), lit(true).as("ism0")),
        Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("ism0"), lit(false)).as("ism"))
    // both orientations so each endpoint's neighborhood is one equi-join
    val adj = tagged.select(col("u").as("x"), col("v").as("y"),
        col("u").as("eu"), col("v").as("ev"), col("ism"))
      .unionByName(tagged.select(col("v").as("x"), col("u").as("y"),
        col("u").as("eu"), col("v").as("ev"), col("ism")))
    def allowed(p: String): Column =
      !col(s"$p.ism") ||
        (col(s"$p.eu") > col("ma")) ||
        (col(s"$p.eu") === col("ma") && col(s"$p.ev") > col("mb"))
    marked.select(col("u").as("ma"), col("v").as("mb"))
      .join(adj.as("p"), col("p.x") === col("ma"))
      .join(adj.as("q"),
        col("q.x") === col("mb") && col("q.y") === col("p.y"))
      .filter(allowed("p") && allowed("q"))
      .agg(F.count(lit(1)).as("n_touch"))
  }

  /** Incremental-maintenance delta for a global triangle count under an
    * edge-set change `epre → epost`: `tri_add` = triangles of the post
    * graph touching an added edge, `tri_del` = triangles of the pre
    * graph touching a removed edge; the maintained count is
    * `n_pre + tri_add − tri_del`. Work is bounded by the changed edges'
    * neighborhoods (the IVM shape), never a recount of either graph. */
  def deltaCount(epre: DataFrame, epost: DataFrame): DataFrame = {
    val added = epost.join(epre, Seq("u", "v"), "left_anti")
    val removed = epre.join(epost, Seq("u", "v"), "left_anti")
    countTouching(epost, added).select(col("n_touch").as("tri_add"))
      .crossJoin(countTouching(epre, removed).select(col("n_touch").as("tri_del")))
  }
}
