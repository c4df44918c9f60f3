package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Douglas-Peucker ring simplification — the vector-tile emission leg:
  * tile geometries ship at tolerance proportional to the tile's cell
  * edge, so coarse zooms carry O(corners) vertices instead of the full
  * ring. (The reference ships geometry text verbatim from osm2rdf —
  * /root/reference/tests/data/way.ttl:52-56 — and has no tiling layer;
  * this is a north-rule extension of the raster/vector tile family.)
  *
  * Runs per-row over the already-assembled (xs, ys) ring arrays — no
  * shuffle, parallel over whatever partitioning the ring table has.
  */
object Simplify {

  /** Classic stack-based DP over an open polyline (endpoints pinned;
    * for a closed ring pass it closed — first==last — and the closure
    * vertex is preserved). Returns the kept (xs, ys). */
  def douglasPeucker(xs: Array[Double], ys: Array[Double],
      eps: Double): (Array[Double], Array[Double]) = {
    val n = xs.length
    if (n <= 2) return (xs, ys)
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (a, b) = stack.head
      stack = stack.tail
      if (b - a > 1) {
        val ax = xs(a); val ay = ys(a)
        val dx = xs(b) - ax; val dy = ys(b) - ay
        val len = math.sqrt(dx * dx + dy * dy)
        var maxD = -1.0; var idx = -1
        var i = a + 1
        while (i < b) {
          val d =
            if (len == 0.0) math.hypot(xs(i) - ax, ys(i) - ay)
            else math.abs((xs(i) - ax) * dy - (ys(i) - ay) * dx) / len
          if (d > maxD) { maxD = d; idx = i }
          i += 1
        }
        if (maxD > eps) {
          keep(idx) = true
          stack = (a, idx) :: (idx, b) :: stack
        }
      }
    }
    val ix = (0 until n).filter(keep)
    (ix.map(xs).toArray, ix.map(ys).toArray)
  }

  /** Column face: (xs, ys, eps) -> struct(xs, ys) of the kept vertices. */
  val simplifyUdf: (Column, Column, Double) => Column = {
    val f = udf((xs: Seq[Double], ys: Seq[Double], eps: Double) => {
      val (sx, sy) = douglasPeucker(xs.toArray, ys.toArray, eps)
      (sx.toSeq, sy.toSeq)
    })
    (xs, ys, eps) => f(xs, ys, org.apache.spark.sql.functions.lit(eps))
  }
}
