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
        val ax = xs(a); val ay = ys(a); val bx = xs(b); val by = ys(b)
        val dx = bx - ax; val dy = by - ay
        val len2 = dx * dx + dy * dy
        var maxD = -1.0; var idx = -1
        var i = a + 1
        while (i < b) {
          // distance to the SEGMENT (projection clamped to the chord's
          // endpoints), matching JTS DouglasPeuckerSimplifier — the
          // infinite-line distance under-measures vertices whose
          // projection falls outside [a, b] and over-simplifies
          val vx = xs(i) - ax; val vy = ys(i) - ay
          val d =
            if (len2 == 0.0) math.hypot(vx, vy)
            else {
              val t = (vx * dx + vy * dy) / len2
              if (t <= 0.0) math.hypot(vx, vy)
              else if (t >= 1.0) math.hypot(xs(i) - bx, ys(i) - by)
              else math.abs(vx * dy - vy * dx) / math.sqrt(len2)
            }
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
