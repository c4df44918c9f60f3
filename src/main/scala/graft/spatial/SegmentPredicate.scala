package graft.spatial

/** The exact boundary-inclusive segment-intersection predicate behind
  * q149 — scalar mirror of the Column expression tree (same operation
  * order), factored out so the property spec can exercise the SAME
  * arithmetic the query plans.
  *
  * Segments PQ and AB intersect iff their bboxes overlap AND neither
  * segment's endpoints lie strictly on one side of the other's line
  * (two straddle tests). The bbox guard settles the boundary cases the
  * raw signs cannot: collinear segments (all four signs zero) meet iff
  * their boxes do, and a degenerate point-segment meets a segment iff
  * it sits on its line inside its box. Cf. the classic CLRS
  * SEGMENTS-INTERSECT with ON-SEGMENT folded into the bbox test.
  */
object SegmentPredicate {
  def bboxOverlap(px: Double, py: Double, qx: Double, qy: Double,
      ax: Double, ay: Double, bx: Double, by: Double): Boolean =
    math.min(px, qx) <= math.max(ax, bx) &&
      math.min(ax, bx) <= math.max(px, qx) &&
      math.min(py, qy) <= math.max(ay, by) &&
      math.min(ay, by) <= math.max(py, qy)

  def intersects(px: Double, py: Double, qx: Double, qy: Double,
      ax: Double, ay: Double, bx: Double, by: Double): Boolean = {
    val d1 = (qx - px) * (ay - py) - (qy - py) * (ax - px)
    val d2 = (qx - px) * (by - py) - (qy - py) * (bx - px)
    val d3 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    val d4 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    bboxOverlap(px, py, qx, qy, ax, ay, bx, by) &&
      math.min(d1, d2) <= 0 && math.max(d1, d2) >= 0 &&
      math.min(d3, d4) <= 0 && math.max(d3, d4) >= 0
  }
}
