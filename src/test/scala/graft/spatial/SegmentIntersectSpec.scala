package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** q149's intersection predicate vs JTS ground truth, exhaustively over
  * a small integer grid — the grid forces every boundary family the
  * sign arithmetic alone cannot decide: collinear overlaps, collinear
  * disjoint, endpoint touches, T-junctions, axis-parallel pairs, and
  * degenerate point-segments. Integer coordinates keep the double
  * arithmetic exact, so this is a true semantics check, not a
  * tolerance comparison. */
class SegmentIntersectSpec extends AnyFunSuite {

  private val gf = new GeometryFactory()
  private def geom(x1: Double, y1: Double, x2: Double, y2: Double) =
    if (x1 == x2 && y1 == y2) gf.createPoint(new Coordinate(x1, y1))
    else gf.createLineString(Array(new Coordinate(x1, y1), new Coordinate(x2, y2)))

  test("predicate == JTS intersects on every segment pair of the 0..3 grid") {
    val coords = for {
      x1 <- 0 to 3; y1 <- 0 to 3; x2 <- 0 to 3; y2 <- 0 to 3
    } yield (x1.toDouble, y1.toDouble, x2.toDouble, y2.toDouble)
    // 256 segments incl. 16 degenerate points -> 65k ordered pairs
    var checked = 0
    var hits = 0
    var collinearPairs = 0
    for ((px, py, qx, qy) <- coords; (ax, ay, bx, by) <- coords) {
      val expected = geom(px, py, qx, qy).intersects(geom(ax, ay, bx, by))
      val got = SegmentPredicate.intersects(px, py, qx, qy, ax, ay, bx, by)
      assert(got == expected,
        s"($px,$py)-($qx,$qy) vs ($ax,$ay)-($bx,$by): predicate=$got jts=$expected")
      checked += 1
      if (expected) hits += 1
      val d1 = (qx - px) * (ay - py) - (qy - py) * (ax - px)
      val d2 = (qx - px) * (by - py) - (qy - py) * (bx - px)
      if (d1 == 0 && d2 == 0) collinearPairs += 1
    }
    assert(checked == 65536)
    // the families the predicate's bbox guard exists for really occur
    assert(hits > 1000, s"grid produced only $hits intersecting pairs")
    assert(collinearPairs > 1000,
      s"grid produced only $collinearPairs collinear pairs")
  }

  test("non-grid spot checks: near-miss, touch, and skew crossings") {
    // strictly disjoint but bbox-overlapping (the refine must reject)
    assert(SegmentPredicate.bboxOverlap(0, 0, 2, 2, 1.5, 0, 2, 0.4))
    assert(!SegmentPredicate.intersects(0, 0, 2, 2, 1.5, 0, 2, 0.4))
    // proper skew crossing
    assert(SegmentPredicate.intersects(0, 0, 2, 2, 0, 2, 2, 0))
    // endpoint touch at a non-lattice point
    assert(SegmentPredicate.intersects(0, 0, 1, 0.5, 1, 0.5, 3, 0))
    // collinear, gap along the shared line
    assert(!SegmentPredicate.intersects(0, 0, 1, 1, 2, 2, 3, 3))
  }
}
