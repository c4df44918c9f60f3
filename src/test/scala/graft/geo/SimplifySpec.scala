package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class SimplifySpec extends AnyFunSuite {

  test("collinear midpoints vanish, corners survive") {
    val xs = Array(0.0, 1.0, 2.0, 2.0, 2.0, 1.0, 0.0, 0.0, 0.0)
    val ys = Array(0.0, 0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 1.0, 0.0)
    val (sx, sy) = Simplify.douglasPeucker(xs, ys, 1e-7)
    assert(sx.toSeq === Seq(0.0, 2.0, 2.0, 0.0, 0.0))
    assert(sy.toSeq === Seq(0.0, 0.0, 2.0, 2.0, 0.0))
  }

  test("deviation above eps is kept, below eps dropped") {
    val xs = Array(0.0, 5.0, 10.0)
    val bump = Array(0.0, 0.5, 0.0)
    val (kx, _) = Simplify.douglasPeucker(xs, bump, 0.1)
    assert(kx.length === 3)
    val (dx, _) = Simplify.douglasPeucker(xs, bump, 1.0)
    assert(dx.toSeq === Seq(0.0, 10.0))
  }

  test("agrees with JTS DouglasPeuckerSimplifier on random polylines") {
    // both keep a section's farthest vertex iff its distance is
    // STRICTLY greater than the tolerance, so with an identical
    // recursion they must agree vertex-for-vertex
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    import org.locationtech.jts.simplify.DouglasPeuckerSimplifier
    val gf = new GeometryFactory()
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 50) {
      val n = 4 + rnd.nextInt(20)
      val xs = Array.fill(n)((rnd.nextInt(100) - 50).toDouble)
      val ys = Array.fill(n)((rnd.nextInt(100) - 50).toDouble)
      val eps = 0.5 + rnd.nextInt(20)
      val line = gf.createLineString(
        xs.zip(ys).map { case (x, y) => new Coordinate(x, y) })
      val want = DouglasPeuckerSimplifier.simplify(line, eps).getCoordinates
      val (gx, gy) = Simplify.douglasPeucker(xs, ys, eps)
      assert(gx.toSeq === want.map(_.x).toSeq && gy.toSeq === want.map(_.y).toSeq,
        s"eps=$eps line=${line.toText}")
    }
  }

  test("degenerate inputs pass through") {
    val (x1, y1) = Simplify.douglasPeucker(Array(1.0), Array(2.0), 0.1)
    assert(x1.toSeq === Seq(1.0) && y1.toSeq === Seq(2.0))
    // zero-length chord (closed two-point ring) falls back to radial distance
    val (x2, _) = Simplify.douglasPeucker(
      Array(0.0, 3.0, 0.0), Array(0.0, 0.0, 0.0), 0.1)
    assert(x2.toSeq === Seq(0.0, 3.0, 0.0))
  }
}
