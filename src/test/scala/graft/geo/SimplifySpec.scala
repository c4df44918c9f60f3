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

  test("degenerate inputs pass through") {
    val (x1, y1) = Simplify.douglasPeucker(Array(1.0), Array(2.0), 0.1)
    assert(x1.toSeq === Seq(1.0) && y1.toSeq === Seq(2.0))
    // zero-length chord (closed two-point ring) falls back to radial distance
    val (x2, _) = Simplify.douglasPeucker(
      Array(0.0, 3.0, 0.0), Array(0.0, 0.0, 0.0), 0.1)
    assert(x2.toSeq === Seq(0.0, 3.0, 0.0))
  }
}
