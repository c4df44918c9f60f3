package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

class CellIndexSpec extends AnyFunSuite with graft.PropHelpers {
  import CellIndex._

  val lonGen: Gen[Double] = Gen.chooseNum(-180.0, 180.0)
  val latGen: Gen[Double] = Gen.chooseNum(-90.0, 90.0)
  val resGen: Gen[Int] = Gen.chooseNum(0, 15)

  test("cellAt round-trips through bounds") {
    forAll(lonGen, latGen, resGen) { (lon, lat, r) =>
      val c = cellAt(lon, lat, r)
      val (x0, y0, x1, y1) = bounds(c)
      assert(lon >= x0 - 1e-9 && lon <= x1 + 1e-9)
      assert(lat >= y0 - 1e-9 && lat <= y1 + 1e-9)
      assert(res(c) === r)
    }
  }

  test("containment is monotone across resolutions: parent contains child point") {
    forAll(lonGen, latGen, Gen.chooseNum(1, 15)) { (lon, lat, r) =>
      val fine = cellAt(lon, lat, r)
      val coarse = cellAt(lon, lat, r - 1)
      assert(parent(fine) === coarse)
    }
  }

  test("parentAt/children are inverse") {
    forAll(lonGen, latGen, Gen.chooseNum(0, 14)) { (lon, lat, r) =>
      val c = cellAt(lon, lat, r)
      assert(children(c).forall(ch => parent(ch) === c))
    }
  }

  test("kRing symmetry: b in kRing(a) iff a in kRing(b)") {
    forAll(lonGen, latGen, Gen.chooseNum(2, 15), Gen.chooseNum(1, 3)) { (lon, lat, r, k) =>
      val a = cellAt(lon, lat, r)
      kRing(a, k).foreach { b =>
        assert(kRing(b, k).contains(a), s"asymmetric ring at res=$r k=$k")
      }
    }
  }

  test("kRing size is (2k+1)^2 away from poles, wraps at antimeridian") {
    val c = cellAt(179.9, 0.0, 8) // at the antimeridian edge
    assert(kRing(c, 1).size === 9)
    assert(kRing(c, 1).distinct.size === 9)
    val pole = cellAt(0.0, 89.9, 8) // top row: rows beyond pole dropped
    assert(kRing(pole, 1).size === 6)
  }

  test("coverGeometry covers every point of the geometry's vertices") {
    val gf = new GeometryFactory()
    forAll(Gen.chooseNum(-170.0, 160.0), Gen.chooseNum(-80.0, 70.0),
      Gen.chooseNum(0.1, 8.0), Gen.chooseNum(0.1, 8.0)) { (x0, y0, w, h) =>
      val poly = gf.createPolygon(Array(
        new Coordinate(x0, y0), new Coordinate(x0 + w, y0),
        new Coordinate(x0 + w, y0 + h), new Coordinate(x0, y0 + h),
        new Coordinate(x0, y0)))
      val r = coverRes(poly)
      val cover = coverGeometry(poly, r).toSet
      // every vertex must land in a covered cell
      poly.getCoordinates.foreach { co =>
        assert(cover.contains(cellAt(co.x, co.y, r)),
          s"vertex (${co.x},${co.y}) not covered at res $r")
      }
      // fan-out bounded: coverRes keeps multiplicity small
      assert(cover.size <= 16, s"cover size ${cover.size} too large at res $r")
    }
  }

  test("cover at finer res is a refinement: parents of fine cover ⊆ coarse cover is not required, but point-cover agreement holds") {
    val gf = new GeometryFactory()
    val poly = gf.createPolygon(Array(
      new Coordinate(10, 10), new Coordinate(12, 10),
      new Coordinate(12, 13), new Coordinate(10, 13), new Coordinate(10, 10)))
    val coarse = coverGeometry(poly, 6).toSet
    val fine = coverGeometry(poly, 9).toSet
    fine.foreach { f => assert(coarse.contains(parentAt(f, 6))) }
  }
}
