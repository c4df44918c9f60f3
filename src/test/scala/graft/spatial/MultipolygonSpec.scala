package graft.spatial

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Holes-aware multipolygon containment (osm2rdf GeometryHandler area
  * semantics re-expressed as compose-only Spark ops): in >=1 outer
  * ring AND in no inner ring of the same relation. */
class MultipolygonSpec extends SparkTestBase {
  import spark.implicits._

  private def ring(x0: Double, y0: Double, w: Double, h: Double) =
    (Seq(x0, x0 + w, x0 + w, x0, x0), Seq(y0, y0, y0 + h, y0 + h, y0))

  test("hole punches out containment; boundary of a hole counts as hole") {
    val (ox, oy) = ring(0, 0, 10, 10)
    val (ix, iy) = ring(4, 4, 2, 2)
    val rings = Seq(
      (1L, "outer", ox, oy),
      (1L, "inner", ix, iy),
      (2L, "outer", ox.map(_ + 20), oy))
      .toDF("rel_id", "role", "xs", "ys")
    val pts = Seq(
      (1L, "a", 1.0, 1.0),  // in outer, outside hole -> contained
      (2L, "b", 5.0, 5.0),  // inside hole -> excluded
      (3L, "c", 4.0, 5.0),  // ON hole boundary -> boundary-inclusive hole, excluded
      (4L, "d", 15.0, 5.0), // outside everything
      (5L, "e", 21.0, 5.0)) // rel 2 (no holes) -> contained
      .toDF("doc_id", "entity", "lon", "lat")
    val out = SpatialJoin.pipJoinMulti(pts, rings, res = 4)
      .select(col("doc_id"), col("rel_id"))
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 1L), (5L, 2L)))
  }

  test("even-odd variant handles island-in-hole nesting; role form pins its non-nested contract") {
    // outer 0..10, hole 2..8, island 4..6 inside the hole — the layout
    // the role predicate cannot express: an island point hits an outer
    // AND an inner ring, so 'outer AND no inner' excludes it, while
    // even-odd (3 containing rings) correctly includes it
    val (ox, oy) = ring(0, 0, 10, 10)
    val (hx, hy) = ring(2, 2, 6, 6)
    val (sx, sy) = ring(4, 4, 2, 2)
    val rings = Seq(
      (1L, "outer", ox, oy),
      (1L, "inner", hx, hy),
      (1L, "outer", sx, sy)) // island: a second outer nested in the hole
      .toDF("rel_id", "role", "xs", "ys")
    val pts = Seq(
      (1L, "a", 1.0, 1.0), // outer only (1 ring)        -> inside
      (2L, "b", 3.0, 3.0), // outer+hole (2 rings)       -> outside
      (3L, "c", 5.0, 5.0), // outer+hole+island (3)      -> inside
      (4L, "d", 15.0, 5.0)) // nothing                    -> outside
      .toDF("doc_id", "entity", "lon", "lat")
    val evenOdd = SpatialJoin.pipJoinMultiEvenOdd(pts, rings, res = 4)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(evenOdd === Set(1L, 3L))
    // and the documented limitation of the role form on this layout:
    // the island point is (wrongly, by nesting semantics) excluded —
    // pinned here so the contract stays explicit
    val roleForm = SpatialJoin.pipJoinMulti(pts, rings, res = 4)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(roleForm === Set(1L))
  }

  test("even-odd agrees with JTS symmetric-difference area semantics on nested rects") {
    // JTS reference: the even-odd region of a set of rings is the
    // symmetric difference of their polygons; covers() on that
    // geometry must agree with the distributed operator for interior
    // points (boundary conventions differ by construction)
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    def poly(x0: Double, y0: Double, w: Double, h: Double) =
      gf.createPolygon(Array(
        new Coordinate(x0, y0), new Coordinate(x0 + w, y0),
        new Coordinate(x0 + w, y0 + h), new Coordinate(x0, y0 + h),
        new Coordinate(x0, y0)))
    val rects = Seq((0.0, 0.0, 12.0, 12.0), (2.0, 2.0, 8.0, 8.0), (4.0, 4.0, 4.0, 4.0))
    val region = rects.map { case (a, b, c, d) => poly(a, b, c, d) }
      .map(_.asInstanceOf[org.locationtech.jts.geom.Geometry])
      .reduce(_ symDifference _)
    val rings = rects.zipWithIndex.map { case ((a, b, c, d), i) =>
      val (xs, ys) = ring(a, b, c, d)
      (1L, if (i == 1) "inner" else "outer", xs, ys)
    }.toDF("rel_id", "role", "xs", "ys")
    // interior probe grid (offset by 0.5 so no point sits on a ring edge)
    val pts = (for (x <- 0 until 14; y <- 0 until 14)
      yield ((x * 14 + y).toLong, "p", x + 0.5, y + 0.5))
      .toDF("doc_id", "entity", "lon", "lat")
    val got = SpatialJoin.pipJoinMultiEvenOdd(pts, rings, res = 4)
      .select(col("doc_id")).as[Long].collect().toSet
    val want = (for (x <- 0 until 14; y <- 0 until 14
      if region.covers(gf.createPoint(new Coordinate(x + 0.5, y + 0.5))))
      yield (x * 14 + y).toLong).toSet
    assert(got === want)
  }

  test("pipJoinMulti agrees with a JTS per-ring reference on random layouts") {
    // integer coordinates keep every cross product exact, so the
    // distributed cover-join + role-fold must agree with a driver-side
    // JTS reference EXACTLY, boundaries included
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val gf = new GeometryFactory()
    for (seed <- Seq(3L, 11L)) {
      val rnd = new scala.util.Random(seed)
      def rect(): (Seq[Double], Seq[Double]) = {
        val x0 = rnd.nextInt(80) - 40; val y0 = rnd.nextInt(60) - 30
        val w = 2 + rnd.nextInt(12); val h = 2 + rnd.nextInt(10)
        (Seq(x0, x0 + w, x0 + w, x0, x0).map(_.toDouble),
          Seq(y0, y0, y0 + h, y0 + h, y0).map(_.toDouble))
      }
      val ringRows = (0 until 30).map { i =>
        val (xs, ys) = rect()
        (i / 5L, if (i % 5 == 0) "outer" else "inner", xs, ys)
      }
      val ptRows = (0 until 150).map(i =>
        (i.toLong, "e", (rnd.nextInt(120) - 60).toDouble, (rnd.nextInt(90) - 45).toDouble))
      val got = SpatialJoin.pipJoinMulti(
          ptRows.toDF("doc_id", "entity", "lon", "lat"),
          ringRows.toDF("rel_id", "role", "xs", "ys"), res = 4)
        .select(col("doc_id"), col("rel_id"))
        .as[(Long, Long)].collect().toSet
      def poly(r: (Long, String, Seq[Double], Seq[Double])) =
        gf.createPolygon(r._3.zip(r._4).map { case (x, y) => new Coordinate(x, y) }.toArray)
      val want = (for {
        (did, _, px, py) <- ptRows
        rel <- ringRows.map(_._1).distinct
        rs = ringRows.filter(_._1 == rel)
        pt = gf.createPoint(new Coordinate(px, py))
        if rs.exists(r => r._2 == "outer" && poly(r).covers(pt)) &&
          !rs.exists(r => r._2 == "inner" && poly(r).covers(pt))
      } yield (did, rel)).toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("relation with only inner rings never matches") {
    val (ix, iy) = ring(0, 0, 10, 10)
    val rings = Seq((7L, "inner", ix, iy)).toDF("rel_id", "role", "xs", "ys")
    val pts = Seq((1L, "a", 5.0, 5.0)).toDF("doc_id", "entity", "lon", "lat")
    assert(SpatialJoin.pipJoinMulti(pts, rings, res = 4).isEmpty)
  }
}
