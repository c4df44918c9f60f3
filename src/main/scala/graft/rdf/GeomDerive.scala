package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.algorithm.MinimumDiameter
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** F17 geometry-derivation family — the osm2rdf GeometryHandler outputs
  * the reference treats as opaque golden text (centroid / envelope /
  * convex hull / OBB / length per /root/reference/tests/data/way.ttl:50-56,
  * node.ttl:34-37), re-derived in-engine with JTS over the ordered ring
  * reconstructed from way_members ⋈ nodes (J8 shape).
  *
  * Values are emitted e4-scaled (`round(v*10000)`) so the DuckDB oracle
  * can reproduce them from the closed rectangle formulas of the
  * synthetic universe while the engine runs the REAL JTS algorithms —
  * the 1e-12-scale FP noise of shoelace/rotating-calipers sits far
  * below the 5e-5 rounding boundary of the e4 grid.
  */
object GeomDerive {

  case class GeomStats(
      length_e4: Long,
      cx_e4: Long, cy_e4: Long,
      env_minx_e4: Long, env_miny_e4: Long,
      env_maxx_e4: Long, env_maxy_e4: Long,
      hull_area_e4: Long, obb_area_e4: Long)

  @transient private lazy val gf = new GeometryFactory()

  @inline private def e4(v: Double): Long = math.round(v * 10000.0)

  def stats(xs: Seq[Double], ys: Seq[Double]): GeomStats = {
    val coords = xs.zip(ys).map { case (x, y) => new Coordinate(x, y) }.toArray
    if (coords.isEmpty) return null // degenerate ring → null row, not a task kill
    val closed = if (coords.head == coords.last) coords else coords :+ coords.head
    val poly: org.locationtech.jts.geom.Geometry =
      if (closed.length >= 4) gf.createPolygon(closed)
      else if (coords.length >= 2) gf.createLineString(coords)
      else gf.createPoint(coords(0))
    val c = org.locationtech.jts.algorithm.Centroid.getCentroid(poly)
    val env = poly.getEnvelopeInternal
    val hull = poly.convexHull()
    val obb = new MinimumDiameter(poly).getMinimumRectangle
    GeomStats(
      e4(poly.getLength),
      e4(c.x), e4(c.y),
      e4(env.getMinX), e4(env.getMinY), e4(env.getMaxX), e4(env.getMaxY),
      e4(hull.getArea), e4(obb.getArea))
  }

  /** Column form over the (xs, ys) ring arrays of [[graft.spatial.SpatialJoin.polygons]]. */
  val statsUdf: (Column, Column) => Column = {
    val f = udf((xs: Seq[Double], ys: Seq[Double]) => stats(xs, ys))
    (xs, ys) => f(xs, ys)
  }

  // ---- byte-identical osm2rdf WKT emission (way.ttl golden family) ----

  @inline private def fmt(v: Double): String = "%.7f".formatLocal(java.util.Locale.ROOT, v)
  @inline private def pt(x: Double, y: Double): String = fmt(x) + " " + fmt(y)

  /** LINESTRING(...) of the ordered vertices, 7-decimal, no spaces
    * after commas (way.ttl:52). */
  def lineWkt(xs: Seq[Double], ys: Seq[Double]): String =
    xs.zip(ys).map { case (x, y) => pt(x, y) }
      .mkString("LINESTRING(", ",", ")")

  /** Envelope polygon in osm2rdf corner order (way.ttl:54):
    * (minx miny, minx maxy, maxx maxy, maxx miny, close). */
  def envelopeWkt(xs: Seq[Double], ys: Seq[Double]): String = {
    val (x0, x1, y0, y1) = (xs.min, xs.max, ys.min, ys.max)
    Seq(pt(x0, y0), pt(x0, y1), pt(x1, y1), pt(x1, y0), pt(x0, y0))
      .mkString("POLYGON((", ",", "))")
  }

  /** Open hull ring in boost::geometry's emission convention
    * (way.ttl:53): CLOCKWISE (y-up), starting at the vertex with
    * minimum x (then minimum y). JTS computes the hull; this
    * normalizes the ring's start and orientation. Shared by
    * [[hullWkt]] and the parity OBB's edge-0 alignment. */
  private def boostHullRing(xs: Seq[Double], ys: Seq[Double]): Array[Coordinate] = {
    val coords = xs.zip(ys).map { case (x, y) => new Coordinate(x, y) }.toArray
    val hull = gf.createMultiPointFromCoords(coords).convexHull()
    val cs = hull.getCoordinates
    // Polygon closes the ring (drop dup); Point/LineString don't
    val ring0 = if (cs.length > 1 && cs.head == cs.last) cs.dropRight(1) else cs
    // signed area > 0 => CCW in y-up; boost emits CW
    val area2 = ring0.indices.map { i =>
      val a = ring0(i); val b = ring0((i + 1) % ring0.length)
      a.x * b.y - b.x * a.y
    }.sum
    val cw = if (area2 > 0) ring0.reverse else ring0
    val start = cw.indices.minBy(i => (cw(i).x, cw(i).y))
    cw.drop(start) ++ cw.take(start)
  }

  /** Convex hull WKT, boost convention (way.ttl:53). */
  def hullWkt(xs: Seq[Double], ys: Seq[Double]): String = {
    val rot = boostHullRing(xs, ys)
    (rot :+ rot.head).map(c => pt(c.x, c.y)).mkString("POLYGON((", ",", "))")
  }

  /** osm2rdf length: 6-decimal fixed (std::to_string-style) of the JTS
    * line length (way.ttl:56 `"0.005285"`). */
  def lengthStr(xs: Seq[Double], ys: Seq[Double]): String = {
    val coords = xs.zip(ys).map { case (x, y) => new Coordinate(x, y) }.toArray
    val len = gf.createLineString(coords).getLength
    "%.6f".formatLocal(java.util.Locale.ROOT, len)
  }

  /** Minimum-area oriented bounding rectangle (JTS MinimumDiameter) —
    * corner ORDER is algorithm-specific, so goldens compare the corner
    * set and area, not the byte string. */
  def obbCorners(xs: Seq[Double], ys: Seq[Double]): Array[(Double, Double)] = {
    val coords = xs.zip(ys).map { case (x, y) => new Coordinate(x, y) }.toArray
    new MinimumDiameter(gf.createLineString(coords)).getMinimumRectangle
      .getCoordinates.dropRight(1).map(c => (c.x, c.y))
  }

  /** Reference-parity OBB (VERDICT r4 item 5, flag
    * `spark.graft.obbParity`): reproduces the reference's vendored
    * spatialjoin heuristic byte-for-byte on the osm2rdf golden
    * fixtures (way.ttl:55, node.ttl:37). Reverse-engineered from the
    * goldens: the box is ALIGNED WITH THE FIRST EDGE of the boost-
    * convention hull ring (CW, min-x start) — NOT the minimum-area
    * rectangle (the fixture's box is ~2.6x the JTS minimum) — with
    * corners emitted UR, LR, LL, UL in the rotated frame. */
  def obbParityCorners(xs: Seq[Double], ys: Seq[Double]): Array[(Double, Double)] = {
    val ring = boostHullRing(xs, ys)
    if (ring.length < 2) return Array.fill(4)((ring(0).x, ring(0).y))
    val ang = math.atan2(ring(1).y - ring(0).y, ring(1).x - ring(0).x)
    val (ca, sa) = (math.cos(-ang), math.sin(-ang))
    val rot = xs.zip(ys).map { case (x, y) => (x * ca - y * sa, x * sa + y * ca) }
    val minx = rot.map(_._1).min; val maxx = rot.map(_._1).max
    val miny = rot.map(_._2).min; val maxy = rot.map(_._2).max
    val corners = Array((maxx, maxy), (maxx, miny), (minx, miny), (minx, maxy))
    val (cb, sb) = (math.cos(ang), math.sin(ang))
    corners.map { case (x, y) => (x * cb - y * sb, x * sb + y * cb) }
  }

  /** OBB WKT: parity=true → the heuristic-parity ring (byte-identical
    * to the reference goldens); parity=false (default) → the JTS
    * minimum rectangle (tighter; the engine's documented divergence). */
  def obbWkt(xs: Seq[Double], ys: Seq[Double], parity: Boolean): String = {
    val distinct = xs.zip(ys).distinct
    val cs =
      if (distinct.length <= 1)
        Array.fill(4)(distinct.head) // degenerate: point 5-fold (node.ttl:37)
      else if (parity) obbParityCorners(xs, ys)
      else obbCorners(xs, ys)
    val ring = if (cs.length < 4) Array.fill(4)(cs.head) else cs
    (ring :+ ring.head).map { case (x, y) => pt(x, y) }
      .mkString("POLYGON((", ",", "))")
  }

  /** Way-side geometry-derivation triple family (the engine-surface
    * consumer of the parity flag): hull / envelope / obb WKT per way,
    * `parity` from `spark.graft.obbParity`. UDF is fine here — this is
    * the goldens-facing emission boundary, not a join hot path. */
  def wayGeomTriples(ways: DataFrame, parity: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, explode, lit}
    val f = udf((xs: Seq[Double], ys: Seq[Double]) =>
      if (xs == null || xs.isEmpty) null
      else Map(
        "convex_hull" -> hullWkt(xs, ys),
        "envelope" -> envelopeWkt(xs, ys),
        "obb" -> obbWkt(xs, ys, parity)))
    ways.select(concat(lit("osmway:"), col("way_id")).as("s"),
        explode(f(col("xs"), col("ys"))).as(Seq("fam", "o")))
      .select(col("s"), concat(lit("osm2rdfgeom:"), col("fam")).as("p"), col("o"))
  }

  /** Session flag for the parity OBB mode. */
  def obbParity(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.get("spark.graft.obbParity", "false").toBoolean
}
