package graft.rdf

import org.apache.spark.sql.Column
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
    val closed = if (coords.head == coords.last) coords else coords :+ coords.head
    val poly = gf.createPolygon(closed)
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
}
