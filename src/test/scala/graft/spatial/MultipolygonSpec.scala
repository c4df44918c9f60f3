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

  test("relation with only inner rings never matches") {
    val (ix, iy) = ring(0, 0, 10, 10)
    val rings = Seq((7L, "inner", ix, iy)).toDF("rel_id", "role", "xs", "ys")
    val pts = Seq((1L, "a", 5.0, 5.0)).toDF("doc_id", "entity", "lon", "lat")
    assert(SpatialJoin.pipJoinMulti(pts, rings, res = 4).isEmpty)
  }
}
