package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** Byte-identical goldens vs osm2rdf's output for way 6177369
  * (/root/reference/tests/data/way.ttl:37-56): ordered LINESTRING,
  * convex hull in boost's CW/min-x emission convention, envelope corner
  * order, and 6-decimal length. The OBB corner ORDER is
  * algorithm-internal, so it is compared as a corner set + area. */
class WayTtlGoldenSpec extends AnyFunSuite {

  // the way's 9 member-node coordinates, in pos order (way.ttl:52)
  private val xs = Seq(1.5388551, 1.5390663, 1.5389817, 1.5386306,
    1.5393683, 1.5406269, 1.5407031, 1.5426687, 1.5427093)
  private val ys = Seq(42.5077891, 42.5077919, 42.5078050, 42.5077990,
    42.5086830, 42.5087285, 42.5087367, 42.5089421, 42.5091105)

  test("LINESTRING WKT matches way.ttl byte for byte") {
    assert(GeomDerive.lineWkt(xs, ys) ===
      "LINESTRING(1.5388551 42.5077891,1.5390663 42.5077919,1.5389817 42.5078050," +
        "1.5386306 42.5077990,1.5393683 42.5086830,1.5406269 42.5087285," +
        "1.5407031 42.5087367,1.5426687 42.5089421,1.5427093 42.5091105)")
  }

  test("convex hull matches way.ttl byte for byte (boost CW / min-x start)") {
    assert(GeomDerive.hullWkt(xs, ys) ===
      "POLYGON((1.5386306 42.5077990,1.5393683 42.5086830,1.5427093 42.5091105," +
        "1.5426687 42.5089421,1.5390663 42.5077919,1.5388551 42.5077891," +
        "1.5386306 42.5077990))")
  }

  test("envelope matches way.ttl byte for byte") {
    assert(GeomDerive.envelopeWkt(xs, ys) ===
      "POLYGON((1.5386306 42.5077891,1.5386306 42.5091105,1.5427093 42.5091105," +
        "1.5427093 42.5077891,1.5386306 42.5077891))")
  }

  test("length matches way.ttl (6-decimal)") {
    assert(GeomDerive.lengthStr(xs, ys) === "0.005285")
  }

  test("OBB is a valid oriented box, no looser than way.ttl's") {
    // osm2rdf's obb (way.ttl:55) comes from its vendored spatialjoin
    // heuristic and is NOT the minimum-area rectangle (its area is
    // ~2.6x larger than optimal on this fixture). The engine emits the
    // JTS minimum rectangle instead — assert it (a) contains every
    // vertex and (b) is at least as tight as the reference's box.
    // Intentional divergence, documented in SURVEY.md §8 (F17).
    val golden = Seq(
      (1.5409501, 42.5105785), (1.5427682, 42.5090613),
      (1.5404487, 42.5062818), (1.5386306, 42.5077990))
    def area(cs: Seq[(Double, Double)]): Double = math.abs(
      cs.indices.map { i =>
        val (ax, ay) = cs(i); val (bx, by) = cs((i + 1) % cs.length)
        ax * by - bx * ay
      }.sum / 2)
    val got = GeomDerive.obbCorners(xs, ys).toSeq
    assert(got.length === 4)
    assert(area(got) <= area(golden) + 1e-12, "engine OBB looser than reference's")
    // containment of every input vertex (tiny epsilon for FP edges)
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val box = gf.createPolygon((got :+ got.head).map { case (x, y) =>
      new org.locationtech.jts.geom.Coordinate(x, y) }.toArray).buffer(1e-9)
    xs.zip(ys).foreach { case (x, y) =>
      assert(box.covers(gf.createPoint(
        new org.locationtech.jts.geom.Coordinate(x, y))), s"($x,$y) outside OBB")
    }
  }

  test("parity-mode OBB is byte-identical to way.ttl:55") {
    assert(GeomDerive.obbWkt(xs, ys, parity = true) ===
      "POLYGON((1.5409501 42.5105785,1.5427682 42.5090613," +
        "1.5404487 42.5062818,1.5386306 42.5077990,1.5409501 42.5105785))")
  }

  test("parity-mode OBB of a degenerate point is node.ttl:37's 5-fold point") {
    val p = "13.5690032 42.7957187"
    val want = "POLYGON((" + Seq.fill(5)(p).mkString(",") + "))"
    assert(GeomDerive.obbWkt(Seq(13.5690032), Seq(42.7957187), parity = true) === want)
    assert(GeomDerive.obbWkt(Seq(13.5690032), Seq(42.7957187), parity = false) === want)
  }

  test("wayGeomTriples honors spark.graft.obbParity in BOTH modes") {
    val spark = graft.SparkTestBase.session
    import org.apache.spark.sql.functions.typedLit
    val ways = spark.range(1).selectExpr("6177369L AS way_id")
      .withColumn("xs", typedLit(xs)).withColumn("ys", typedLit(ys))
    def obbOf(parity: Boolean): String =
      GeomDerive.wayGeomTriples(ways, parity)
        .filter("p = 'osm2rdfgeom:obb'").collect()(0).getString(2)
    assert(obbOf(parity = true) ===
      "POLYGON((1.5409501 42.5105785,1.5427682 42.5090613," +
        "1.5404487 42.5062818,1.5386306 42.5077990,1.5409501 42.5105785))")
    // default mode emits the (tighter) JTS minimum rectangle
    assert(obbOf(parity = false) === GeomDerive.obbWkt(xs, ys, parity = false))
    // hull + envelope stay byte-identical to way.ttl in either mode
    val fams = GeomDerive.wayGeomTriples(ways, parity = true)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(fams("osm2rdfgeom:convex_hull") === GeomDerive.hullWkt(xs, ys))
    assert(fams("osm2rdfgeom:envelope") === GeomDerive.envelopeWkt(xs, ys))
  }
}
