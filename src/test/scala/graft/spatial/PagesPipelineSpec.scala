package graft.spatial

import graft.SparkTestBase
import graft.synth.{PagesSynth, SynthUniverse}
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** North-rule flagship shape, full stack from the `pages` table:
  * pages.html -> extracted text -> gazetteer geo-entities -> cell
  * encode -> PIP join against the OSM-derived polygon layer. The join
  * output is re-verified ROW BY ROW with an independent JTS containment
  * check against the closed-form rectangles (not the engine's own
  * refine path). */
class PagesPipelineSpec extends SparkTestBase {

  test("pages -> entities -> PIP join: every emitted match is truly inside its polygon") {
    val pages = PagesSynth.pages(spark, sfSmoke)
    // entity extraction from the EXTRACTED text (pages.text), doc id
    // recovered from the url — the real ingest path, not the documents
    // shortcut
    val pts = pages
      .select(regexp_extract(col("url"), "(\\d+)$", 1).cast("long").as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("entity"))
      .filter(col("entity").isin(SynthUniverse.Gazetteer: _*))
      .withColumn("hlon", TextFunctions.hash60(col("entity")))
      .withColumn("hlat", TextFunctions.hash60(concat(lit("lat:"), col("entity"))))
      .select(col("doc_id"), col("entity"),
        ((col("hlon") % 320000) / 1000.0 - 160.0 + (col("doc_id") % 97) * 0.03).as("lon"),
        ((col("hlat") % 150000) / 1000.0 - 75.0 + (col("doc_id") * 7 % 89) * 0.03).as("lat"))
    val polys = SpatialJoin.polygons(
      SynthUniverse.wayMembers(spark, sfSmoke), SynthUniverse.nodes(spark, sfSmoke))
    val out = SpatialJoin.pipJoin(pts, polys, res = 6)
      .select(col("doc_id"), col("entity"), col("way_id"), col("lon"), col("lat"))
      .collect()
    assert(out.nonEmpty)

    // independent JTS verification against the rectangle formulas
    val ways = SynthUniverse.ways(spark, sfSmoke)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val gf = new GeometryFactory()
    out.foreach { r =>
      val (x0, y0, w, h) = ways(r.getLong(2))
      val poly = gf.createPolygon(Array(
        new Coordinate(x0, y0), new Coordinate(x0 + w, y0),
        new Coordinate(x0 + w, y0 + h), new Coordinate(x0, y0 + h),
        new Coordinate(x0, y0)))
      val pt = gf.createPoint(new Coordinate(r.getDouble(3), r.getDouble(4)))
      assert(poly.covers(pt),
        s"false positive: doc=${r.getLong(0)} way=${r.getLong(2)}")
    }

    // completeness vs an independent O(n*m)-style check on a sample:
    // every (point, way) containment found by brute force must be in out
    val outSet = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val samplePts = pts.limit(50).collect()
    samplePts.foreach { p =>
      ways.foreach { case (wid, (x0, y0, w, h)) =>
        val inside = p.getDouble(2) >= x0 && p.getDouble(2) <= x0 + w &&
          p.getDouble(3) >= y0 && p.getDouble(3) <= y0 + h
        if (inside)
          assert(outSet.contains((p.getLong(0), p.getString(1), wid)),
            s"missed match: doc=${p.getLong(0)} way=$wid")
      }
    }
  }
}
