package graft.rdf

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GeomTripleSpec extends SparkTestBase {

  test("q42 JTS geometry stats match the closed rectangle formulas") {
    val df = graft.SparkEntry.queries("q42_way_geoms")(spark, sfSmoke)
    val ways = graft.synth.SynthUniverse.ways(spark, sfSmoke)
    val expected = ways.select(col("way_id"),
      round((col("w") * 2 + col("h") * 2) * 10000).cast("long").as("e_len"),
      round((col("x0") + col("w") / 2) * 10000).cast("long").as("e_cx"),
      round(col("w") * col("h") * 10000).cast("long").as("e_area"),
      round(col("w") * 10000).cast("long").as("e_w"),
      round(col("h") * 10000).cast("long").as("e_h"))
    val bad = df.join(expected, "way_id").filter(
      col("length_e4") =!= col("e_len") ||
        col("cx_e4") =!= col("e_cx") ||
        col("hull_area_e4") =!= col("e_area") ||
        col("obb_area_e4") =!= col("e_area") ||
        col("env_maxx_e4") - col("env_minx_e4") =!= col("e_w") ||
        col("env_maxy_e4") - col("env_miny_e4") =!= col("e_h"))
      .count()
    assert(bad === 0)
    assert(df.count() === ways.count())
  }

  test("q43/q44 member triples: 3 (way) / 4 (rel) triples per member row") {
    val wm = graft.synth.SynthUniverse.wayMembers(spark, sfSmoke).count()
    val rm = graft.synth.SynthUniverse.relMembers(spark, sfSmoke).count()
    assert(graft.SparkEntry.queries("q43_way_member_triples")(spark, sfSmoke).count() === wm * 3)
    assert(graft.SparkEntry.queries("q44_rel_member_triples")(spark, sfSmoke).count() === rm * 4)
  }

  test("q45 two-hop delete removes exactly the doomed subjects and their geometry links") {
    val all = TripleDerive.linkedNodeTriples(
      graft.synth.SynthUniverse.nodes(spark, sfSmoke))
    val remaining = graft.SparkEntry.queries("q45_two_hop_delete")(spark, sfSmoke)
    // no doomed subject survives, and every surviving hasGeometry link's
    // object subject also survives (closure consistency)
    val links = remaining.filter(col("p") === "geo:hasGeometry")
      .select(col("o").as("lnk"))
    val orphan = links.join(
      remaining.select(col("s")), col("lnk") === col("s"), "left_anti").count()
    assert(orphan === 0)
    assert(remaining.count() < all.count())
    assert(remaining.count() % 2 === 0) // link + geom triples pair up
  }

  test("q46 xmlDecode round-trips with the reference backslash quirk") {
    val df = graft.SparkEntry.queries("q46_xml_decode")(spark, sfSmoke)
    val row = df.filter(col("dec").contains("\\\"")).limit(1).collect()
    assert(row.nonEmpty, "quirked backslash-escaped quote missing")
    val enc = row.head.getAs[String]("enc")
    assert(enc.contains("&quot;") && enc.contains("&apos;") && enc.contains("&amp;"))
  }
}
