package graft.rdf

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Row-for-row golden vs the reference's osm2rdf output for node 1
  * (/root/reference/tests/data/node.ttl:21-37 — the "first node on
  * OpenStreetMap" fixture): type, timestamp, all 9 tags, facts count,
  * hasGeometry link + linked POINT WKT, and the degenerate
  * convex_hull/envelope/obb polygons, every object byte-identical
  * (7-decimal WKT, xsd lexical forms without the datatype suffix —
  * the engine types objects structurally, not textually). */
class NodeTtlGoldenSpec extends SparkTestBase {

  test("node 1 triple derivation matches node.ttl row for row") {
    import scala.jdk.CollectionConverters._
    val opsSchema = StructType(Seq(
      StructField("id", LongType), StructField("lon", DoubleType),
      StructField("lat", DoubleType), StructField("ts", TimestampType)))
    val ops = spark.createDataFrame(
      Seq(Row(1L, 13.5690032, 42.7957187,
        java.sql.Timestamp.from(java.time.Instant.parse("2024-07-07T19:48:37Z")))).asJava,
      opsSchema)
    val goldenTags = Seq(
      "tower:type" -> "communication",
      "tower:construction" -> "lattice",
      "note" -> "This is the very first node on OpenStreetMap.",
      "name" -> "Monte Piselli - San Giacomo",
      "frequency" -> "105.5 MHz",
      "description" -> "Radio Subasio",
      "communication:radio" -> "fm",
      "man_made" -> "mast",
      "communication:microwave" -> "yes")
    val tagsSchema = StructType(Seq(
      StructField("kind", StringType), StructField("id", LongType),
      StructField("k", StringType), StructField("v", StringType)))
    val tags = spark.createDataFrame(
      goldenTags.map { case (k, v) => Row("node", 1L, k, v) }.asJava, tagsSchema)
    val nodes = ops.select(col("id").as("node_id"), col("lon"), col("lat"))

    val got = (
      // base families (the engine's extra denormalized direct-WKT row is
      // not part of osm2rdf's normalized shape — excluded here)
      TripleDerive.nodeTriples(ops, tags).filter(col("p") =!= "geo:asWKT")
        .unionByName(TripleDerive.linkedNodeTriples(nodes))
        .unionByName(TripleDerive.nodeGeomTriples(nodes)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    val degeneratePoly = "POLYGON((" +
      Seq.fill(5)("13.5690032 42.7957187").mkString(",") + "))"
    val want: Set[(String, String, String)] =
      goldenTags.map { case (k, v) => ("osmnode:1", s"osmkey:$k", v) }.toSet ++ Set(
        ("osmnode:1", "rdf:type", "osm:node"),
        ("osmnode:1", "osmmeta:timestamp", "2024-07-07T19:48:37"),
        ("osmnode:1", "osm2rdf:facts", "9"),
        ("osmnode:1", "geo:hasGeometry", "osm2rdfgeom:osm_node_1"),
        ("osm2rdfgeom:osm_node_1", "geo:asWKT", "POINT(13.5690032 42.7957187)"),
        ("osmnode:1", "osm2rdfgeom:convex_hull", degeneratePoly),
        ("osmnode:1", "osm2rdfgeom:envelope", degeneratePoly),
        ("osmnode:1", "osm2rdfgeom:obb", degeneratePoly))

    assert(got.size === 17)
    assert(got === want,
      s"missing=${want -- got}\nextra=${got -- want}")
  }
}
