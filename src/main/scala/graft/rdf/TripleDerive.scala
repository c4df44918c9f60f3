package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** osm2rdf-equivalent triple derivation as a DataFrame transform —
  * replaces the reference's osm2rdf subprocess + TTL text IR
  * (/root/reference/src/osm/Osm2ttl.cpp:38-133,
  * tests/data/node.ttl golden family) with in-plan derivation:
  * type / geometry (7-decimal WKT per
  * /root/reference/src/osm/Node.cpp:26-51) / timestamp / tag triples /
  * facts-count (node.ttl:32) — all unioned into one (s, p, o) sink.
  */
object TripleDerive {

  /** Triples for upserted nodes: `ops` needs (id, lon, lat, ts);
    * `tags` is the (kind,id,k,v) tag table. */
  def nodeTriples(ops: DataFrame, tags: DataFrame): DataFrame = {
    val base = ops.withColumn("s", concat(lit("osmnode:"), col("id")))
    val typeT = base.select(col("s"), lit("rdf:type").as("p"), lit("osm:node").as("o"))
    val geomT = base.select(col("s"), lit("geo:asWKT").as("p"),
      concat(lit("POINT("), format_string("%.7f", col("lon")), lit(" "),
        format_string("%.7f", col("lat")), lit(")")).as("o"))
    val tsT = base.select(col("s"), lit("osmmeta:timestamp").as("p"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("o"))
    val nodeTags = tags.filter(col("kind") === "node")
      .select(col("id").as("tag_id"), col("k"), col("v"))
    val tagT = base.join(nodeTags, col("id") === col("tag_id"))
      .select(col("s"), concat(lit("osmkey:"), col("k")).as("p"), col("v").as("o"))
    val factsT = base.join(nodeTags, col("id") === col("tag_id"), "left")
      .groupBy(col("s"))
      .agg(sum(when(col("tag_id").isNotNull, 1L).otherwise(0L)).as("n"))
      .select(col("s"), lit("osm2rdf:facts").as("p"), col("n").cast("string").as("o"))
    typeT.union(geomT).union(tsT).union(tagT).union(factsT)
  }

  /** The hasGeometry link family: parent triple `osmnode:N
    * geo:hasGeometry osm2rdfgeom:osm_node_N` plus the linked geometry
    * subject's own `geo:asWKT` triple — the shape that drives the
    * reference's sequential link state machine
    * (/root/reference/src/osm/OsmChangeHandler.cpp:577-660). */
  def linkedNodeTriples(nodes: DataFrame): DataFrame = {
    val base = nodes.select(
      concat(lit("osmnode:"), col("node_id")).as("s"),
      lit("geo:hasGeometry").as("p"),
      concat(lit("osm2rdfgeom:osm_node_"), col("node_id")).as("o"))
    val geom = nodes.select(
      concat(lit("osm2rdfgeom:osm_node_"), col("node_id")).as("s"),
      lit("geo:asWKT").as("p"),
      concat(lit("POINT("), format_string("%.7f", col("lon")), lit(" "),
        format_string("%.7f", col("lat")), lit(")")).as("o"))
    base.unionByName(geom)
  }

  /** P5: relevant-triple filter with link propagation
    * (/root/reference/src/osm/OsmChangeHandler.cpp:577-660,
    * util/TtlHelper.cpp:40-60). The reference's one-pass `currentLink`
    * state machine over the sequential TTL file becomes two set-oriented
    * semi-joins: (1) keep relevant-namespace (P4) triples whose subject
    * id is in the insert set; (2) follow the hasGeometry link edge —
    * keep triples whose subject equals the object of a kept link triple. */
  def filterRelevant(triples: DataFrame, insertIds: DataFrame): DataFrame = {
    val kept1 = triples
      .filter(col("s").startsWith("osmnode:"))
      .withColumn("sid", regexp_extract(col("s"), "(\\d+)$", 1).cast("long"))
      .join(insertIds, col("sid") === col("id"), "left_semi")
      .drop("sid")
    val linkObjs = kept1.filter(col("p") === "geo:hasGeometry")
      .select(col("o").as("link_o")).distinct()
    val kept2 = triples.join(linkObjs, col("s") === col("link_o"), "left_semi")
    kept1.unionByName(kept2)
  }
}
