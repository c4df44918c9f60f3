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
}
