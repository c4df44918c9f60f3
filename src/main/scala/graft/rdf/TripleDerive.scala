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

  /** J10 parity for ways: the FULL triple family the reference fetches
    * per stale way (type / geometry / timestamp / tags / facts,
    * /root/reference/src/sparql/QueryWriter.cpp:242-255,
    * src/osm/OsmDataFetcher.cpp:333-395) — same shape as
    * [[nodeTriples]] but over reconstructed ways. `ways` needs
    * (way_id, wkt, ts). */
  def wayTriples(ways: DataFrame, tags: DataFrame): DataFrame =
    objectTriples(ways, tags, "way", "osmway:", "osm:way", "way_id",
      geomCol = Some("wkt"))

  /** J10 parity for relations: type / timestamp / tags / facts (the
    * member family is [[relMemberTriples]]; relations carry no own
    * geometry triple here, matching the reference's per-relation
    * fetch). `rels` needs (rel_id, ts). */
  def relTriples(rels: DataFrame, tags: DataFrame): DataFrame =
    objectTriples(rels, tags, "relation", "osmrel:", "osm:relation", "rel_id",
      geomCol = None)

  private def objectTriples(objs: DataFrame, tags: DataFrame, kind: String,
      prefix: String, rdfType: String, idCol: String,
      geomCol: Option[String]): DataFrame = {
    val base = objs.withColumn("s", concat(lit(prefix), col(idCol)))
    val typeT = base.select(col("s"), lit("rdf:type").as("p"), lit(rdfType).as("o"))
    val tsT = base.select(col("s"), lit("osmmeta:timestamp").as("p"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("o"))
    val kindTags = tags.filter(col("kind") === kind)
      .select(col("id").as("tag_id"), col("k"), col("v"))
    val tagT = base.join(kindTags, col(idCol) === col("tag_id"))
      .select(col("s"), concat(lit("osmkey:"), col("k")).as("p"), col("v").as("o"))
    val factsT = base.join(kindTags, col(idCol) === col("tag_id"), "left")
      .groupBy(col("s"))
      .agg(sum(when(col("tag_id").isNotNull, 1L).otherwise(0L)).as("n"))
      .select(col("s"), lit("osm2rdf:facts").as("p"), col("n").cast("string").as("o"))
    val withGeom = geomCol match {
      case Some(g) => typeT.union(
        base.select(col("s"), lit("geo:asWKT").as("p"), col(g).as("o")))
      case None => typeT
    }
    withGeom.union(tsT).union(tagT).union(factsT)
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

  /** Degenerate per-node geometry-derivation triples — osm2rdf emits
    * convex_hull / envelope / obb for EVERY object, a point's being the
    * 5-fold repetition of itself
    * (/root/reference/tests/data/node.ttl:35-37). Byte-identical
    * 7-decimal formatting. */
  def nodeGeomTriples(nodes: DataFrame): DataFrame = {
    val pt = concat(format_string("%.7f", col("lon")), lit(" "),
      format_string("%.7f", col("lat")))
    val poly = concat(lit("POLYGON(("),
      array_join(array_repeat(pt, 5), ","), lit("))"))
    val s = concat(lit("osmnode:"), col("node_id"))
    Seq("convex_hull", "envelope", "obb").map { fam =>
      nodes.select(s.as("s"),
        lit(s"osm2rdfgeom:$fam").as("p"), poly.as("o"))
    }.reduce(_ unionByName _)
  }

  /** Ordered way-member triples with deterministic member keys
    * `osm2rdfmember:way_W_P` replacing the reference's blank nodes
    * (/root/reference/tests/data/relation.ttl:28-31 blank-node scheme
    * `_:6_N`; ordered GROUP_CONCAT reconstruction J8,
    * src/sparql/QueryWriter.cpp:115-134). Three triples per member:
    * parent→member link, member id, member pos. */
  def wayMemberTriples(wayMembers: DataFrame): DataFrame = {
    val m = wayMembers.withColumn("mk",
      concat(lit("osm2rdfmember:way_"), col("way_id"), lit("_"), col("pos")))
    val link = m.select(concat(lit("osmway:"), col("way_id")).as("s"),
      lit("osmway:member").as("p"), col("mk").as("o"))
    val id = m.select(col("mk").as("s"), lit("osm2rdfmember:id").as("p"),
      concat(lit("osmnode:"), col("node_id")).as("o"))
    val pos = m.select(col("mk").as("s"), lit("osm2rdfmember:pos").as("p"),
      col("pos").cast("string").as("o"))
    link.unionByName(id).unionByName(pos)
  }

  /** Relation-member triples with deterministic `(relId, pos)` keys and
    * the role triple (relation.ttl:28-31 member/role/pos family; J9
    * reconstruction src/osm/OsmDataFetcher.cpp:205-278). */
  def relMemberTriples(relMembers: DataFrame): DataFrame = {
    val m = relMembers.withColumn("mk",
      concat(lit("osm2rdfmember:rel_"), col("rel_id"), lit("_"), col("pos")))
    val link = m.select(concat(lit("osmrel:"), col("rel_id")).as("s"),
      lit("osmrel:member").as("p"), col("mk").as("o"))
    val prefix = when(col("member_kind") === "node", "osmnode:")
      .when(col("member_kind") === "way", "osmway:")
      .otherwise("osmrel:")
    val id = m.select(col("mk").as("s"), lit("osm2rdfmember:id").as("p"),
      concat(prefix, col("member_id")).as("o"))
    val role = m.select(col("mk").as("s"), lit("osm2rdfmember:role").as("p"),
      col("role").as("o"))
    val pos = m.select(col("mk").as("s"), lit("osm2rdfmember:pos").as("p"),
      col("pos").cast("string").as("o"))
    link.unionByName(id).unionByName(role).unionByName(pos)
  }

  // ---- owner-keyed faces (the in-loop RDF store) ----------------------
  // Same triple rows as the families above, each carrying
  // `subj_key` = the OWNING object ("node:N" / "way:W" / "rel:R").
  // An owner-keyed store turns the reference's two-hop DELETE
  // (/root/reference/src/sparql/QueryWriter.cpp:42-60 — needed because
  // SPARQL has no owner notion) into a per-object bucket replace:
  // merging by subj_key atomically swaps an object's whole family,
  // linked-geometry and member-key subjects included.

  /** [[linkedNodeTriples]] + owner key (both subject forms end in the
    * owning node id). */
  def ownedNodeTriples(nodes: DataFrame): DataFrame =
    linkedNodeTriples(nodes).withColumn("subj_key",
      concat(lit("node:"), regexp_extract(col("s"), "(\\d+)$", 1)))

  /** Way family from the snapshot shape (way_id, members, wkt):
    * [[wayMemberTriples]] rows + the stored-WKT geometry triple. */
  def ownedWayTriples(ways: DataFrame): DataFrame = {
    val m = ways
      .select(col("way_id"), posexplode(split(col("members"), ";")).as(Seq("pos", "nid")))
      .select(col("way_id"), col("pos"), col("nid").cast("long").as("node_id"))
      .withColumn("mk",
        concat(lit("osm2rdfmember:way_"), col("way_id"), lit("_"), col("pos")))
    val k = concat(lit("way:"), col("way_id"))
    val link = m.select(k.as("subj_key"),
      concat(lit("osmway:"), col("way_id")).as("s"),
      lit("osmway:member").as("p"), col("mk").as("o"))
    val id = m.select(k.as("subj_key"), col("mk").as("s"),
      lit("osm2rdfmember:id").as("p"),
      concat(lit("osmnode:"), col("node_id")).as("o"))
    val pos = m.select(k.as("subj_key"), col("mk").as("s"),
      lit("osm2rdfmember:pos").as("p"), col("pos").cast("string").as("o"))
    val geom = ways.filter(col("wkt").isNotNull)
      .select(concat(lit("way:"), col("way_id")).as("subj_key"),
        concat(lit("osmway:"), col("way_id")).as("s"),
        lit("geo:asWKT").as("p"), col("wkt").as("o"))
    link.unionByName(id).unionByName(pos).unionByName(geom)
  }

  /** Relation family from the snapshot shape (rel_id, members with
    * `mtype/ref/role` entries): [[relMemberTriples]] rows + owner. */
  def ownedRelTriples(rels: DataFrame): DataFrame = {
    val m = rels
      .select(col("rel_id"), posexplode(split(col("members"), ";")).as(Seq("pos", "e")))
      .select(col("rel_id"), col("pos"),
        split_part(col("e"), lit("/"), lit(1)).as("member_kind"),
        split_part(col("e"), lit("/"), lit(2)).cast("long").as("member_id"),
        split_part(col("e"), lit("/"), lit(3)).as("role"))
    relMemberTriples(m).withColumn("subj_key",
      concat(lit("rel:"), coalesce(
        nullif(regexp_extract(col("s"), "rel_(\\d+)_", 1), lit("")),
        regexp_extract(col("s"), "(\\d+)$", 1))))
  }

  // ---- full J10 families (type / timestamp / tags / facts) -----------
  // The reference re-fetches tags+timestamp for every stale object and
  // re-inserts the whole family each batch
  // (/root/reference/src/osm/OsmDataFetcher.cpp:333-395,
  // src/sparql/QueryWriter.cpp:242-255); its two-hop DELETE removes tag
  // triples too (QueryWriter.cpp:42-60). Here the layers CARRY the
  // metadata (optional `ts` timestamp and `tags` map columns), so the
  // full family derives in-plan from the layer row alone — emission is
  // column-guarded: layers without metadata emit only the type triple.

  /** rdf:type + osmmeta:timestamp + osmkey:* + osm2rdf:facts for any
    * layer frame, owner-keyed. ts/tags families appear only when the
    * frame carries those columns (and ts is non-null). */
  private def ownedMetaTriples(objs: DataFrame, idCol: String,
      pfx: String, rdfType: String, keyPfx: String): DataFrame = {
    val k = concat(lit(keyPfx), col(idCol)).as("subj_key")
    val s = concat(lit(pfx), col(idCol)).as("s")
    val typeT = objs.select(k, s, lit("rdf:type").as("p"), lit(rdfType).as("o"))
    val tsT =
      if (!objs.columns.contains("ts")) None
      else Some(objs.filter(col("ts").isNotNull)
        .select(k, s, lit("osmmeta:timestamp").as("p"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("o")))
    val tagT =
      if (!objs.columns.contains("tags")) None
      else Some(objs.select(k, s, explode(col("tags")).as(Seq("tk", "tv")))
        .select(col("subj_key"), col("s"),
          concat(lit("osmkey:"), col("tk")).as("p"), col("tv").as("o")))
    val factsT =
      if (!objs.columns.contains("tags")) None
      else Some(objs.select(k, s, lit("osm2rdf:facts").as("p"),
        coalesce(size(col("tags")), lit(0)).cast("string").as("o")))
    (Seq(typeT) ++ tsT ++ tagT ++ factsT).reduce(_ unionByName _)
  }

  /** [[ownedNodeTriples]] + the meta family. */
  def ownedNodeTriplesFull(nodes: DataFrame): DataFrame =
    ownedNodeTriples(nodes).unionByName(
      ownedMetaTriples(nodes, "node_id", "osmnode:", "osm:node", "node:"))

  /** [[ownedWayTriples]] + the meta family. */
  def ownedWayTriplesFull(ways: DataFrame): DataFrame =
    ownedWayTriples(ways).unionByName(
      ownedMetaTriples(ways, "way_id", "osmway:", "osm:way", "way:"))

  /** [[ownedRelTriples]] + the meta family. */
  def ownedRelTriplesFull(rels: DataFrame): DataFrame =
    ownedRelTriples(rels).unionByName(
      ownedMetaTriples(rels, "rel_id", "osmrel:", "osm:relation", "rel:"))

  /** J11: two-hop delete — remove triples whose subject is a deleted
    * element AND triples of objects linked from them (the OPTIONAL
    * second hop of the reference's DELETE statement,
    * /root/reference/src/sparql/QueryWriter.cpp:42-60, callers
    * OsmChangeHandler.cpp:442-491). Returns the surviving triples;
    * both hops are anti-joins, the link edge is derived from the
    * doomed subjects' own geo:hasGeometry triples. */
  def twoHopDelete(triples: DataFrame, delIds: DataFrame): DataFrame = {
    val doomedSubjects = delIds
      .select(concat(lit("osmnode:"), col("id")).as("ds"))
    val hop1 = triples.join(doomedSubjects, col("s") === col("ds"), "left_semi")
    val hop2Subjects = hop1.filter(col("p") === "geo:hasGeometry")
      .select(col("o").as("dl")).distinct()
    triples
      .join(doomedSubjects, col("s") === col("ds"), "left_anti")
      .join(hop2Subjects, col("s") === col("dl"), "left_anti")
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
