package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
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
  //
  // Each derivation is SINGLE-PASS: one scan of the layer builds the
  // whole family as an array of (s,p,o) structs per row (higher-order
  // `transform` over the member list and `map_entries(tags)`), then one
  // `explode` — instead of a union of 4-8 per-family selects that each
  // rescan the source. At corpus scale the layer never fits a cache, so
  // the N-scan shape reads the parquet N times; this shape reads it
  // once and stays inside whole-stage codegen.

  private def t3(s: Column, p: Column, o: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"))

  /** `osmmeta:timestamp` + `osmkey:*` + `osm2rdf:facts` array parts —
    * emitted only when the frame carries those columns (and ts/tags are
    * non-null), mirroring the reference's per-object re-fetch
    * (/root/reference/src/osm/OsmDataFetcher.cpp:333-395,
    * src/sparql/QueryWriter.cpp:242-255). */
  private def metaParts(df: DataFrame, s: Column): Seq[Column] = {
    val tsPart =
      if (!df.columns.contains("ts")) Nil
      else Seq(array_compact(array(when(col("ts").isNotNull,
        t3(s, lit("osmmeta:timestamp"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))))))
    val tagParts =
      if (!df.columns.contains("tags")) Nil
      else Seq(
        transform(
          map_entries(coalesce(col("tags"), map().cast("map<string,string>"))),
          e => t3(s, concat(lit("osmkey:"), e("key")), e("value"))),
        array(t3(s, lit("osm2rdf:facts"),
          coalesce(size(col("tags")), lit(0)).cast("string"))))
    tsPart ++ tagParts
  }

  private def explodeOwned(df: DataFrame, key: Column, parts: Seq[Column]): DataFrame =
    df.select(key.as("subj_key"), explode(concat(parts: _*)).as("t"))
      .select(col("subj_key"), col("t.s").as("s"), col("t.p").as("p"),
        col("t.o").as("o"))

  /** [[linkedNodeTriples]] + rdf:type + the meta family, owner-keyed —
    * one scan of the node layer. */
  def ownedNodeTriplesFull(nodes: DataFrame): DataFrame = {
    val s = concat(lit("osmnode:"), col("node_id"))
    val gs = concat(lit("osm2rdfgeom:osm_node_"), col("node_id"))
    val wkt = concat(lit("POINT("), format_string("%.7f", col("lon")), lit(" "),
      format_string("%.7f", col("lat")), lit(")"))
    val fixed = array(
      t3(s, lit("geo:hasGeometry"), gs),
      t3(gs, lit("geo:asWKT"), wkt),
      t3(s, lit("rdf:type"), lit("osm:node")))
    explodeOwned(nodes, concat(lit("node:"), col("node_id")),
      fixed +: metaParts(nodes, s))
  }

  /** Way family from the snapshot shape (way_id, members, wkt, [ts],
    * [tags]): member link/id/pos triples + the stored-WKT geometry
    * triple + rdf:type + meta — one scan of the way layer. */
  def ownedWayTriplesFull(ways: DataFrame): DataFrame = {
    val s = concat(lit("osmway:"), col("way_id"))
    val memT = flatten(transform(
      coalesce(split(col("members"), ";"), array().cast("array<string>")),
      (e, i) => {
        val mk = concat(lit("osm2rdfmember:way_"), col("way_id"), lit("_"), i)
        array(
          t3(s, lit("osmway:member"), mk),
          t3(mk, lit("osm2rdfmember:id"),
            concat(lit("osmnode:"), e.cast("long"))),
          t3(mk, lit("osm2rdfmember:pos"), i.cast("string")))
      }))
    val geomT = array_compact(array(when(col("wkt").isNotNull,
      t3(s, lit("geo:asWKT"), col("wkt")))))
    val typeT = array(t3(s, lit("rdf:type"), lit("osm:way")))
    explodeOwned(ways, concat(lit("way:"), col("way_id")),
      Seq(memT, geomT, typeT) ++ metaParts(ways, s))
  }

  /** Relation family from the snapshot shape (rel_id, members with
    * `mtype/ref/role` entries, [ts], [tags]): member link/id/role/pos
    * triples + rdf:type + meta — one scan of the relation layer. */
  def ownedRelTriplesFull(rels: DataFrame): DataFrame = {
    val s = concat(lit("osmrel:"), col("rel_id"))
    val memT = flatten(transform(
      coalesce(split(col("members"), ";"), array().cast("array<string>")),
      (e, i) => {
        val mk = concat(lit("osm2rdfmember:rel_"), col("rel_id"), lit("_"), i)
        val kind = split_part(e, lit("/"), lit(1))
        val pfx = when(kind === "node", "osmnode:")
          .when(kind === "way", "osmway:").otherwise("osmrel:")
        array(
          t3(s, lit("osmrel:member"), mk),
          t3(mk, lit("osm2rdfmember:id"),
            concat(pfx, split_part(e, lit("/"), lit(2)).cast("long"))),
          t3(mk, lit("osm2rdfmember:role"), split_part(e, lit("/"), lit(3))),
          t3(mk, lit("osm2rdfmember:pos"), i.cast("string")))
      }))
    val typeT = array(t3(s, lit("rdf:type"), lit("osm:relation")))
    explodeOwned(rels, concat(lit("rel:"), col("rel_id")),
      Seq(memT, typeT) ++ metaParts(rels, s))
  }

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
