package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.osm.ChangePipeline
import graft.rdf.{GeomDerive, TripleDerive}
import graft.spatial.SpatialJoin
import graft.synth.{SynthSql, SynthUniverse}

/** F17 geometry derivations, deterministic member-key triples, and the
  * J11 two-hop delete — the remaining osm2rdf-output families of
  * SURVEY.md §2.3/§2.7, each oracle-checked against the closed-form
  * rectangle universe.
  *
  *  - q42: REAL JTS (perimeter / Centroid / envelope / convexHull /
  *    MinimumDiameter OBB — /root/reference/tests/data/way.ttl:50-56
  *    golden family) over rings reconstructed from way_members ⋈ nodes;
  *    oracle = the rectangle formulas (e4 grid absorbs FP noise).
  *  - q43/q44: blank nodes (`_:6_N`, relation.ttl:28-31) replaced by
  *    deterministic `(parentId, pos)` member keys.
  *  - q45: two-hop DELETE (QueryWriter.cpp:42-60) as two anti-joins.
  */
object GeomTripleQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_way_geoms" -> ((s, dir) => {
      val polys = SpatialJoin.polygons(
        SynthUniverse.wayMembers(s, dir), SynthUniverse.nodes(s, dir))
      polys.select(col("way_id"),
        GeomDerive.statsUdf(col("xs"), col("ys")).as("g"))
        .select(col("way_id"), col("g.*"))
    }),
    "q43_way_member_triples" -> ((s, dir) =>
      TripleDerive.wayMemberTriples(SynthUniverse.wayMembers(s, dir))),
    "q44_rel_member_triples" -> ((s, dir) =>
      TripleDerive.relMemberTriples(SynthUniverse.relMembers(s, dir))),
    "q45_two_hop_delete" -> ((s, dir) => {
      val winners = ChangePipeline.dedupLatest(SynthUniverse.changes(s, dir))
      val delIds = winners
        .filter(col("kind") === "node" && col("action").isin("delete", "modify"))
        .select(col("id"))
      TripleDerive.twoHopDelete(
        TripleDerive.linkedNodeTriples(SynthUniverse.nodes(s, dir)), delIds)
    }),
    "q54_way_triples" -> ((s, dir) => {
      // J10 parity: the FULL per-stale-way triple family (type / wkt /
      // ts / tags / facts) the reference fetches before re-insert.
      val winners = ChangePipeline.dedupLatest(SynthUniverse.changes(s, dir))
      val st = ChangePipeline.staleWays(winners, SynthUniverse.wayMembers(s, dir))
      val recon = ChangePipeline.reconstructWays(st,
        SynthUniverse.wayMembers(s, dir), SynthUniverse.nodes(s, dir))
      val ways = recon.withColumn("ts", expr(
        "timestampadd(SECOND, CAST(way_id % 86400 AS INT), TIMESTAMP '2024-06-01 00:00:00')"))
      TripleDerive.wayTriples(ways, SynthUniverse.tags(s, dir))
    }),
    "q55_rel_triples" -> ((s, dir) => {
      val winners = ChangePipeline.dedupLatest(SynthUniverse.changes(s, dir))
      val st = ChangePipeline.staleWays(winners, SynthUniverse.wayMembers(s, dir))
      val sr = ChangePipeline.staleRels(winners, SynthUniverse.relMembers(s, dir), st)
      val rels = sr.withColumn("ts", expr(
        "timestampadd(SECOND, CAST(rel_id % 86400 AS INT), TIMESTAMP '2024-06-01 00:00:00')"))
      TripleDerive.relTriples(rels, SynthUniverse.tags(s, dir))
    }),
  )

  private val winnersCte: String = SynthSql.winnersCte

  val oracles: Map[String, String] = Map(
    "q42_way_geoms" ->
      s"""WITH ${SynthSql.waysCte}
         |SELECT way_id,
         |  CAST(ROUND((2*w + 2*h)*10000, 0) AS BIGINT) AS length_e4,
         |  CAST(ROUND((x0 + w/2)*10000, 0) AS BIGINT) AS cx_e4,
         |  CAST(ROUND((y0 + h/2)*10000, 0) AS BIGINT) AS cy_e4,
         |  CAST(ROUND(x0*10000, 0) AS BIGINT) AS env_minx_e4,
         |  CAST(ROUND(y0*10000, 0) AS BIGINT) AS env_miny_e4,
         |  CAST(ROUND((x0 + w)*10000, 0) AS BIGINT) AS env_maxx_e4,
         |  CAST(ROUND((y0 + h)*10000, 0) AS BIGINT) AS env_maxy_e4,
         |  CAST(ROUND(w*h*10000, 0) AS BIGINT) AS hull_area_e4,
         |  CAST(ROUND(w*h*10000, 0) AS BIGINT) AS obb_area_e4
         |FROM ways""".stripMargin,
    "q43_way_member_triples" ->
      s"""WITH ${SynthSql.wayMembersCte},
         |m AS (SELECT *, 'osm2rdfmember:way_' || way_id || '_' || pos AS mk
         |      FROM way_members)
         |SELECT 'osmway:' || way_id AS s, 'osmway:member' AS p, mk AS o FROM m
         |UNION ALL
         |SELECT mk AS s, 'osm2rdfmember:id' AS p, 'osmnode:' || node_id AS o FROM m
         |UNION ALL
         |SELECT mk AS s, 'osm2rdfmember:pos' AS p, CAST(pos AS VARCHAR) AS o FROM m""".stripMargin,
    "q44_rel_member_triples" ->
      s"""WITH ${SynthSql.relMembersCte},
         |m AS (SELECT *, 'osm2rdfmember:rel_' || rel_id || '_' || pos AS mk
         |      FROM rel_members)
         |SELECT 'osmrel:' || rel_id AS s, 'osmrel:member' AS p, mk AS o FROM m
         |UNION ALL
         |SELECT mk AS s, 'osm2rdfmember:id' AS p,
         |  (CASE WHEN member_kind='node' THEN 'osmnode:'
         |        WHEN member_kind='way' THEN 'osmway:'
         |        ELSE 'osmrel:' END) || member_id AS o FROM m
         |UNION ALL
         |SELECT mk AS s, 'osm2rdfmember:role' AS p, role AS o FROM m
         |UNION ALL
         |SELECT mk AS s, 'osm2rdfmember:pos' AS p, CAST(pos AS VARCHAR) AS o FROM m""".stripMargin,
    "q45_two_hop_delete" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.waysCte}, ${SynthSql.nodesCte},
         |triples AS (
         |  SELECT 'osmnode:' || node_id AS s, 'geo:hasGeometry' AS p,
         |    'osm2rdfgeom:osm_node_' || node_id AS o FROM nodes
         |  UNION ALL
         |  SELECT 'osm2rdfgeom:osm_node_' || node_id AS s, 'geo:asWKT' AS p,
         |    'POINT(' || printf('%.7f', lon) || ' ' || printf('%.7f', lat) || ')' AS o
         |  FROM nodes),
         |doomed AS (
         |  SELECT 'osmnode:' || id AS ds FROM winners
         |  WHERE kind='node' AND action IN ('delete','modify')),
         |hop2 AS (
         |  SELECT DISTINCT t.o AS dl FROM triples t
         |  JOIN doomed d ON t.s = d.ds WHERE t.p = 'geo:hasGeometry')
         |SELECT t.* FROM triples t
         |WHERE t.s NOT IN (SELECT ds FROM doomed)
         |  AND t.s NOT IN (SELECT dl FROM hop2)""".stripMargin,
    "q54_way_triples" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.waysCte}, ${SynthSql.nodesCte},
         |stale_ways AS (
         |  SELECT DISTINCT wm.way_id FROM way_members wm
         |  JOIN (SELECT id FROM winners WHERE kind='node' AND action='modify') mn
         |    ON wm.node_id = mn.id
         |  WHERE wm.way_id NOT IN (SELECT id FROM winners WHERE kind='way')),
         |recon AS (
         |  SELECT wm.way_id,
         |    'LINESTRING(' || STRING_AGG(printf('%.7f %.7f', n.lon, n.lat), ', ' ORDER BY wm.pos) || ')' AS wkt
         |  FROM way_members wm JOIN stale_ways sw ON wm.way_id = sw.way_id
         |  JOIN nodes n ON wm.node_id = n.node_id
         |  GROUP BY wm.way_id),
         |w AS (SELECT way_id, 'osmway:' || way_id AS s, wkt,
         |  strftime(TIMESTAMP '2024-06-01 00:00:00' + to_seconds(way_id % 86400),
         |    '%Y-%m-%dT%H:%M:%S') AS tss
         |  FROM recon),
         |way_tags AS (
         |  SELECT way_id AS tag_id, 'name' AS k, 'way_' || way_id AS v FROM ways
         |  UNION ALL
         |  SELECT way_id, 'type', 'multipolygon' FROM ways WHERE way_id % 4 = 0)
         |SELECT s, 'rdf:type' AS p, 'osm:way' AS o FROM w
         |UNION ALL SELECT s, 'geo:asWKT' AS p, wkt AS o FROM w
         |UNION ALL SELECT s, 'osmmeta:timestamp' AS p, tss AS o FROM w
         |UNION ALL SELECT s, 'osmkey:' || t.k AS p, t.v AS o
         |  FROM w JOIN way_tags t ON w.way_id = t.tag_id
         |UNION ALL SELECT s, 'osm2rdf:facts' AS p, CAST(COUNT(t.tag_id) AS VARCHAR) AS o
         |  FROM w LEFT JOIN way_tags t ON w.way_id = t.tag_id GROUP BY s""".stripMargin,
    "q55_rel_triples" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.relMembersCte},
         |stale_ways AS (
         |  SELECT DISTINCT wm.way_id FROM way_members wm
         |  JOIN (SELECT id FROM winners WHERE kind='node' AND action='modify') mn
         |    ON wm.node_id = mn.id
         |  WHERE wm.way_id NOT IN (SELECT id FROM winners WHERE kind='way')),
         |stale_rels AS (
         |  SELECT DISTINCT rm.rel_id FROM rel_members rm
         |  JOIN (SELECT id FROM winners WHERE kind='way' AND action='modify'
         |        UNION SELECT way_id AS id FROM stale_ways) pw
         |    ON rm.member_id = pw.id
         |  WHERE rm.rel_id NOT IN (SELECT id FROM winners WHERE kind='relation')),
         |r AS (SELECT rel_id, 'osmrel:' || rel_id AS s,
         |  strftime(TIMESTAMP '2024-06-01 00:00:00' + to_seconds(rel_id % 86400),
         |    '%Y-%m-%dT%H:%M:%S') AS tss
         |  FROM stale_rels)
         |SELECT s, 'rdf:type' AS p, 'osm:relation' AS o FROM r
         |UNION ALL SELECT s, 'osmmeta:timestamp' AS p, tss AS o FROM r
         |UNION ALL SELECT s, 'osm2rdf:facts' AS p, '0' AS o FROM r""".stripMargin,
  )
}
