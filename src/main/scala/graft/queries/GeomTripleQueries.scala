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
  )
}
