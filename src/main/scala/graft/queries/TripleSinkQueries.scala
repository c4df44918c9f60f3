package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.osm.ChangePipeline
import graft.rdf.TripleDerive
import graft.synth.{SynthSql, SynthUniverse}

/** The TTL text boundary and the UPDATE sink, as queries:
  *
  *  - q50: S7/F12 triple-line parsing — the reference re-parses its own
  *    osm2rdf output line-by-line with `(\S+)\s(\S+)\s(.*)\s\.`
  *    (/root/reference/src/util/TtlHelper.cpp:13-21), skips `@prefix`
  *    headers (P6, OsmChangeHandler.cpp:602-604), keeps only the
  *    osmnode:/osmway:/osmrel: namespaces (P4, TtlHelper.cpp:23-38),
  *    and parses WKT points back to coordinates (F9, Node.cpp:30-42).
  *    Here the TTL lines are themselves derived in-plan (the engine
  *    never round-trips text internally — this exercises the ingest
  *    boundary for golden fixtures).
  *  - q51: S9 — the final triple-delta emission: one DataFrame of
  *    (op, s, p, o) rows: DELETE markers for the two-hop delete set
  *    and INSERT rows from the P5-filtered insert set — the engine's
  *    replacement for the reference's batched SPARQL UPDATE POSTs
  *    (/root/reference/src/sparql/SparqlWrapper.cpp:88-110,
  *    OsmChangeHandler.cpp:493-575).
  */
object TripleSinkQueries {

  private def winners(s: SparkSession, dir: String): DataFrame =
    ChangePipeline.dedupLatest(SynthUniverse.changes(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_ttl_parse" -> ((s, dir) => {
      // build TTL text lines (with an @prefix header mixed in), then
      // parse them back: regex split, namespace filter, WKT decode
      val lines = SynthUniverse.nodes(s, dir).select(
        concat(lit("osmnode:"), col("node_id"), lit(" geo:asWKT \"POINT("),
          format_string("%.7f", col("lon")), lit(" "),
          format_string("%.7f", col("lat")), lit(")\" .")).as("line"))
        .union(s.range(1).select(
          lit("@prefix osmnode: <https://www.openstreetmap.org/node/> .").as("line")))
      val parsed = lines
        .filter(!col("line").startsWith("@"))                          // P6
        .select(
          regexp_extract(col("line"), "^(\\S+)\\s(\\S+)\\s(.*)\\s\\.$", 1).as("subj"),
          regexp_extract(col("line"), "^(\\S+)\\s(\\S+)\\s(.*)\\s\\.$", 2).as("pred"),
          regexp_extract(col("line"), "^(\\S+)\\s(\\S+)\\s(.*)\\s\\.$", 3).as("obj"))
        .filter(col("subj").startsWith("osmnode:") ||
          col("subj").startsWith("osmway:") || col("subj").startsWith("osmrel:")) // P4
      // try_cast: under ANSI mode Catalyst collapses these projections
      // with the filters, so the cast may see not-yet-filtered rows
      parsed.select(
        regexp_extract(col("subj"), "(\\d+)$", 1).try_cast("long").as("node_id"), // F2
        col("pred"),
        // F9: WKT point -> lon/lat (e7 ints for exact compare)
        round(regexp_extract(col("obj"), "POINT\\(([-0-9.]+) ", 1)
          .try_cast("double") * 1e7, 0).try_cast("long").as("lon_e7"),
        round(regexp_extract(col("obj"), " ([-0-9.]+)\\)", 1)
          .try_cast("double") * 1e7, 0).try_cast("long").as("lat_e7"))
    }),
    "q51_triple_delta" -> ((s, dir) => {
      val w = winners(s, dir)
      val delIds = w.filter(col("kind") === "node" &&
        col("action").isin("delete", "modify")).select(col("id"))
      val insIds = w.filter(col("kind") === "node" &&
        col("action").isin("create", "modify")).select(col("id"))
      val triples = TripleDerive.linkedNodeTriples(SynthUniverse.nodes(s, dir))
      // DELETE side: subject triples of doomed ids + their linked
      // geometry subjects (J11 two-hop shape, emitted as op rows)
      val doomed = triples.join(
        delIds.select(concat(lit("osmnode:"), col("id")).as("ds")),
        col("s") === col("ds"), "left_semi")
      val linked = triples.join(
        doomed.filter(col("p") === "geo:hasGeometry").select(col("o").as("dl")).distinct(),
        col("s") === col("dl"), "left_semi")
      val deletes = doomed.unionByName(linked)
        .select(lit("DELETE").as("op"), col("s"), col("p"), col("o"))
      // INSERT side: P5 link-propagated relevant triples of the insert set
      val inserts = TripleDerive.filterRelevant(triples, insIds)
        .select(lit("INSERT").as("op"), col("s"), col("p"), col("o"))
      deletes.unionByName(inserts)
    }),
  )

  private val winnersCte: String = SynthSql.winnersCte

  private val linkedTriplesCte: String =
    """triples AS (
      |  SELECT 'osmnode:' || node_id AS s, 'geo:hasGeometry' AS p,
      |    'osm2rdfgeom:osm_node_' || node_id AS o FROM nodes
      |  UNION ALL
      |  SELECT 'osm2rdfgeom:osm_node_' || node_id AS s, 'geo:asWKT' AS p,
      |    'POINT(' || printf('%.7f', lon) || ' ' || printf('%.7f', lat) || ')' AS o
      |  FROM nodes)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q50_ttl_parse" ->
      s"""WITH ${SynthSql.waysCte}, ${SynthSql.nodesCte},
         |lines AS (
         |  SELECT 'osmnode:' || node_id || ' geo:asWKT "POINT('
         |    || printf('%.7f', lon) || ' ' || printf('%.7f', lat) || ')" .' AS line
         |  FROM nodes
         |  UNION ALL
         |  SELECT '@prefix osmnode: <https://www.openstreetmap.org/node/> .'),
         |parsed AS (
         |  SELECT regexp_extract(line, '^(\\S+)\\s(\\S+)\\s(.*)\\s\\.$$', 1) AS subj,
         |         regexp_extract(line, '^(\\S+)\\s(\\S+)\\s(.*)\\s\\.$$', 2) AS pred,
         |         regexp_extract(line, '^(\\S+)\\s(\\S+)\\s(.*)\\s\\.$$', 3) AS obj
         |  FROM lines WHERE NOT starts_with(line, '@'))
         |SELECT CAST(regexp_extract(subj, '(\\d+)$$', 1) AS BIGINT) AS node_id,
         |  pred,
         |  CAST(ROUND(CAST(regexp_extract(obj, 'POINT\\(([-0-9.]+) ', 1) AS DOUBLE)*10000000, 0) AS BIGINT) AS lon_e7,
         |  CAST(ROUND(CAST(regexp_extract(obj, ' ([-0-9.]+)\\)', 1) AS DOUBLE)*10000000, 0) AS BIGINT) AS lat_e7
         |FROM parsed
         |WHERE starts_with(subj, 'osmnode:') OR starts_with(subj, 'osmway:')
         |   OR starts_with(subj, 'osmrel:')""".stripMargin,
    "q51_triple_delta" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.waysCte}, ${SynthSql.nodesCte},
         |$linkedTriplesCte,
         |dels AS (SELECT 'osmnode:' || id AS ds FROM winners
         |         WHERE kind='node' AND action IN ('delete','modify')),
         |ins AS (SELECT id FROM winners
         |        WHERE kind='node' AND action IN ('create','modify')),
         |doomed AS (SELECT t.* FROM triples t WHERE t.s IN (SELECT ds FROM dels)),
         |linked AS (
         |  SELECT t.* FROM triples t
         |  WHERE t.s IN (SELECT o FROM doomed WHERE p = 'geo:hasGeometry')),
         |kept1 AS (
         |  SELECT t.* FROM triples t
         |  WHERE starts_with(t.s, 'osmnode:')
         |    AND CAST(regexp_extract(t.s, '(\\d+)$$', 1) AS BIGINT) IN (SELECT id FROM ins)),
         |kept2 AS (
         |  SELECT t.* FROM triples t
         |  WHERE t.s IN (SELECT o FROM kept1 WHERE p = 'geo:hasGeometry'))
         |SELECT 'DELETE' AS op, s, p, o FROM doomed
         |UNION ALL SELECT 'DELETE', s, p, o FROM linked
         |UNION ALL SELECT 'INSERT', s, p, o FROM kept1
         |UNION ALL SELECT 'INSERT', s, p, o FROM kept2""".stripMargin,
  )
}
