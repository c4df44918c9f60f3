package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.osm.ChangePipeline
import graft.rdf.TripleDerive
import graft.synth.{SynthSql, SynthUniverse}

/** The OsmChange delta pipeline, oracle-checked stage by stage over the
  * synthetic universe (changes derived from `events`, snapshot derived
  * from `orders`): classification, W1 dedup-to-latest, J1/J3 dependency
  * closure, J8 ordered reconstruction, J11 delete-set, triple
  * derivation, and the final MERGE.
  */
object OsmQueries {

  private def winners(s: SparkSession, dir: String): DataFrame =
    ChangePipeline.dedupLatest(SynthUniverse.changes(s, dir))

  /** q52's maintenance math over a given base way layer (rebuilt
    * in-query for the oracle query; StoredState parquet for q52b). */
  private def waysAfterMerge(s: SparkSession, dir: String, base: DataFrame): DataFrame = {
    val w = winners(s, dir).cache() // shared by merge + stale + applyWayOps
    val st = ChangePipeline.staleWays(w, SynthUniverse.wayMembers(s, dir))
    val wm = SynthUniverse.wayMembers(s, dir)
    val nodes = SynthUniverse.nodes(s, dir)
    val merged = ChangePipeline.applyNodeOps(nodes, w)
    ChangePipeline.applyWayOps(base, w, wm, merged, st)
  }

  private def stale(s: SparkSession, dir: String): DataFrame =
    ChangePipeline.staleWays(winners(s, dir), SynthUniverse.wayMembers(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_rel_reconstruct" -> ((s, dir) => {
      val w = winners(s, dir)
      val sr = ChangePipeline.staleRels(w, SynthUniverse.relMembers(s, dir), stale(s, dir))
      ChangePipeline.reconstructRels(sr, SynthUniverse.relMembers(s, dir))
    }),
    "q24_referenced_nodes" -> ((s, dir) =>
      ChangePipeline.referencedNodes(stale(s, dir),
        SynthUniverse.wayMembers(s, dir), winners(s, dir))),
    "q25_rel_member_split" -> ((s, dir) => {
      // J6 + F1/F2: members of stale relations split by URI-prefix kind,
      // ids round-tripped through the trailing-digit extraction
      // (/root/reference/src/util/OsmObjectHelper.cpp:25-43,
      // OsmDataFetcher.cpp:413-433).
      val w = winners(s, dir)
      val sr = ChangePipeline.staleRels(w, SynthUniverse.relMembers(s, dir), stale(s, dir))
      SynthUniverse.relMembers(s, dir)
        .join(sr, Seq("rel_id"), "left_semi")
        .withColumn("member_uri", concat(lit("osmway:"), col("member_id")))
        .select(col("rel_id"),
          when(col("member_uri").startsWith("osmnode:"), "node")
            .when(col("member_uri").startsWith("osmway:"), "way")
            .otherwise("relation").as("member_kind"),
          regexp_extract(col("member_uri"), "(\\d+)$", 1).cast("long").as("member_ref"))
    }),
    "q26_insert_triples" -> ((s, dir) => {
      val insertIds = winners(s, dir)
        .filter(col("kind") === "node" && col("action").isin("create", "modify"))
        .select(col("id"))
      TripleDerive.filterRelevant(
        TripleDerive.linkedNodeTriples(SynthUniverse.nodes(s, dir)), insertIds)
    }),
    "q27_multipolygon_areas" -> ((s, dir) => {
      // P2: changed ways carrying type=multipolygon → "modified areas"
      // (/root/reference/src/util/OsmObjectHelper.cpp:12-23).
      val areaWays = SynthUniverse.tags(s, dir)
        .filter(col("kind") === "way" && col("k") === "type" && col("v") === "multipolygon")
        .select(col("id"))
      winners(s, dir)
        .filter(col("kind") === "way" && col("action").isin("create", "modify"))
        .select(col("id").as("way_id"))
        .join(areaWays, col("way_id") === col("id"), "left_semi")
    }),
    "q33_classify_changes" -> ((s, dir) =>
      ChangePipeline.classify(SynthUniverse.changes(s, dir))),
    "q34_changes_dedup" -> ((s, dir) =>
      winners(s, dir).select(col("kind"), col("id"), col("action"),
        col("version"), col("seq"))),
    "q35_ways_stale" -> ((s, dir) => stale(s, dir)),
    "q36_rels_stale" -> ((s, dir) =>
      ChangePipeline.staleRels(winners(s, dir),
        SynthUniverse.relMembers(s, dir), stale(s, dir))),
    "q37_way_reconstruct" -> ((s, dir) =>
      ChangePipeline.reconstructWays(stale(s, dir),
        SynthUniverse.wayMembers(s, dir), SynthUniverse.nodes(s, dir))),
    "q38_delete_set" -> ((s, dir) => {
      // winners/stale root all three union branches — cache them once
      // instead of re-running the dedup window per reference (the
      // window recompute tripled this query's cost in BENCH_r01)
      val w = winners(s, dir).cache()
      val st = ChangePipeline.staleWays(w, SynthUniverse.wayMembers(s, dir)).cache()
      ChangePipeline.deleteSet(w, st,
        ChangePipeline.staleRels(w, SynthUniverse.relMembers(s, dir), st))
    }),
    "q39_node_triples" -> ((s, dir) => {
      val ops = winners(s, dir)
        .filter(col("kind") === "node" && col("action").isin("create", "modify"))
        .select(col("id"), col("lon"), col("lat"), col("ts"))
      TripleDerive.nodeTriples(ops, SynthUniverse.tags(s, dir))
    }),
    "q40_nodes_after_merge" -> ((s, dir) =>
      ChangePipeline.applyNodeOps(SynthUniverse.nodes(s, dir), winners(s, dir))
        .select(col("node_id"),
          round(col("lon") * 1e7, 0).cast("long").as("lon_e7"),
          round(col("lat") * 1e7, 0).cast("long").as("lat_e7"))),
    "q52_ways_after_merge" -> ((s, dir) => {
      // Way-layer MERGE (OsmChangeHandler.cpp:442-575 parity): stale and
      // changed ways rebuild against the POST-merge node layer; deleted
      // ways drop; everything else carries forward.
      val wm = SynthUniverse.wayMembers(s, dir)
      waysAfterMerge(s, dir, ChangePipeline.reconstructWays(
        wm.select(col("way_id")).distinct(), wm, SynthUniverse.nodes(s, dir)))
    }),
    "q52b_stored_merge" -> ((s, dir) =>
      // q52's PRODUCTION twin (VERDICT r4 item 4): the base way layer —
      // the table Replicator maintains live — is read from parquet
      // ([[graft.tables.StoredState]], built once per sfDir) instead of
      // reconstructed in-query, so the bench number measures the MERGE
      // maintenance, not the stored-layer rebuild. Same output, same
      // oracle as q52.
      waysAfterMerge(s, dir, graft.tables.StoredState.table(s, dir, "base_ways") {
        val wm = SynthUniverse.wayMembers(s, dir)
        ChangePipeline.reconstructWays(
          wm.select(col("way_id")).distinct(), wm, SynthUniverse.nodes(s, dir))
      })),
    "q53_rels_after_merge" -> ((s, dir) => {
      val w = winners(s, dir).cache() // shared by stale detection + applyRelOps
      val rm = SynthUniverse.relMembers(s, dir)
      val sr = ChangePipeline.staleRels(w, rm,
        ChangePipeline.staleWays(w, SynthUniverse.wayMembers(s, dir)))
      val base = ChangePipeline.reconstructRels(
        rm.select(col("rel_id")).distinct(), rm)
      ChangePipeline.applyRelOps(base, w, rm, sr)
    }),
    "q70_triples_after_merge" -> ((s, dir) => {
      val wm = SynthUniverse.wayMembers(s, dir)
      triplesAfterMerge(s, dir,
        ChangePipeline.reconstructWays(
          wm.select(col("way_id")).distinct(), wm, SynthUniverse.nodes(s, dir)),
        ChangePipeline.serializeRelMembers(
          SynthUniverse.relMembers(s, dir).withColumnRenamed("member_kind", "mtype")))
    }),
    "q70b_stored_triples" -> ((s, dir) => storedTriplesDelta(s, dir)),
  )

  /** q70's PRODUCTION twin, r6 shape (VERDICT r5 item 1): the stored
    * state is the MAINTAINED owner-keyed triple table itself
    * (StoredState parquet — at scale: the bucketed table
    * [[graft.osm.Replicator]] keeps live via SnapshotTable MERGEs),
    * and the query prices exactly what a live loop pays per batch:
    * derive the touched owners' delete-set, anti-join their whole
    * families out of the stored table (one broadcast anti-join — the
    * resolved-read shape of a mergeIntoDelta commit), and re-derive
    * ONLY the upserted objects' families against the merged node
    * coordinates — O(batch) maintenance + one O(table) resolved scan,
    * never a full-corpus re-derivation (the r5 twin still re-derived
    * every family and measured SLOWER than q70 — VERDICT "What's
    * wrong" #1). Output contract and oracle are exactly q70's; the
    * owner-keyed anti-join is sound because every triple of an
    * object's family (geometry and member-key subjects included)
    * carries the owner's subj_key — the same per-object atomic-swap
    * argument as Replicator's bucket MERGE. */
  private def storedTriplesDelta(s: SparkSession, dir: String): DataFrame = {
    // numeric owner key (okind 0/1/2, oid) instead of the subj_key
    // string: the resolved-read anti-join hashes two fixed-width
    // integers per stored row, not a 10-16 byte string (guide §2.3
    // narrower types — measured ~1s off the 7.3M-row anti-join)
    def keyed(df: DataFrame, kind: Int, pfx: Int): DataFrame =
      df.select(lit(kind).as("okind"),
        substring(col("subj_key"), pfx, 100).cast("long").as("oid"),
        col("s"), col("p"), col("o"))
    val stored = graft.tables.StoredState.table(s, dir, "base_triples_keyed") {
      // the steady-state store: full families of the three base layers
      // (same derivation Bench.buildStore commits to the snapshot store)
      val wm0 = SynthUniverse.wayMembers(s, dir)
      val baseW = ChangePipeline.reconstructWays(
          wm0.select(col("way_id")).distinct(), wm0, SynthUniverse.nodes(s, dir))
        .withColumn("ts", SynthUniverse.synthTs(col("way_id")))
        .withColumn("tags", SynthUniverse.wayTagMap(col("way_id")))
      val baseR = ChangePipeline.serializeRelMembers(
          SynthUniverse.relMembers(s, dir).withColumnRenamed("member_kind", "mtype"))
        .withColumn("ts", SynthUniverse.synthTs(col("rel_id")))
        .withColumn("tags", SynthUniverse.relTagMap(col("rel_id")))
      keyed(TripleDerive.ownedNodeTriplesFull(SynthUniverse.nodesMeta(s, dir)), 0, 6)
        .unionByName(keyed(TripleDerive.ownedWayTriplesFull(baseW), 1, 5))
        .unionByName(keyed(TripleDerive.ownedRelTriplesFull(baseR), 2, 5))
    }
    val w = ChangePipeline.dedupLatest(SynthUniverse.changesFull(s, dir)).cache()
    val wm = SynthUniverse.wayMembers(s, dir)
    val st = ChangePipeline.staleWays(w, wm)
    // touched owners = delete-then-reinsert set per kind (J11 semantics:
    // node create/modify/delete; way delete ∪ upserted = changed ∪
    // stale; relation delete ∪ changed — relation member lists are
    // formula-stable, so only ts-carrying changes touch a rel family)
    // batch-sized frames referenced 2-3 times below — cached so the
    // winners/stale chains run once (guide §1.2)
    val nodeUps = w.filter(col("kind") === "node" &&
        col("action").isin("create", "modify"))
      .select(col("id").as("node_id"), col("lon"), col("lat"), col("ts"))
      .cache()
    val nodeDel = w.filter(col("kind") === "node" && col("action") === "delete")
      .select(col("id"))
    val wayUpsertIds = w.filter(col("kind") === "way" &&
        col("action").isin("create", "modify"))
      .select(col("id").as("way_id"))
      .union(st.select(col("way_id"))).distinct().cache()
    val wayDel = w.filter(col("kind") === "way" && col("action") === "delete")
      .select(col("id").as("way_id"))
    val relDel = w.filter(col("kind") === "relation" && col("action") === "delete")
      .select(col("id").as("rel_id"))
    val relCh = w.filter(col("kind") === "relation" &&
        col("action").isin("create", "modify"))
      .select(col("id").as("rel_id"), col("ts").as("w_ts"))
      .cache()
    val touched =
      nodeUps.select(lit(0).as("okind"), col("node_id").as("oid"))
        .union(nodeDel.select(lit(0), col("id")))
        .union(wayUpsertIds.select(lit(1), col("way_id")))
        .union(wayDel.select(lit(1), col("way_id")))
        .union(relDel.select(lit(2), col("rel_id")))
        .union(relCh.select(lit(2), col("rel_id")))
        .distinct()
    val kept = stored.join(broadcast(touched), Seq("okind", "oid"), "left_anti")
    // re-derived families of the upserted objects only (O(batch))
    val newNodes = nodeUps
      .withColumn("tags", SynthUniverse.nodeTagMap(col("node_id")))
    // (restricting the merged node layer to member nodes of upserted
    // ways was tried and REVERTED: the extra wm pass + distinct cost
    // more than the saved applyNodeOps breadth — measured +0.5 s)
    val mergedCoords = ChangePipeline.applyNodeOps(SynthUniverse.nodes(s, dir), w)
    val newWays = ChangePipeline.reconstructWays(wayUpsertIds, wm, mergedCoords)
      .join(w.filter(col("kind") === "way" &&
          col("action").isin("create", "modify"))
        .select(col("id").as("way_id"), col("ts").as("w_ts")),
        Seq("way_id"), "left")
      .withColumn("ts", coalesce(col("w_ts"), SynthUniverse.synthTs(col("way_id"))))
      .drop("w_ts")
      .withColumn("tags", SynthUniverse.wayTagMap(col("way_id")))
    val newRels = ChangePipeline.serializeRelMembers(
        SynthUniverse.relMembers(s, dir).withColumnRenamed("member_kind", "mtype")
          .join(relCh.select(col("rel_id")), Seq("rel_id"), "left_semi"))
      .join(relCh, Seq("rel_id"), "left")
      .withColumn("ts", coalesce(col("w_ts"), SynthUniverse.synthTs(col("rel_id"))))
      .drop("w_ts")
      .withColumn("tags", SynthUniverse.relTagMap(col("rel_id")))
    kept.select(col("s"), col("p"), col("o"))
      .unionByName(TripleDerive.ownedNodeTriplesFull(newNodes)
        .select(col("s"), col("p"), col("o")))
      .unionByName(TripleDerive.ownedWayTriplesFull(newWays)
        .select(col("s"), col("p"), col("o")))
      .unionByName(TripleDerive.ownedRelTriplesFull(newRels)
        .select(col("s"), col("p"), col("o")))
  }

  /** The FULL post-merge triple store (J10 closure): every surviving
    * object's complete osm2rdf family — link/geometry/member triples
    * PLUS rdf:type / osmmeta:timestamp / osmkey tags / osm2rdf:facts
    * (/root/reference/src/osm/OsmDataFetcher.cpp:333-395,
    * src/sparql/QueryWriter.cpp:242-255) — derived from the merged
    * meta-carrying layers exactly as Replicator.applyOps maintains
    * them: changed objects take the change file's ts, everything
    * else keeps the stored layer ts; tag state stays closed-form.
    * `baseW` / `baseRels` are the stored-layer stand-ins (rebuilt
    * in-query for q70's oracle; StoredState parquet for q70b). */
  private def triplesAfterMerge(s: SparkSession, dir: String,
      baseW: DataFrame, baseRels: DataFrame): DataFrame = {
      val w = ChangePipeline.dedupLatest(SynthUniverse.changesFull(s, dir)).cache()
      val nodes0 = SynthUniverse.nodes(s, dir)
      val wm = SynthUniverse.wayMembers(s, dir)
      val rm = SynthUniverse.relMembers(s, dir)
      val st = ChangePipeline.staleWays(w, wm)
      // merged node layer + meta
      val ups = w.filter(col("kind") === "node" && col("action").isin("create", "modify"))
        .select(col("id").as("node_id"), col("lon").as("w_lon"),
          col("lat").as("w_lat"), col("ts").as("w_ts"))
      val dels = w.filter(col("kind") === "node" && col("action") === "delete")
        .select(col("id"))
      val mergedNodes = nodes0
        .join(dels, col("node_id") === col("id"), "left_anti")
        .join(ups, Seq("node_id"), "left")
        .select(col("node_id"),
          coalesce(col("w_lon"), col("lon")).as("lon"),
          coalesce(col("w_lat"), col("lat")).as("lat"),
          col("w_ts"))
        .unionByName(ups.join(nodes0, Seq("node_id"), "left_anti")
          .select(col("node_id"), col("w_lon").as("lon"), col("w_lat").as("lat"),
            col("w_ts")))
        .withColumn("ts", coalesce(col("w_ts"), SynthUniverse.synthTs(col("node_id"))))
        .drop("w_ts")
        .withColumn("tags", SynthUniverse.nodeTagMap(col("node_id")))
      // merged way layer (q52 shape) + meta
      val mergedCoords = ChangePipeline.applyNodeOps(nodes0, w)
      val wTs = w.filter(col("kind") === "way" && col("action").isin("create", "modify"))
        .select(col("id").as("way_id"), col("ts").as("w_ts"))
      val mergedWays = ChangePipeline.applyWayOps(baseW, w, wm, mergedCoords, st)
        .join(wTs, Seq("way_id"), "left")
        .withColumn("ts", coalesce(col("w_ts"), SynthUniverse.synthTs(col("way_id"))))
        .drop("w_ts")
        .withColumn("tags", SynthUniverse.wayTagMap(col("way_id")))
      // merged relation layer in the store's mtype/ref/role members
      // format (relations carry no geometry; content is formula-stable,
      // so post-merge = all base relations minus the deleted ones)
      val relDels = w.filter(col("kind") === "relation" && col("action") === "delete")
        .select(col("id").as("rel_id"))
      val rTs = w.filter(col("kind") === "relation" && col("action").isin("create", "modify"))
        .select(col("id").as("rel_id"), col("ts").as("w_ts"))
      val mergedRels = baseRels
        .join(relDels, Seq("rel_id"), "left_anti")
        .join(rTs, Seq("rel_id"), "left")
        .withColumn("ts", coalesce(col("w_ts"), SynthUniverse.synthTs(col("rel_id"))))
        .drop("w_ts")
        .withColumn("tags", SynthUniverse.relTagMap(col("rel_id")))
      // family derivation is single-pass (array-build + one explode per
      // layer), so each heavy merge/reconstruction DAG computes exactly
      // once — no layer cache needed
      TripleDerive.ownedNodeTriplesFull(mergedNodes)
        .unionByName(TripleDerive.ownedWayTriplesFull(mergedWays))
        .unionByName(TripleDerive.ownedRelTriplesFull(mergedRels))
        .select(col("s"), col("p"), col("o"))
  }

  private val winnersCte: String = SynthSql.winnersCte

  private val staleCte: String =
    """stale_ways AS (
      |  SELECT DISTINCT wm.way_id FROM way_members wm
      |  JOIN (SELECT id FROM winners WHERE kind='node' AND action='modify') mn
      |    ON wm.node_id = mn.id
      |  WHERE wm.way_id NOT IN (SELECT id FROM winners WHERE kind='way'))""".stripMargin

  private val staleRelsCte: String =
    """stale_rels AS (
      |  SELECT DISTINCT rm.rel_id FROM rel_members rm
      |  JOIN (SELECT id FROM winners WHERE kind='way' AND action='modify'
      |        UNION SELECT way_id AS id FROM stale_ways) pw
      |    ON rm.member_id = pw.id
      |  WHERE rm.rel_id NOT IN (SELECT id FROM winners WHERE kind='relation'))""".stripMargin

  private val oracles0: Map[String, String] = Map(
    "q23_rel_reconstruct" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.relMembersCte}, $staleCte, $staleRelsCte
         |SELECT rm.rel_id,
         |  STRING_AGG(CAST(rm.member_id AS VARCHAR) || '/' || rm.role, ';' ORDER BY rm.pos) AS members
         |FROM rel_members rm JOIN stale_rels sr ON rm.rel_id = sr.rel_id
         |GROUP BY rm.rel_id""".stripMargin,
    "q24_referenced_nodes" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte}, $staleCte
         |SELECT DISTINCT wm.node_id FROM way_members wm
         |JOIN stale_ways sw ON wm.way_id = sw.way_id
         |WHERE wm.node_id NOT IN (SELECT id FROM winners WHERE kind='node')""".stripMargin,
    "q25_rel_member_split" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.relMembersCte}, $staleCte, $staleRelsCte
         |SELECT rm.rel_id,
         |  CASE WHEN starts_with('osmway:' || rm.member_id, 'osmnode:') THEN 'node'
         |       WHEN starts_with('osmway:' || rm.member_id, 'osmway:') THEN 'way'
         |       ELSE 'relation' END AS member_kind,
         |  CAST(regexp_extract('osmway:' || rm.member_id, '(\\d+)$$', 1) AS BIGINT) AS member_ref
         |FROM rel_members rm JOIN stale_rels sr ON rm.rel_id = sr.rel_id""".stripMargin,
    "q26_insert_triples" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.waysCte}, ${SynthSql.nodesCte},
         |triples AS (
         |  SELECT 'osmnode:' || node_id AS s, 'geo:hasGeometry' AS p,
         |    'osm2rdfgeom:osm_node_' || node_id AS o FROM nodes
         |  UNION ALL
         |  SELECT 'osm2rdfgeom:osm_node_' || node_id AS s, 'geo:asWKT' AS p,
         |    'POINT(' || printf('%.7f', lon) || ' ' || printf('%.7f', lat) || ')' AS o
         |  FROM nodes),
         |ins AS (SELECT id FROM winners WHERE kind='node' AND action IN ('create','modify')),
         |kept1 AS (
         |  SELECT t.* FROM triples t
         |  WHERE starts_with(t.s, 'osmnode:')
         |    AND CAST(regexp_extract(t.s, '(\\d+)$$', 1) AS BIGINT) IN (SELECT id FROM ins)),
         |kept2 AS (
         |  SELECT t.* FROM triples t
         |  WHERE t.s IN (SELECT o FROM kept1 WHERE p = 'geo:hasGeometry'))
         |SELECT * FROM kept1 UNION ALL SELECT * FROM kept2""".stripMargin,
    "q27_multipolygon_areas" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte
         |SELECT id AS way_id FROM winners
         |WHERE kind='way' AND action IN ('create','modify')
         |  AND id % 4 = 0 AND id IN (SELECT o_orderkey FROM orders)""".stripMargin,
    "q33_classify_changes" ->
      s"""WITH ${SynthSql.changesCte}
         |SELECT kind, action, COUNT(*) AS n FROM changes GROUP BY kind, action""".stripMargin,
    "q34_changes_dedup" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte
         |SELECT kind, id, action, version, seq FROM winners""".stripMargin,
    "q35_ways_stale" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte}, $staleCte
         |SELECT way_id FROM stale_ways""".stripMargin,
    "q36_rels_stale" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.relMembersCte}, $staleCte, $staleRelsCte
         |SELECT rel_id FROM stale_rels""".stripMargin,
    "q37_way_reconstruct" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.waysCte}, ${SynthSql.nodesCte}, $staleCte
         |SELECT wm.way_id,
         |  STRING_AGG(CAST(wm.node_id AS VARCHAR), ';' ORDER BY wm.pos) AS members,
         |  'LINESTRING(' || STRING_AGG(printf('%.7f %.7f', n.lon, n.lat), ', ' ORDER BY wm.pos) || ')' AS wkt
         |FROM way_members wm
         |JOIN stale_ways sw ON wm.way_id = sw.way_id
         |JOIN nodes n ON wm.node_id = n.node_id
         |GROUP BY wm.way_id""".stripMargin,
    "q38_delete_set" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.relMembersCte}, $staleCte, $staleRelsCte
         |SELECT kind, id FROM winners WHERE action IN ('delete','modify')
         |UNION
         |SELECT 'way' AS kind, way_id AS id FROM stale_ways
         |UNION
         |SELECT 'relation' AS kind, rel_id AS id FROM stale_rels""".stripMargin,
    "q39_node_triples" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.waysCte}, ${SynthSql.nodesCte},
         |ops AS (
         |  SELECT id, lon, lat, ts, 'osmnode:' || id AS s FROM winners
         |  WHERE kind='node' AND action IN ('create','modify')),
         |node_tags AS (
         |  SELECT node_id AS tag_id, 'k' || (node_id % 5) AS k, 'v' || (node_id % 7) AS v
         |  FROM nodes)
         |SELECT s, 'rdf:type' AS p, 'osm:node' AS o FROM ops
         |UNION ALL
         |SELECT s, 'geo:asWKT' AS p,
         |  'POINT(' || printf('%.7f', lon) || ' ' || printf('%.7f', lat) || ')' AS o FROM ops
         |UNION ALL
         |SELECT s, 'osmmeta:timestamp' AS p, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS o FROM ops
         |UNION ALL
         |SELECT s, 'osmkey:' || t.k AS p, t.v AS o
         |FROM ops JOIN node_tags t ON ops.id = t.tag_id
         |UNION ALL
         |SELECT s, 'osm2rdf:facts' AS p,
         |  CAST(COUNT(t.tag_id) AS VARCHAR) AS o
         |FROM ops LEFT JOIN node_tags t ON ops.id = t.tag_id GROUP BY s""".stripMargin,
    "q40_nodes_after_merge" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.waysCte}, ${SynthSql.nodesCte},
         |ups AS (SELECT id, lon, lat FROM winners
         |        WHERE kind='node' AND action IN ('create','modify')),
         |dels AS (SELECT id FROM winners WHERE kind='node' AND action='delete')
         |SELECT n.node_id,
         |  CAST(ROUND(COALESCE(u.lon, n.lon)*10000000,0) AS BIGINT) AS lon_e7,
         |  CAST(ROUND(COALESCE(u.lat, n.lat)*10000000,0) AS BIGINT) AS lat_e7
         |FROM nodes n LEFT JOIN ups u ON n.node_id = u.id
         |WHERE n.node_id NOT IN (SELECT id FROM dels)
         |UNION ALL
         |SELECT u.id AS node_id,
         |  CAST(ROUND(u.lon*10000000,0) AS BIGINT) AS lon_e7,
         |  CAST(ROUND(u.lat*10000000,0) AS BIGINT) AS lat_e7
         |FROM ups u WHERE u.id NOT IN (SELECT node_id FROM nodes)""".stripMargin,
    "q52_ways_after_merge" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.waysCte}, ${SynthSql.nodesCte}, $staleCte,
         |ups AS (SELECT id, lon, lat FROM winners
         |        WHERE kind='node' AND action IN ('create','modify')),
         |dels AS (SELECT id FROM winners WHERE kind='node' AND action='delete'),
         |merged_nodes AS (
         |  SELECT n.node_id, COALESCE(u.lon, n.lon) AS lon, COALESCE(u.lat, n.lat) AS lat
         |  FROM nodes n LEFT JOIN ups u ON n.node_id = u.id
         |  WHERE n.node_id NOT IN (SELECT id FROM dels)
         |  UNION ALL
         |  SELECT u.id AS node_id, u.lon, u.lat FROM ups u
         |  WHERE u.id NOT IN (SELECT node_id FROM nodes)),
         |base AS (
         |  SELECT wm.way_id,
         |    STRING_AGG(CAST(wm.node_id AS VARCHAR), ';' ORDER BY wm.pos) AS members,
         |    'LINESTRING(' || STRING_AGG(printf('%.7f %.7f', n.lon, n.lat), ', ' ORDER BY wm.pos) || ')' AS wkt
         |  FROM way_members wm JOIN nodes n ON wm.node_id = n.node_id
         |  GROUP BY wm.way_id),
         |upsert_ids AS (
         |  SELECT id AS way_id FROM winners WHERE kind='way' AND action IN ('create','modify')
         |  UNION SELECT way_id FROM stale_ways),
         |upserts AS (
         |  SELECT wm.way_id,
         |    STRING_AGG(CAST(wm.node_id AS VARCHAR), ';' ORDER BY wm.pos) AS members,
         |    'LINESTRING(' || STRING_AGG(printf('%.7f %.7f', mn.lon, mn.lat), ', ' ORDER BY wm.pos) || ')' AS wkt
         |  FROM way_members wm
         |  JOIN upsert_ids ui ON wm.way_id = ui.way_id
         |  JOIN merged_nodes mn ON wm.node_id = mn.node_id
         |  GROUP BY wm.way_id),
         |gone AS (
         |  SELECT id AS way_id FROM winners WHERE kind='way' AND action='delete'
         |  UNION SELECT way_id FROM upsert_ids)
         |SELECT way_id, members, wkt FROM base
         |WHERE way_id NOT IN (SELECT way_id FROM gone)
         |UNION ALL
         |SELECT way_id, members, wkt FROM upserts""".stripMargin,
    "q53_rels_after_merge" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.relMembersCte}, $staleCte, $staleRelsCte,
         |base AS (
         |  SELECT rm.rel_id,
         |    STRING_AGG(CAST(rm.member_id AS VARCHAR) || '/' || rm.role, ';' ORDER BY rm.pos) AS members
         |  FROM rel_members rm GROUP BY rm.rel_id),
         |upsert_ids AS (
         |  SELECT id AS rel_id FROM winners WHERE kind='relation' AND action IN ('create','modify')
         |  UNION SELECT rel_id FROM stale_rels),
         |upserts AS (
         |  SELECT rm.rel_id,
         |    STRING_AGG(CAST(rm.member_id AS VARCHAR) || '/' || rm.role, ';' ORDER BY rm.pos) AS members
         |  FROM rel_members rm JOIN upsert_ids ui ON rm.rel_id = ui.rel_id
         |  GROUP BY rm.rel_id),
         |gone AS (
         |  SELECT id AS rel_id FROM winners WHERE kind='relation' AND action='delete'
         |  UNION SELECT rel_id FROM upsert_ids)
         |SELECT rel_id, members FROM base
         |WHERE rel_id NOT IN (SELECT rel_id FROM gone)
         |UNION ALL
         |SELECT rel_id, members FROM upserts""".stripMargin,
    "q70_triples_after_merge" ->
      s"""WITH ${SynthSql.changesCte}, $winnersCte, ${SynthSql.wayMembersCte},
         |  ${SynthSql.relMembersCte}, ${SynthSql.waysCte}, ${SynthSql.nodesCte}, $staleCte,
         |ups AS (SELECT id, lon, lat, ts FROM winners
         |        WHERE kind='node' AND action IN ('create','modify')),
         |dels AS (SELECT id FROM winners WHERE kind='node' AND action='delete'),
         |merged_nodes AS (
         |  SELECT n.node_id, COALESCE(u.lon, n.lon) AS lon, COALESCE(u.lat, n.lat) AS lat,
         |    COALESCE(u.ts, ${SynthSql.synthTsSql("n.node_id")}) AS ts
         |  FROM nodes n LEFT JOIN ups u ON n.node_id = u.id
         |  WHERE n.node_id NOT IN (SELECT id FROM dels)
         |  UNION ALL
         |  SELECT u.id, u.lon, u.lat, u.ts FROM ups u
         |  WHERE u.id NOT IN (SELECT node_id FROM nodes)),
         |way_upsert_ids AS (
         |  SELECT id AS way_id FROM winners WHERE kind='way' AND action IN ('create','modify')
         |  UNION SELECT way_id FROM stale_ways),
         |way_base AS (
         |  SELECT wm.way_id,
         |    'LINESTRING(' || STRING_AGG(printf('%.7f %.7f', n.lon, n.lat), ', ' ORDER BY wm.pos) || ')' AS wkt
         |  FROM way_members wm JOIN nodes n ON wm.node_id = n.node_id
         |  GROUP BY wm.way_id),
         |way_upserts AS (
         |  SELECT wm.way_id,
         |    'LINESTRING(' || STRING_AGG(printf('%.7f %.7f', mn.lon, mn.lat), ', ' ORDER BY wm.pos) || ')' AS wkt
         |  FROM way_members wm
         |  JOIN way_upsert_ids ui ON wm.way_id = ui.way_id
         |  JOIN merged_nodes mn ON wm.node_id = mn.node_id
         |  GROUP BY wm.way_id),
         |way_gone AS (
         |  SELECT id AS way_id FROM winners WHERE kind='way' AND action='delete'
         |  UNION SELECT way_id FROM way_upsert_ids),
         |merged_ways AS (
         |  SELECT way_id, wkt FROM way_base WHERE way_id NOT IN (SELECT way_id FROM way_gone)
         |  UNION ALL SELECT way_id, wkt FROM way_upserts),
         |merged_ways_meta AS (
         |  SELECT mw.way_id, mw.wkt,
         |    COALESCE(wt.ts, ${SynthSql.synthTsSql("mw.way_id")}) AS ts
         |  FROM merged_ways mw
         |  LEFT JOIN (SELECT id, ts FROM winners WHERE kind='way' AND action IN ('create','modify')) wt
         |    ON mw.way_id = wt.id),
         |way_members_out AS (
         |  SELECT wm.way_id, wm.pos AS mpos, wm.node_id FROM way_members wm
         |  WHERE wm.way_id IN (SELECT way_id FROM merged_ways)
         |    AND wm.way_id NOT IN (SELECT way_id FROM way_upsert_ids)
         |  UNION ALL
         |  SELECT wm.way_id,
         |    ROW_NUMBER() OVER (PARTITION BY wm.way_id ORDER BY wm.pos) - 1 AS mpos,
         |    wm.node_id
         |  FROM way_members wm
         |  JOIN way_upsert_ids ui ON wm.way_id = ui.way_id
         |  JOIN merged_nodes mn ON wm.node_id = mn.node_id
         |  WHERE wm.way_id IN (SELECT way_id FROM merged_ways)),
         |merged_rels AS (
         |  SELECT DISTINCT rel_id FROM rel_members
         |  WHERE rel_id NOT IN (SELECT id FROM winners WHERE kind='relation' AND action='delete')),
         |merged_rels_meta AS (
         |  SELECT r.rel_id, COALESCE(wt.ts, ${SynthSql.synthTsSql("r.rel_id")}) AS ts
         |  FROM merged_rels r
         |  LEFT JOIN (SELECT id, ts FROM winners WHERE kind='relation' AND action IN ('create','modify')) wt
         |    ON r.rel_id = wt.id),
         |rel_members_out AS (
         |  SELECT rm.* FROM rel_members rm
         |  WHERE rm.rel_id IN (SELECT rel_id FROM merged_rels))
         |SELECT 'osmnode:' || node_id AS s, 'geo:hasGeometry' AS p,
         |  'osm2rdfgeom:osm_node_' || node_id AS o FROM merged_nodes
         |UNION ALL SELECT 'osm2rdfgeom:osm_node_' || node_id, 'geo:asWKT',
         |  'POINT(' || printf('%.7f', lon) || ' ' || printf('%.7f', lat) || ')' FROM merged_nodes
         |UNION ALL SELECT 'osmnode:' || node_id, 'rdf:type', 'osm:node' FROM merged_nodes
         |UNION ALL SELECT 'osmnode:' || node_id, 'osmmeta:timestamp',
         |  strftime(ts, '%Y-%m-%dT%H:%M:%S') FROM merged_nodes
         |UNION ALL SELECT 'osmnode:' || node_id, 'osmkey:k' || (node_id % 5),
         |  'v' || (node_id % 7) FROM merged_nodes
         |UNION ALL SELECT 'osmnode:' || node_id, 'osm2rdf:facts', '1' FROM merged_nodes
         |UNION ALL SELECT 'osmway:' || way_id, 'osmway:member',
         |  'osm2rdfmember:way_' || way_id || '_' || mpos FROM way_members_out
         |UNION ALL SELECT 'osm2rdfmember:way_' || way_id || '_' || mpos,
         |  'osm2rdfmember:id', 'osmnode:' || node_id FROM way_members_out
         |UNION ALL SELECT 'osm2rdfmember:way_' || way_id || '_' || mpos,
         |  'osm2rdfmember:pos', CAST(mpos AS VARCHAR) FROM way_members_out
         |UNION ALL SELECT 'osmway:' || way_id, 'geo:asWKT', wkt
         |  FROM merged_ways_meta WHERE wkt IS NOT NULL
         |UNION ALL SELECT 'osmway:' || way_id, 'rdf:type', 'osm:way' FROM merged_ways_meta
         |UNION ALL SELECT 'osmway:' || way_id, 'osmmeta:timestamp',
         |  strftime(ts, '%Y-%m-%dT%H:%M:%S') FROM merged_ways_meta
         |UNION ALL SELECT 'osmway:' || way_id, 'osmkey:name', 'way_' || way_id FROM merged_ways_meta
         |UNION ALL SELECT 'osmway:' || way_id, 'osmkey:type', 'multipolygon'
         |  FROM merged_ways_meta WHERE way_id % 4 = 0
         |UNION ALL SELECT 'osmway:' || way_id, 'osm2rdf:facts',
         |  CASE WHEN way_id % 4 = 0 THEN '2' ELSE '1' END FROM merged_ways_meta
         |UNION ALL SELECT 'osmrel:' || rel_id, 'osmrel:member',
         |  'osm2rdfmember:rel_' || rel_id || '_' || pos FROM rel_members_out
         |UNION ALL SELECT 'osm2rdfmember:rel_' || rel_id || '_' || pos,
         |  'osm2rdfmember:id', 'osmway:' || member_id FROM rel_members_out
         |UNION ALL SELECT 'osm2rdfmember:rel_' || rel_id || '_' || pos,
         |  'osm2rdfmember:role', role FROM rel_members_out
         |UNION ALL SELECT 'osm2rdfmember:rel_' || rel_id || '_' || pos,
         |  'osm2rdfmember:pos', CAST(pos AS VARCHAR) FROM rel_members_out
         |UNION ALL SELECT 'osmrel:' || rel_id, 'rdf:type', 'osm:relation' FROM merged_rels_meta
         |UNION ALL SELECT 'osmrel:' || rel_id, 'osmmeta:timestamp',
         |  strftime(ts, '%Y-%m-%dT%H:%M:%S') FROM merged_rels_meta
         |UNION ALL SELECT 'osmrel:' || rel_id, 'osmkey:type',
         |  CASE WHEN rel_id % 4 = 3 THEN 'multipolygon' ELSE 'route' END FROM merged_rels_meta
         |UNION ALL SELECT 'osmrel:' || rel_id, 'osm2rdf:facts', '1' FROM merged_rels_meta""".stripMargin,
  )

  /** The stored-state bench twins must emit byte-identical results to
    * their rebuild-in-query originals — one truth, two read paths. */
  val oracles: Map[String, String] = oracles0 ++ Map(
    "q52b_stored_merge" -> oracles0("q52_ways_after_merge"),
    "q70b_stored_triples" -> oracles0("q70_triples_after_merge"))
}
