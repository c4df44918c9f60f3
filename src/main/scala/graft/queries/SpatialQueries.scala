package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.{SynthSql, SynthUniverse}
import graft.spatial.SpatialJoin
import graft.geo.GeoFunctions

/** The north-rule spatial core, oracle-checked end-to-end:
  * geo-entity extraction from page text, cell-prefiltered
  * point-in-polygon join, kNN against the polygon layer, and
  * raster / vector tile materialization.
  *
  * The Spark side runs the REAL machinery (ordered ring reconstruction
  * from way_members ⋈ nodes, JTS cover/covers, cell arithmetic); the
  * DuckDB oracle exploits the synthetic rectangles' closed form
  * (BETWEEN bounds) — agreement proves the general path correct on
  * this universe.
  */
object SpatialQueries {

  val PipRes = 6   // cell edge (5.63° x 2.81°) vs max polygon edge 4.5° — cover stays <= ~6 cells
  val TileRes = 5

  private def polys(s: SparkSession, dir: String): DataFrame =
    SpatialJoin.polygons(SynthUniverse.wayMembers(s, dir), SynthUniverse.nodes(s, dir))

  /** bbox-center centroids; formula mirrored exactly in the oracle. */
  def centroids(s: SparkSession, dir: String): DataFrame =
    polys(s, dir).select(col("way_id"),
      ((array_min(col("xs")) + array_max(col("xs"))) / 2.0).as("cx"),
      ((array_min(col("ys")) + array_max(col("ys"))) / 2.0).as("cy"))

  /** kNN target layer: every 40th polygon (brute force is the exact
    * baseline — quadratic, so the probe layer is kept bounded; the
    * scale path is [[graft.spatial.SpatialJoin.nearestByRings]]). */
  def knnLayer(s: SparkSession, dir: String): DataFrame =
    centroids(s, dir).filter(col("way_id") % 40 === 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_extract_entities" -> ((s, dir) =>
      SynthUniverse.points(s, dir).select(
        col("doc_id"), col("entity"),
        round(col("lon") * 1e7, 0).cast("long").as("lon_e7"),
        round(col("lat") * 1e7, 0).cast("long").as("lat_e7"))),
    "q30_pip_join" -> ((s, dir) =>
      SpatialJoin.pipJoin(SynthUniverse.points(s, dir), polys(s, dir), PipRes)
        .select(col("doc_id"), col("entity"), col("way_id"))),
    "q30b_pip_join_salted" -> ((s, dir) =>
      // identical output over the partitioned+salted path (north rule:
      // explicit skew mitigation must preserve exact join output)
      // low hotThreshold so the histogram pre-pass actually salts the
      // gazetteer hot cells here — the oracle then PROVES the salted
      // plan's output is exactly the unsalted join's output
      SpatialJoin.pipJoin(SynthUniverse.points(s, dir), polys(s, dir), PipRes,
          mode = "partitioned", salt = 8, hotThreshold = 500L)
        .select(col("doc_id"), col("entity"), col("way_id"))),
    "q31_knn" -> ((s, dir) =>
      SpatialJoin.knnBroadcast(SynthUniverse.points(s, dir), knnLayer(s, dir), 3)
        .select(col("doc_id"), col("entity"), col("rank"),
          col("way_id").as("nearest_way"),
          round(col("d2") * 1e9, 0).cast("long").as("d2_e9"))),
    "q31b_knn_rings" -> ((s, dir) =>
      // the 100 TB path: ring-expansion kNN with a k-th-distance moat —
      // must emit exactly q31's rows (same oracle)
      SpatialJoin.knnByRings(SynthUniverse.points(s, dir), knnLayer(s, dir),
          res = 5, k = 3)
        .select(col("doc_id"), col("entity"), col("rank"),
          col("way_id").as("nearest_way"),
          round(col("d2") * 1e9, 0).cast("long").as("d2_e9"))),
    "q32_raster_tiles" -> ((s, dir) =>
      SynthUniverse.points(s, dir)
        .withColumn("tile", GeoFunctions.cellAt(col("lon"), col("lat"), TileRes))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n_points"),
          countDistinct(col("doc_id")).as("n_docs"))),
    "q32b_vector_tiles" -> ((s, dir) =>
      centroids(s, dir)
        .withColumn("tile", GeoFunctions.cellAt(col("cx"), col("cy"), TileRes))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n_polys"),
          array_join(sort_array(collect_list(col("way_id"))), ";").as("poly_ids"))),
  )

  lazy val oracles: Map[String, String] = Map(
    "q29_extract_entities" ->
      s"""WITH ${SynthSql.pointsCte}
         |SELECT doc_id, entity,
         |  CAST(ROUND(lon*10000000,0) AS BIGINT) AS lon_e7,
         |  CAST(ROUND(lat*10000000,0) AS BIGINT) AS lat_e7
         |FROM points""".stripMargin,
    "q30_pip_join" ->
      s"""WITH ${SynthSql.waysCte}, ${SynthSql.pointsCte}
         |SELECT doc_id, entity, way_id
         |FROM points JOIN ways
         |  ON lon BETWEEN x0 AND x0 + w AND lat BETWEEN y0 AND y0 + h""".stripMargin,
    "q30b_pip_join_salted" ->
      s"""WITH ${SynthSql.waysCte}, ${SynthSql.pointsCte}
         |SELECT doc_id, entity, way_id
         |FROM points JOIN ways
         |  ON lon BETWEEN x0 AND x0 + w AND lat BETWEEN y0 AND y0 + h""".stripMargin,
    "q31b_knn_rings" -> knnOracle,
    "q31_knn" -> knnOracle,
  ) ++ tileOracles

  /** One oracle for both kNN paths — the ring path must reproduce the
    * brute-force rows exactly. */
  private lazy val knnOracle: String =
      s"""WITH ${SynthSql.waysCte}, ${SynthSql.pointsCte},
         |cents AS (
         |  SELECT way_id, (x0 + (x0 + w)) / 2.0 AS cx, (y0 + (y0 + h)) / 2.0 AS cy
         |  FROM ways WHERE way_id % 40 = 0)
         |SELECT doc_id, entity, rank, way_id AS nearest_way,
         |  CAST(ROUND(d2*1000000000,0) AS BIGINT) AS d2_e9
         |FROM (
         |  SELECT p.doc_id, p.entity, c.way_id,
         |    (p.lon - c.cx)*(p.lon - c.cx) + (p.lat - c.cy)*(p.lat - c.cy) AS d2,
         |    ROW_NUMBER() OVER (PARTITION BY p.doc_id, p.entity
         |      ORDER BY (p.lon - c.cx)*(p.lon - c.cx) + (p.lat - c.cy)*(p.lat - c.cy) ASC,
         |               c.way_id ASC) AS rank
         |  FROM points p, cents c)
         |WHERE rank <= 3""".stripMargin

  private val tileOracles: Map[String, String] = Map(
    "q32_raster_tiles" ->
      s"""WITH ${SynthSql.pointsCte}
         |SELECT ${GeoFunctions.cellAtSql("lon", "lat", TileRes)} AS tile,
         |  COUNT(*) AS n_points, COUNT(DISTINCT doc_id) AS n_docs
         |FROM points GROUP BY 1""".stripMargin,
    "q32b_vector_tiles" ->
      s"""WITH ${SynthSql.waysCte},
         |cents AS (
         |  SELECT way_id, (x0 + (x0 + w)) / 2.0 AS cx, (y0 + (y0 + h)) / 2.0 AS cy
         |  FROM ways)
         |SELECT ${GeoFunctions.cellAtSql("cx", "cy", TileRes)} AS tile,
         |  COUNT(*) AS n_polys,
         |  STRING_AGG(CAST(way_id AS VARCHAR), ';' ORDER BY way_id) AS poly_ids
         |FROM cents GROUP BY 1""".stripMargin,
  )
}
