package graft

import org.apache.spark.sql.GraftSqlShim

/** The production extension wiring (spark.sql.extensions =
  * graft.GraftExtensions) must register every native expression as a
  * SQL function and inject the PIP rewrite rule. */
class GraftExtensionsSpec extends SparkTestBase {

  test("the extensions module registers the full SQL function surface") {
    GraftSqlShim.applyExtensions(spark, new GraftExtensions)
    val r = spark.sql(
      """SELECT
        |  pip_contains(array(0D,4D,4D,0D), array(0D,0D,4D,4D), 1.0D, 1.0D) AS hit,
        |  pip_contains(array(0D,4D,4D,0D), array(0D,0D,4D,4D), 9.0D, 1.0D) AS miss,
        |  intersection_area(array(0D,2D,2D,0D), array(0D,0D,2D,2D),
        |                    array(1D,3D,3D,1D), array(1D,1D,3D,3D)) AS ia,
        |  cell_at(13.5D, 42.7D, 6) AS c,
        |  cover_cells(array(13D,14D,14D,13D), array(42D,42D,43D,43D), 6) AS cov
        |""".stripMargin).collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getLong(3) === geo.CellIndex.cellAt(13.5, 42.7, 6))
    assert(r.getSeq[Long](4).contains(r.getLong(3)))
    // the optimizer rule rode along (and dedups on re-application)
    GraftSqlShim.applyExtensions(spark, new GraftExtensions)
    assert(spark.experimental.extraOptimizations
      .count(_ eq graft.spatial.PipJoinRewrite) === 1)
    spark.experimental.extraOptimizations = spark.experimental
      .extraOptimizations.filterNot(_ eq graft.spatial.PipJoinRewrite)
  }

  test("a PIP join written in pure SQL rewrites to the cell equi-join") {
    import org.apache.spark.sql.functions.col
    GraftSqlShim.applyExtensions(spark, new GraftExtensions)
    try {
      synth.SynthUniverse.points(spark, sfSmoke).createOrReplaceTempView("pts")
      spatial.SpatialJoin.polygons(
          synth.SynthUniverse.wayMembers(spark, sfSmoke),
          synth.SynthUniverse.nodes(spark, sfSmoke))
        .createOrReplaceTempView("gons")
      val df = spark.sql(
        """SELECT p.doc_id, p.entity, g.way_id
          |FROM pts p JOIN gons g
          |  ON pip_contains(g.xs, g.ys, p.lon, p.lat)""".stripMargin)
      assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"),
        "the SQL-text PIP join must rewrite away the cross product")
      val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val expect = spatial.SpatialJoin.pipJoin(
          synth.SynthUniverse.points(spark, sfSmoke),
          spatial.SpatialJoin.polygons(
            synth.SynthUniverse.wayMembers(spark, sfSmoke),
            synth.SynthUniverse.nodes(spark, sfSmoke)), 6)
        .select(col("doc_id"), col("entity"), col("way_id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expect && got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = spark.experimental
        .extraOptimizations.filterNot(_ eq graft.spatial.PipJoinRewrite)
      Bench.clearState(spark)
    }
  }
}
