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
  }
}
