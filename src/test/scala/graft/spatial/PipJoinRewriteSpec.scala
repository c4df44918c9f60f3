package graft.spatial

import graft.SparkTestBase
import graft.synth.SynthUniverse
import org.apache.spark.sql.functions._

/** The optimizer rule turns a naive cross-join PIP filter into the
  * cell-prefiltered equi-join, with byte-identical output. */
class PipJoinRewriteSpec extends SparkTestBase {

  private def naive() = {
    val pts = SynthUniverse.points(spark, sfSmoke)
    val polys = SpatialJoin.polygons(
      SynthUniverse.wayMembers(spark, sfSmoke), SynthUniverse.nodes(spark, sfSmoke))
    pts.crossJoin(polys)
      .filter(PointInRingExpr.pipContains(
        col("xs"), col("ys"), col("lon"), col("lat")))
      .select(col("doc_id"), col("entity"), col("way_id"))
  }

  test("rewrite fires: optimized plan joins on the cell, not a cross product") {
    spark.experimental.extraOptimizations = Seq(PipJoinRewrite)
    try {
      val df = naive()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("_graft_cell"), optimized.take(2000))
      assert(!df.queryExecution.executedPlan.toString
        .contains("CartesianProduct"), "cross product survived the rewrite")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewritten output rows are identical to the unrewritten cross join") {
    val baseline = naive().collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    spark.experimental.extraOptimizations = Seq(PipJoinRewrite)
    try {
      val rewritten = naive().collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rewritten === baseline)
      assert(baseline.nonEmpty)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
