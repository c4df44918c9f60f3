package graft.bench

import graft.{Bench, SparkTestBase}
import graft.spatial.SpatialJoin
import graft.synth.SynthUniverse
import org.apache.spark.sql.functions._

/** The e2e ring-densify knob (SPARK_GRAFT_RING_DENSIFY) must be a
  * pure PAYLOAD inflation: collinear edge splits may never change the
  * PIP join's output, only the bytes each candidate drags through the
  * cover shuffle. */
class RingDensifySpec extends SparkTestBase {

  test("densified rings produce the identical PIP join output") {
    val pts = SynthUniverse.points(spark, sfSmoke)
      .select(col("doc_id"), col("lon"), col("lat"))
    val polys = SpatialJoin.polygons(
      SynthUniverse.wayMembers(spark, sfSmoke), SynthUniverse.nodes(spark, sfSmoke))
    val dense = polys.select(col("way_id"),
      Bench.densifyUdf(col("xs"), lit(16)).as("xs"),
      Bench.densifyUdf(col("ys"), lit(16)).as("ys"))
    def hits(p: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      SpatialJoin.pipJoin(pts, p, res = 7)
        .select(col("doc_id"), col("way_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = hits(polys)
    assert(base.nonEmpty)
    assert(hits(dense) === base)
  }

  test("densify inserts exactly k collinear points per edge") {
    import spark.implicits._
    val out = Seq(Seq(0.0, 1.0, 3.0)).toDF("vs")
      .select(Bench.densifyUdf(col("vs"), lit(3)).as("d"))
      .as[Seq[Double]].collect()(0)
    assert(out === Seq(0.0, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 2.5, 3.0))
  }
}
