package graft.spatial

import graft.SparkTestBase
import graft.queries.SpatialQueries

/** q91: the window and the per-user aggregate must share ONE
  * user_id exchange (the groupBy reuses the window's partitioning). */
class TrajectorySpec extends SparkTestBase {

  test("trajectory length plans exactly one key exchange") {
    val plan = SpatialQueries.queries("q91_trajectory_length")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    val keyExchanges = "hashpartitioning".r.findAllIn(plan).size
    assert(keyExchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }
}
