package graft.osm

import graft.SparkTestBase

/** J4 relations-of-relations: disabled by default to match the
  * reference's shipped behavior (OsmChangeHandler.cpp:84-85), full
  * closure semantics behind `spark.graft.relsOfRels`. */
class RelsOfRelsSpec extends SparkTestBase {
  import spark.implicits._

  private val winners = Seq(
    // relation 2 modified; relation 4 itself in the change file
    ("relation", 2L, "modify"), ("relation", 4L, "modify"))
    .toDF("kind", "id", "action")

  private val relMembers = Seq(
    (1L, 2L, "relation", "outer"),  // rel 1 contains modified rel 2 -> stale
    (4L, 2L, "relation", "outer"),  // rel 4 contains it too but is itself changed -> excluded
    (3L, 5L, "way", "inner"),       // way member only -> untouched
    (6L, 7L, "relation", "inner"))  // references an unmodified relation
    .toDF("rel_id", "member_id", "member_kind", "role")

  private val noStale = Seq.empty[Long].toDF("rel_id")

  test("default off: returns the empty set (reference-disabled parity)") {
    spark.conf.unset("spark.graft.relsOfRels")
    val out = ChangePipeline.staleRelsOfRels(winners, relMembers, noStale)
    assert(out.isEmpty)
  }

  test("flag on: modified/stale relations propagate to their parents") {
    spark.conf.set("spark.graft.relsOfRels", "true")
    try {
      val out = ChangePipeline.staleRelsOfRels(winners, relMembers, noStale)
        .as[Long].collect().toSet
      assert(out === Set(1L))
      // a stale relation feeds the probe set like a modified one
      val withStale = ChangePipeline.staleRelsOfRels(winners, relMembers,
        Seq(7L).toDF("rel_id")).as[Long].collect().toSet
      assert(withStale === Set(1L, 6L))
    } finally spark.conf.unset("spark.graft.relsOfRels")
  }
}
