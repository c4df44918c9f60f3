package graft.operators

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucket prefilter: negative values, inclusive boundaries, no dupes") {
    val pts = Seq((1L, -7.5), (2L, -5.0), (3L, 0.0), (4L, 3.0), (5L, 99.0))
      .toDF("id", "v")
    val ints = Seq((10L, -8.0, -6.0), (20L, -6.0, 0.0), (30L, 2.9, 3.0),
      (40L, -100.0, 100.0)) // wide interval spans many buckets
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, "v", ints, "lo", "hi", 5.0)
      .select($"id", $"iid").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length, "each true pair exactly once")
    assert(got.toSet === Set(
      (1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L),
      (1L, 40L), (2L, 40L), (3L, 40L), (4L, 40L), (5L, 40L)))
  }
}
