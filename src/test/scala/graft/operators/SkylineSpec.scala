package graft.operators

import graft.SparkTestBase

/** The bucket-pruned skyline must equal the quadratic brute-force
  * frontier on arbitrary distributions — correlated, anti-correlated,
  * duplicate-laden — and must REFUSE (fail loud) rather than silently
  * go quadratic when pruning cannot work. */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filterNot { d =>
      pts.exists(e => e._2 >= d._2 && e._3 >= d._3 &&
        (e._2 > d._2 || e._3 > d._3))
    }.toSet

  private def run(pts: Seq[(Long, Long, Long)], buckets: Int = 256) =
    Skyline.skyline2D(pts.toDF("id", "a", "b"), "a", "b", buckets = buckets)
      .as[(Long, Long, Long)].collect().toSet

  test("equals brute force on anti-correlated, correlated, and tied data") {
    val rnd = new scala.util.Random(42)
    // anti-correlated: rich frontier
    val anti = (1L to 400L).map { i =>
      val a = rnd.nextInt(1000).toLong
      (i, a, 1000L - a + rnd.nextInt(80))
    }
    // correlated: tiny frontier
    val corr = (1L to 400L).map { i =>
      val a = rnd.nextInt(1000).toLong
      (i, a, a + rnd.nextInt(30))
    }
    // heavy duplicates: equal points are mutually non-dominating
    val dup = (1L to 300L).map { i =>
      (i, (i % 7) * 10L, (i % 5) * 10L)
    }
    for (pts <- Seq(anti, corr, dup)) {
      val got = run(pts)
      val want = brute(pts)
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.forall(got.contains))
    }
  }

  test("few buckets still exact (pruning weaker, finish exact)") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 500L).map { i =>
      (i, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)
    }
    assert(run(pts, buckets = 2) == brute(pts))
  }

  test("refuses a degenerate distribution instead of going quadratic") {
    // all `a` equal: every row lands in one bucket, pruning is
    // powerless, and the survivor cap must fire
    val pts = (1L to 100L).map(i => (i, 5L, i))
    assert(run(pts, buckets = 4) == brute(pts)) // default cap: exact, slow path
    val e = intercept[IllegalArgumentException] {
      Skyline.skyline2D(pts.toDF("id", "a", "b"), "a", "b",
        buckets = 4, survivorCap = 10L).collect()
    }
    assert(e.getMessage.contains("survivor"))
  }
}
