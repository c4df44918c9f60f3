package graft

import org.apache.spark.sql.functions._

/** The strip-sweep union area must equal brute-force interval merging
  * on ARBITRARY integer rectangles — the oracle only ever sees the
  * 0.1°-quantized synthetic grid, so overlapping, nested, duplicate,
  * and touching rects from a seeded PRNG guard the merge logic
  * (island splits, runmax ties, dedup) beyond it. */
class UnionAreaPropSpec extends SparkTestBase {

  private def brute(rects: Seq[(Long, Long, Long, Long, Long)]): Map[Long, Long] =
    rects.groupBy(_._1).map { case (g, rs) =>
      val strips = rs.flatMap { case (_, x0, y0, w, h) =>
        (x0 until x0 + w).map(sx => (sx, (y0, y0 + h)))
      }.groupBy(_._1)
      var area = 0L
      strips.values.foreach { ivsRaw =>
        val ivs = ivsRaw.map(_._2).sorted
        var cs = Long.MinValue
        var ce = Long.MinValue
        ivs.foreach { case (s0, e0) =>
          if (cs == Long.MinValue) { cs = s0; ce = e0 }
          else if (s0 > ce) { area += ce - cs; cs = s0; ce = e0 }
          else ce = math.max(ce, e0)
        }
        if (cs != Long.MinValue) area += ce - cs
      }
      g -> area
    }

  test("random rects (overlap/nest/dup/touch) match brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val rects = (0 until 400).map { i =>
      val g = (i % 3).toLong
      val x0 = (rnd.nextInt(60) - 30).toLong
      val y0 = (rnd.nextInt(60) - 30).toLong
      val w = (1 + rnd.nextInt(20)).toLong
      val h = (1 + rnd.nextInt(20)).toLong
      (g, x0, y0, w, h)
    } ++ Seq( // forced edge shapes in a separate group
      (9L, 0L, 0L, 10L, 10L), (9L, 0L, 0L, 10L, 10L),   // exact duplicate
      (9L, 2L, 2L, 3L, 3L),                             // fully nested
      (9L, 0L, 10L, 10L, 5L),                           // touching edge (merge)
      (9L, 20L, 0L, 5L, 5L), (9L, 25L, 5L, 5L, 5L))     // corner touch (disjoint y per strip)
    val df = rects.toDF("grp", "x010", "y0i", "w10", "h10")
    val got = queries.SpatialQueries.unionAreaByStrips(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = brute(rects)
    assert(got == want, s"strip sweep $got vs brute $want")
    // non-vacuous: real overlap happened (union < sum of areas)
    val sums = rects.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => r._4 * r._5).sum
    }
    assert((0L to 2L).forall(g => want(g) < sums(g)),
      "random groups never overlapped — widen the rects")
  }
}
