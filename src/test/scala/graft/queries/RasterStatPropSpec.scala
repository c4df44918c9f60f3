package graft

import org.apache.spark.sql.functions._

/** The raster statistics must equal brute force on RANDOM occupied
  * grids — the oracle only ever sees the entity-anchored synthetic
  * density, which never exercises edge clamping on all four borders,
  * checkerboard adjacency, or negative autocorrelation. */
class RasterStatPropSpec extends SparkTestBase {

  private val n = 16L

  private def randomCells(seed: Int, density: Double): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (for {
      ix <- 0L until n
      iy <- 0L until n
      if rnd.nextDouble() < density
    } yield (ix, iy, 1L + rnd.nextInt(50).toLong)).toSeq
  }

  test("IDW surface matches brute force (borders included)") {
    import spark.implicits._
    val cells = randomCells(7, 0.4) ++
      Seq((0L, 0L, 9L), (n - 1, n - 1, 9L)) // force corner clamping
    val dedup = cells.groupBy(c => (c._1, c._2))
      .map { case ((x, y), cs) => (x, y, cs.map(_._3).sum) }.toSeq
    val got = queries.SpatialQueries.idwOf(dedup.toDF("ix", "iy", "cnt"), n)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val m = dedup.map(c => (c._1, c._2) -> c._3).toMap
    val want = dedup.map { case (ix, iy, cnt) =>
      // only occupied in-grid sources contribute, weight by offset
      var num = 0L; var den = 0L
      for (dx <- -2L to 2L; dy <- -2L to 2L) {
        val (sx, sy) = (ix + dx, iy + dy)
        if (sx >= 0 && sx < n && sy >= 0 && sy < n) {
          m.get((sx, sy)).foreach { c =>
            val w = 1000000L / (1 + dx * dx + dy * dy)
            num += c * w; den += w
          }
        }
      }
      (ix, iy) -> ((cnt, num, den, 1000L * num / den))
    }.toMap
    assert(got == want)
    // clamping mattered: the corner cells must have fewer kernel
    // contributions than an interior cell would
    assert(want((0L, 0L))._3 < want.values.map(_._3).max)
  }

  test("Moran's I matches brute force on clustered, checkerboard, and random grids") {
    import spark.implicits._
    def brute(cells: Seq[(Long, Long, Long)]): (Long, Long, Long) = {
      val nc = cells.length.toLong
      val s = cells.map(_._3).sum
      val d = cells.map(c => (c._1, c._2) -> (nc * c._3 - s)).toMap
      var pHalf = BigInt(0); var wHalf = 0L
      for (((ix, iy), dv) <- d; (ox, oy) <- Seq((1L, 0L), (0L, 1L))) {
        d.get((ix + ox, iy + oy)).foreach { d2 =>
          pHalf += BigInt(dv) * BigInt(d2); wHalf += 1
        }
      }
      val dd = d.values.map(v => BigInt(v) * BigInt(v)).sum
      val sign = if (pHalf < 0) -1L else 1L
      val ppm = sign * ((BigInt(1000000) * nc * pHalf * 2).abs /
        (BigInt(wHalf) * 2 * dd)).toLong
      (nc, wHalf * 2, ppm)
    }
    val grids = Seq(
      // clustered: one dense blob -> positive I
      (for (ix <- 2L to 6L; iy <- 2L to 6L) yield (ix, iy, 40L)) ++
        (for (ix <- 10L to 14L; iy <- 10L to 14L) yield (ix, iy, 2L)),
      // checkerboard of high/low -> negative I
      (for (ix <- 0L until n; iy <- 0L until n)
        yield (ix, iy, if ((ix + iy) % 2 == 0) 50L else 1L)),
      randomCells(23, 0.5))
    var signs = Set.empty[Long]
    grids.foreach { g =>
      val cells = g.toSeq
      val (nc, wp, ppm) = brute(cells)
      val row = queries.SpatialQueries.moranOf(cells.toDF("ix", "iy", "cnt"))
        .collect().head
      assert(row.getLong(0) == nc && row.getLong(1) == wp,
        s"counts ${row.getLong(0)}/${row.getLong(1)} vs $nc/$wp")
      assert(row.getLong(4) == ppm, s"moran ${row.getLong(4)} vs $ppm")
      signs += ppm.sign
    }
    assert(signs.contains(1L) && signs.contains(-1L),
      "fixtures must exercise both positive and negative autocorrelation")
  }
}
