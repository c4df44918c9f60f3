package graft.geo

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Hilbert curve: bijectivity (xy2d ∘ d2xy = id on the full grid),
  * the curve's defining adjacency invariant (consecutive positions are
  * grid neighbors — the property z-order lacks), the measured locality
  * win over z-order, and the codegen Expression agreeing with the
  * scalar through a real plan. */
class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  private def zval(ix: Long, iy: Long, bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits) {
      z |= ((ix >> b) & 1L) << (2 * b)
      z |= ((iy >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("bijective on the full order-5 grid and inverse of d2xy") {
    val order = 5
    val n = 1 << order
    val ds = for (x <- 0L until n; y <- 0L until n) yield Hilbert.xy2d(order, x, y)
    assert(ds.toSet == (0L until n.toLong * n).toSet)
    for (d <- 0L until n.toLong * n) {
      val (x, y) = Hilbert.d2xy(order, d)
      assert(Hilbert.xy2d(order, x, y) == d)
    }
  }

  test("consecutive curve positions are ALWAYS grid-adjacent (z-order is not)") {
    val order = 6
    val n = 1L << order
    var zBreaks = 0
    for (d <- 1L until n * n) {
      val (x0, y0) = Hilbert.d2xy(order, d - 1)
      val (x1, y1) = Hilbert.d2xy(order, d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"hilbert jump at d=$d: ($x0,$y0)->($x1,$y1)")
    }
    // contrast: walk z-order in z sequence and count non-adjacent steps
    val byZ = (for (x <- 0L until n; y <- 0L until n) yield (zval(x, y, order), x, y))
      .sortBy(_._1)
    zBreaks = byZ.sliding(2).count { case Seq((_, x0, y0), (_, x1, y1)) =>
      math.abs(x1 - x0) + math.abs(y1 - y0) != 1
    }
    assert(zBreaks > 0, "z-order should have non-adjacent consecutive steps")
  }

  test("locality: fewer contiguous curve runs per window query than z-order") {
    // The metric that matters for range reads (Moon et al., clustering
    // properties of the Hilbert curve): a rectangular query window is
    // served by K contiguous runs of curve positions — each run is one
    // sequential scan, each break a seek. Hilbert provably averages
    // fewer runs than z-order. (Mean NEIGHBOR gap goes the other way —
    // z-order wins that one — which is why run count is the metric.)
    val order = 6
    def runs(dOf: (Long, Long) => Long, x0: Long, y0: Long, w: Long): Int = {
      val ds = (for (x <- x0 until x0 + w; y <- y0 until y0 + w)
        yield dOf(x, y)).sorted
      1 + ds.sliding(2).count { case Seq(a, b) => b != a + 1 }
    }
    val rnd = new scala.util.Random(17)
    var hRuns = 0L; var zRuns = 0L
    for (_ <- 1 to 200) {
      val w = 2 + rnd.nextInt(7)
      val x0 = rnd.nextInt(64 - w.toInt).toLong
      val y0 = rnd.nextInt(64 - w.toInt).toLong
      hRuns += runs(Hilbert.xy2d(order, _, _), x0, y0, w)
      zRuns += runs(zval(_, _, order), x0, y0, w)
    }
    info(s"total runs over 200 windows: hilbert $hRuns vs z-order $zRuns")
    assert(hRuns < zRuns)
  }

  test("codegen expression matches the scalar through a DataFrame plan") {
    val order = 8
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.indexCol(order, col("x"), col("y")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) == Hilbert.xy2d(order, x, y))
  }
}
