package graft.spatial

import graft.SparkTestBase
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.functions._

/** ConvexHullExpr vs an independent brute-force extreme-point
  * reference (Carathéodory: a point is a hull vertex iff it is not on
  * a segment of two others and not inside-or-on a proper triangle of
  * three others) — exactly the predicate the q201 oracle runs. */
class ConvexHullExprSpec extends SparkTestBase {

  private def cross(ox: Long, oy: Long, ax: Long, ay: Long,
      bx: Long, by: Long): Long = (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  /** Brute-force extreme points of a distinct point set. */
  private def hullRef(ptsIn: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val pts = ptsIn.distinct
    pts.filter { p =>
      val others = pts.filterNot(_ == p)
      val onSegment = others.combinations(2).exists { case Seq(a, b) =>
        cross(a._1, a._2, b._1, b._2, p._1, p._2) == 0 &&
          p._1 >= math.min(a._1, b._1) && p._1 <= math.max(a._1, b._1) &&
          p._2 >= math.min(a._2, b._2) && p._2 <= math.max(a._2, b._2)
      }
      val inTriangle = others.combinations(3).exists { case Seq(a, b, c) =>
        val abc = cross(a._1, a._2, b._1, b._2, c._1, c._2)
        abc != 0 && {
          val s = if (abc > 0) 1L else -1L
          s * cross(a._1, a._2, b._1, b._2, p._1, p._2) >= 0 &&
            s * cross(b._1, b._2, c._1, c._2, p._1, p._2) >= 0 &&
            s * cross(c._1, c._2, a._1, a._2, p._1, p._2) >= 0
        }
      }
      !onSegment && !inTriangle
    }
  }

  private def hullSpark(pts: Seq[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val df = Seq((pts.map(_._1), pts.map(_._2))).toDF("xs", "ys")
    val r = df.select(GraftSqlShim.column(ConvexHullExpr(
      GraftSqlShim.expression(col("xs")),
      GraftSqlShim.expression(col("ys")))).as("h"))
      .head().getSeq[Long](0)
    (r(0), r(1), r(2))
  }

  test("matches brute-force extreme points on 60 random sets (dups + collinear heavy)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 60) {
      // small coordinate range forces duplicates and collinear runs
      val range = if (trial % 3 == 0) 4 else 50
      val n = 1 + rnd.nextInt(14)
      val pts = Seq.fill(n)((rnd.nextInt(range).toLong, rnd.nextInt(range).toLong))
      val ref = hullRef(pts)
      val (nh, sx, sy) = hullSpark(pts)
      assert(nh === ref.length.toLong, s"trial $trial pts=$pts ref=$ref")
      assert(sx === ref.map(_._1).sum && sy === ref.map(_._2).sum,
        s"trial $trial pts=$pts ref=$ref")
    }
  }

  test("degenerate shapes: single point, segment, collinear run, square with interior") {
    assert(hullSpark(Seq((5L, 5L))) === ((1L, 5L, 5L)))
    assert(hullSpark(Seq((0L, 0L), (10L, 0L))) === ((2L, 10L, 0L)))
    // collinear: only the two endpoints are extreme
    assert(hullSpark(Seq((0L, 0L), (2L, 2L), (5L, 5L), (9L, 9L))) === ((2L, 9L, 9L)))
    // unit square + center + edge midpoint: 4 corners only
    val sq = Seq((0L, 0L), (4L, 0L), (4L, 4L), (0L, 4L), (2L, 2L), (2L, 0L))
    assert(hullSpark(sq) === ((4L, 8L, 8L)))
  }

  private def diamSpark(pts: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    val df = Seq((pts.map(_._1), pts.map(_._2))).toDF("xs", "ys")
    df.select(GraftSqlShim.column(DiameterExpr(
      GraftSqlShim.expression(col("xs")),
      GraftSqlShim.expression(col("ys")))).as("d")).head().getLong(0)
  }

  test("diameter via hull equals brute-force all-pairs max on 60 random sets") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 60) {
      val range = if (trial % 3 == 0) 5 else 1000
      val n = 1 + rnd.nextInt(16)
      val pts = Seq.fill(n)((rnd.nextInt(range).toLong, rnd.nextInt(range).toLong))
      val brute = (for (a <- pts; b <- pts) yield {
        val dx = a._1 - b._1; val dy = a._2 - b._2; dx * dx + dy * dy
      }).max
      assert(diamSpark(pts) === brute, s"trial $trial pts=$pts")
    }
  }
}
