package graft.spatial

import graft.SparkTestBase
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.functions._

/** DtwExpr vs an independent brute-force recursive DTW (memoised map,
  * written differently from the expression's rolling two-row DP) on
  * random integer tracks, plus degenerate shapes. */
class DtwExprSpec extends SparkTestBase {

  /** Textbook recursive DTW with memoisation — independent of the
    * expression's iterative implementation. */
  private def dtwRef(ax: Array[Long], ay: Array[Long],
      bx: Array[Long], by: Array[Long]): Long = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Long]
    def cost(i: Int, j: Int): Long = {
      val dx = ax(i) - bx(j); val dy = ay(i) - by(j)
      dx * dx + dy * dy
    }
    def go(i: Int, j: Int): Long = memo.getOrElseUpdate((i, j), {
      if (i == 0 && j == 0) cost(0, 0)
      else if (i == 0) cost(i, j) + go(0, j - 1)
      else if (j == 0) cost(i, j) + go(i - 1, 0)
      else cost(i, j) + math.min(go(i - 1, j - 1), math.min(go(i - 1, j), go(i, j - 1)))
    })
    go(ax.length - 1, bx.length - 1)
  }

  private def dtwSpark(ax: Array[Long], ay: Array[Long],
      bx: Array[Long], by: Array[Long]): Long = {
    import spark.implicits._
    val df = Seq((ax.toSeq, ay.toSeq, bx.toSeq, by.toSeq)).toDF("xa", "ya", "xb", "yb")
    df.select(GraftSqlShim.column(DtwExpr(
      GraftSqlShim.expression(col("xa")), GraftSqlShim.expression(col("ya")),
      GraftSqlShim.expression(col("xb")), GraftSqlShim.expression(col("yb"))))
      .as("d")).head().getLong(0)
  }

  test("matches memoised reference on 50 random track pairs, incl. unequal lengths") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(15); val m = 1 + rnd.nextInt(15)
      val ax = Array.fill(n)(rnd.nextInt(1000).toLong)
      val ay = Array.fill(n)(rnd.nextInt(1000).toLong)
      val bx = Array.fill(m)(rnd.nextInt(1000).toLong)
      val by = Array.fill(m)(rnd.nextInt(1000).toLong)
      assert(dtwSpark(ax, ay, bx, by) === dtwRef(ax, ay, bx, by))
    }
  }

  test("identical tracks have distance 0; single points are the squared distance") {
    val xs = Array(1L, 5L, 9L); val ys = Array(2L, 4L, 8L)
    assert(dtwSpark(xs, ys, xs, ys) === 0L)
    assert(dtwSpark(Array(0L), Array(0L), Array(3L), Array(4L)) === 25L)
  }

  /** Independent memoised recursive discrete Frechet. */
  private def frechetRef(ax: Array[Long], ay: Array[Long],
      bx: Array[Long], by: Array[Long]): Long = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Long]
    def cost(i: Int, j: Int): Long = {
      val dx = ax(i) - bx(j); val dy = ay(i) - by(j)
      dx * dx + dy * dy
    }
    def go(i: Int, j: Int): Long = memo.getOrElseUpdate((i, j), {
      if (i == 0 && j == 0) cost(0, 0)
      else if (i == 0) math.max(cost(0, j), go(0, j - 1))
      else if (j == 0) math.max(cost(i, 0), go(i - 1, 0))
      else math.max(cost(i, j),
        math.min(go(i - 1, j - 1), math.min(go(i - 1, j), go(i, j - 1))))
    })
    go(ax.length - 1, bx.length - 1)
  }

  private def frechetSpark(ax: Array[Long], ay: Array[Long],
      bx: Array[Long], by: Array[Long]): Long = {
    import spark.implicits._
    val df = Seq((ax.toSeq, ay.toSeq, bx.toSeq, by.toSeq)).toDF("xa", "ya", "xb", "yb")
    df.select(GraftSqlShim.column(FrechetExpr(
      GraftSqlShim.expression(col("xa")), GraftSqlShim.expression(col("ya")),
      GraftSqlShim.expression(col("xb")), GraftSqlShim.expression(col("yb"))))
      .as("d")).head().getLong(0)
  }

  test("Frechet matches memoised reference on 50 random pairs; bottleneck <= DTW sum") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(15); val m = 1 + rnd.nextInt(15)
      val ax = Array.fill(n)(rnd.nextInt(1000).toLong)
      val ay = Array.fill(n)(rnd.nextInt(1000).toLong)
      val bx = Array.fill(m)(rnd.nextInt(1000).toLong)
      val by = Array.fill(m)(rnd.nextInt(1000).toLong)
      val f = frechetSpark(ax, ay, bx, by)
      assert(f === frechetRef(ax, ay, bx, by))
      assert(f <= dtwRef(ax, ay, bx, by)) // max step <= summed steps
    }
  }

  test("Frechet of identical tracks is 0; offset parallel tracks hit the offset") {
    val xs = Array(1L, 5L, 9L); val ys = Array(2L, 4L, 8L)
    assert(frechetSpark(xs, ys, xs, ys) === 0L)
    // b = a shifted by (3,4): every aligned step costs exactly 25
    assert(frechetSpark(xs, ys, xs.map(_ + 3), ys.map(_ + 4)) === 25L)
  }

  /** Independent memoised recursive LCSS (top-down, written against
    * the textbook recurrence — not the expression's rolling rows). */
  private def lcssRef(ax: Array[Long], ay: Array[Long],
      bx: Array[Long], by: Array[Long], eps2: Long): Long = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Long]
    def go(i: Int, j: Int): Long = memo.getOrElseUpdate((i, j), {
      if (i < 0 || j < 0) 0L
      else {
        val dx = ax(i) - bx(j); val dy = ay(i) - by(j)
        if (dx * dx + dy * dy <= eps2) go(i - 1, j - 1) + 1
        else math.max(go(i - 1, j), go(i, j - 1))
      }
    })
    go(ax.length - 1, bx.length - 1)
  }

  private def lcssSpark(ax: Array[Long], ay: Array[Long],
      bx: Array[Long], by: Array[Long], eps2: Long): Long = {
    import spark.implicits._
    val df = Seq((ax.toSeq, ay.toSeq, bx.toSeq, by.toSeq)).toDF("xa", "ya", "xb", "yb")
    df.select(GraftSqlShim.column(LcssExpr(
      GraftSqlShim.expression(col("xa")), GraftSqlShim.expression(col("ya")),
      GraftSqlShim.expression(col("xb")), GraftSqlShim.expression(col("yb")),
      eps2)).as("d")).head().getLong(0)
  }

  test("LCSS matches memoised reference on 50 random pairs; bounded and eps-monotone") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(15); val m = 1 + rnd.nextInt(15)
      val ax = Array.fill(n)(rnd.nextInt(60).toLong)
      val ay = Array.fill(n)(rnd.nextInt(60).toLong)
      val bx = Array.fill(m)(rnd.nextInt(60).toLong)
      val by = Array.fill(m)(rnd.nextInt(60).toLong)
      val tight = lcssSpark(ax, ay, bx, by, 100L)
      assert(tight === lcssRef(ax, ay, bx, by, 100L))
      assert(tight <= math.min(n, m))
      // widening the match radius can only grow the score
      val loose = lcssSpark(ax, ay, bx, by, 2000L)
      assert(loose === lcssRef(ax, ay, bx, by, 2000L))
      assert(loose >= tight)
    }
  }

  test("LCSS of identical tracks is the full length; disjoint far tracks score 0") {
    val xs = Array(1L, 5L, 9L, 14L); val ys = Array(2L, 4L, 8L, 1L)
    assert(lcssSpark(xs, ys, xs, ys, 0L) === 4L)
    assert(lcssSpark(xs, ys, xs.map(_ + 100000), ys, 100L) === 0L)
    // an outlier spike in the middle costs exactly one match slot —
    // the gap tolerance DTW/Frechet lack
    val sy = ys.clone(); sy(2) = 999999L
    assert(lcssSpark(xs, ys, xs, sy, 0L) === 3L)
  }
}
