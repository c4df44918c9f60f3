package graft.spatial

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Andrew's monotone chain over an integer point set — shared by
  * [[ConvexHullExpr]] and [[DiameterExpr]]. */
private[spatial] object Hull2D {
  /** Extreme points (strict hull: collinear edge-interior points are
    * not vertices) of the deduplicated input, in chain order. */
  def hull(ptsIn: Array[(Long, Long)]): Array[(Long, Long)] = {
    val pts: Array[(Long, Long)] = ptsIn.distinct.sorted
    val n = pts.length
    if (n <= 2) pts
    else {
      def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
        (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
      def chain(ps: Iterator[(Long, Long)]): List[(Long, Long)] = {
        var st = List.empty[(Long, Long)]
        ps.foreach { p =>
          while (st.lengthCompare(2) >= 0 && cross(st.tail.head, st.head, p) <= 0)
            st = st.tail
          st = p :: st
        }
        st
      }
      val lower = chain(pts.iterator)
      val upper = chain(pts.reverseIterator)
      // drop each chain's last pushed point (the other chain's start)
      (lower.tail.reverse ::: upper.tail.reverse).toArray
    }
  }

  def readPoints(xa: ArrayData, ya: ArrayData, name: String): Array[(Long, Long)] = {
    val n0 = xa.numElements()
    require(n0 == ya.numElements() && n0 > 0,
      s"$name requires aligned non-empty coordinate arrays")
    Array.tabulate(n0)(i => (xa.getLong(i), ya.getLong(i)))
  }
}

/** Convex hull of an integer point set:
  * `ConvexHullExpr(xs, ys)` → `[n_hull, sum_x, sum_y]` where `n_hull`
  * counts the hull's EXTREME points (strict hull — collinear points in
  * a hull edge's interior are not vertices) and `sum_x`/`sum_y` sum
  * the extreme points' coordinates, exact BIGINT end-to-end (integer
  * lattice coordinates, so cross products never round).
  *
  * Andrew's monotone chain over the coordinate-sorted distinct points;
  * the strict `cross <= 0` pop drops collinear chain mids, making the
  * vertex set exactly the extreme points — i.e. exactly the points p
  * NOT inside conv(S \ {p}), which is what the paired oracle tests
  * brute-force via Carathéodory (a contained point lies on a segment
  * or inside a proper triangle of the others). Like [[DtwExpr]] this
  * runs per GROUP on a bounded collected array (the caller caps the
  * per-group point count), so CodegenFallback costs one virtual call
  * per group, not per point.
  */
case class ConvexHullExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "convex_hull_stats"

  override def nullSafeEval(xsRaw: Any, ysRaw: Any): Any = {
    val pts = Hull2D.readPoints(xsRaw.asInstanceOf[ArrayData],
      ysRaw.asInstanceOf[ArrayData], prettyName)
    val hull = Hull2D.hull(pts)
    val (sx, sy) = hull.foldLeft((0L, 0L)) { case ((ax, ay), (x, y)) => (ax + x, ay + y) }
    new GenericArrayData(Array(hull.length.toLong, sx, sy))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ConvexHullExpr = copy(left = l, right = r)
}

/** Squared diameter of an integer point set — the maximum pairwise
  * squared distance. The diameter is attained between hull EXTREME
  * points, so the scan is O(h²) over the (typically tiny) hull instead
  * of O(n²) over the group; the paired oracle brute-forces all pairs —
  * an independent definition the hull reduction must reproduce. */
case class DiameterExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "diameter_d2"

  override def nullSafeEval(xsRaw: Any, ysRaw: Any): Any = {
    val pts = Hull2D.readPoints(xsRaw.asInstanceOf[ArrayData],
      ysRaw.asInstanceOf[ArrayData], prettyName)
    val h = Hull2D.hull(pts)
    var best = 0L
    var i = 0
    while (i < h.length) {
      var j = i + 1
      while (j < h.length) {
        val dx = h(i)._1 - h(j)._1; val dy = h(i)._2 - h(j)._2
        val d = dx * dx + dy * dy
        if (d > best) best = d
        j += 1
      }
      i += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DiameterExpr = copy(left = l, right = r)
}
