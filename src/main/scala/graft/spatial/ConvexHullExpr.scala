package graft.spatial

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
    val xa = xsRaw.asInstanceOf[ArrayData]
    val ya = ysRaw.asInstanceOf[ArrayData]
    val n0 = xa.numElements()
    require(n0 == ya.numElements() && n0 > 0,
      "convex_hull_stats requires aligned non-empty coordinate arrays")
    // distinct points, sorted by (x, y)
    val pts: Array[(Long, Long)] =
      Array.tabulate(n0)(i => (xa.getLong(i), ya.getLong(i))).distinct.sorted
    val n = pts.length
    val hull =
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
    val (sx, sy) = hull.foldLeft((0L, 0L)) { case ((ax, ay), (x, y)) => (ax + x, ay + y) }
    new GenericArrayData(Array(hull.length.toLong, sx, sy))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ConvexHullExpr = copy(left = l, right = r)
}
