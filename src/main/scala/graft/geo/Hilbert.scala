package graft.geo

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling curve (from scratch, standard bit-rotation
  * formulation): maps a 2^order x 2^order grid cell (x, y) to its
  * 1-D curve position d and back. Unlike the z-order curve
  * ([[ZOrder]]), consecutive d values are ALWAYS grid-adjacent, so
  * range reads along d touch spatially-compact blocks — the layout of
  * choice for tile-write ordering and scan locality at the cost of a
  * slightly costlier encode.
  *
  * The encode is a per-bit fold carrying a reflect/transpose state;
  * both the Scala scalar (driver/tests) and the generated code (the
  * [[HilbertIndexExpr]] codegen below calls this scalar) share this
  * one implementation, and the DuckDB oracle unrolls the identical
  * loop as one nested subselect per bit.
  */
object Hilbert {

  /** Curve position of (x, y) on the order-`order` Hilbert curve. */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    require(order >= 1 && order <= 31, s"order $order out of [1,31]")
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve's frame is canonical
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse: the (x, y) cell at curve position d (for tests). */
  def d2xy(order: Int, d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var t = d0
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column face: hilbert_index(x, y) for an order-`order` grid. */
  def indexCol(order: Int, x: Column, y: Column): Column =
    GraftSqlShim.column(HilbertIndexExpr(
      GraftSqlShim.expression(x), GraftSqlShim.expression(y), order))

  /** DuckDB SQL mirror: unrolls the xy2d fold as one nested subselect
    * per bit (CTE-free, linear plan; `$x`/`$y` are column names of the
    * innermost relation `$from`). Produces a scalar select returning
    * (all columns of `from`, hkey). */
  def xy2dSql(order: Int, x: String, y: String, from: String): String = {
    val init = s"(SELECT *, CAST($x AS BIGINT) AS hx, CAST($y AS BIGINT) AS hy, 0::BIGINT AS hd FROM $from)"
    (order - 1 to 0 by -1).foldLeft(init) { (inner, bit) =>
      val s = 1L << bit
      s"""(SELECT * EXCLUDE (hx, hy, hd),
         |  CASE WHEN (hy & $s) = 0 AND (hx & $s) > 0 THEN ${s - 1} - hy
         |       WHEN (hy & $s) = 0 THEN hy ELSE hx END AS hx,
         |  CASE WHEN (hy & $s) = 0 AND (hx & $s) > 0 THEN ${s - 1} - hx
         |       WHEN (hy & $s) = 0 THEN hx ELSE hy END AS hy,
         |  hd + ${s * s} * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
         |                      (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS hd
         | FROM $inner)""".stripMargin
    }
  }
}

/** Native Hilbert encode: calls [[Hilbert.xy2d]] from generated code
  * (one virtual-free static call per row — the same pattern as
  * [[graft.spatial.CellAtExpr]]). */
case class HilbertIndexExpr(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(order, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.geo.Hilbert.xy2d($order, $x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}
