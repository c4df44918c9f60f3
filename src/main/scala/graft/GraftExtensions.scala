package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.spatial.{CellAtExpr, CoverCellsExpr, IntersectionAreaExpr, PointInRingExpr}

/** Catalyst extension point: registers the engine's native expressions
  * so they are callable from SQL as well as the Column API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.spatial.PipJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("pip_contains"),
      new ExpressionInfo(classOf[PointInRingExpr].getName, "pip_contains"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "pip_contains(xs array<double>, ys array<double>, px double, py double)")
        PointInRingExpr(children(0), children(1), children(2), children(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("intersection_area"),
      new ExpressionInfo(classOf[IntersectionAreaExpr].getName, "intersection_area"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "intersection_area(xs1 array<double>, ys1 array<double>, " +
            "xs2 array<double>, ys2 array<double>)")
        IntersectionAreaExpr(children(0), children(1), children(2), children(3))
      }))
    ext.injectFunction((
      FunctionIdentifier("cell_at"),
      new ExpressionInfo(classOf[CellAtExpr].getName, "cell_at"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "cell_at(lon double, lat double, res int)")
        CellAtExpr(children(0), children(1), resLiteral(children(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("cover_cells"),
      new ExpressionInfo(classOf[CoverCellsExpr].getName, "cover_cells"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "cover_cells(xs array<double>, ys array<double>, res int)")
        CoverCellsExpr(children(0), children(1), resLiteral(children(2)))
      }))
  }

  private def resLiteral(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"resolution must be an integer literal, got $other")
  }
}
