package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.spatial.PointInRingExpr

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
  }
}
