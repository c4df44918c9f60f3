package graft.spatial

import org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Dynamic-time-warping distance between two integer trajectories:
  * `DtwExpr(xs_a, ys_a, xs_b, ys_b)` → the minimum over monotone
  * warping paths of the summed squared Euclidean step costs, exact
  * BIGINT end-to-end (coordinates are integer lattice units, so both
  * engines land on the identical value).
  *
  * The DP is the textbook O(|a|·|b|) two-row rolling recurrence
  * c(i,j) = cost(i,j) + min(c(i−1,j), c(i,j−1), c(i−1,j−1)).
  * CodegenFallback: like [[IntersectionAreaExpr]] this prices
  * candidate PAIRS (the blocked join output), never raw points — the
  * quadratic term lives in the per-pair DP, bounded by the caller's
  * track-length cap (the paired oracle unrolls the same fixed-size
  * grid as lateral-alias SQL).
  */
case class DtwExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "dtw_d2"

  override def nullSafeEval(xa: Any, ya: Any, xb: Any, yb: Any): Any = {
    val axs = xa.asInstanceOf[ArrayData]; val ays = ya.asInstanceOf[ArrayData]
    val bxs = xb.asInstanceOf[ArrayData]; val bys = yb.asInstanceOf[ArrayData]
    val n = axs.numElements(); val m = bxs.numElements()
    require(n > 0 && m > 0, "dtw_d2 requires non-empty tracks")
    val prev = new Array[Long](m)
    val cur = new Array[Long](m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val dx = axs.getLong(i) - bxs.getLong(j)
        val dy = ays.getLong(i) - bys.getLong(j)
        val cost = dx * dx + dy * dy
        val best =
          if (i == 0 && j == 0) 0L
          else if (i == 0) cur(j - 1)
          else if (j == 0) prev(j)
          else math.min(prev(j - 1), math.min(prev(j), cur(j - 1)))
        cur(j) = cost + best
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): DtwExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Discrete Fréchet distance (squared) between two integer
  * trajectories — the bottleneck companion to [[DtwExpr]]'s summed
  * cost: the minimum over monotone couplings of the MAXIMUM squared
  * step cost ("shortest dog leash"). Same two-row rolling DP, same
  * exact-BIGINT lattice arithmetic, recurrence
  * c(i,j) = max(cost(i,j), min(c(i−1,j), c(i,j−1), c(i−1,j−1))) with
  * max-propagating borders. */
case class FrechetExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "frechet_d2"

  override def nullSafeEval(xa: Any, ya: Any, xb: Any, yb: Any): Any = {
    val axs = xa.asInstanceOf[ArrayData]; val ays = ya.asInstanceOf[ArrayData]
    val bxs = xb.asInstanceOf[ArrayData]; val bys = yb.asInstanceOf[ArrayData]
    val n = axs.numElements(); val m = bxs.numElements()
    require(n > 0 && m > 0, "frechet_d2 requires non-empty tracks")
    val prev = new Array[Long](m)
    val cur = new Array[Long](m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val dx = axs.getLong(i) - bxs.getLong(j)
        val dy = ays.getLong(i) - bys.getLong(j)
        val cost = dx * dx + dy * dy
        cur(j) =
          if (i == 0 && j == 0) cost
          else if (i == 0) math.max(cur(j - 1), cost)
          else if (j == 0) math.max(prev(j), cost)
          else math.max(cost,
            math.min(prev(j - 1), math.min(prev(j), cur(j - 1))))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): FrechetExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Longest Common SubSequence length between two integer trajectories
  * — the GAP-TOLERANT member of the family: two samples "match" when
  * their squared lattice distance is ≤ `eps2`, and the score counts
  * the longest monotone chain of matches, forgiving outlier pings
  * entirely (DTW must pay for them, Fréchet is dominated by the worst
  * one — LCSS is the standard noisy-GPS similarity). `eps2` is a plan
  * literal (not a child expression), like CellAtExpr's resolution.
  * Recurrence: c(i,j) = c(i−1,j−1)+1 if match else
  * max(c(i−1,j), c(i,j−1)), zero borders; exact integers. */
case class LcssExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression, eps2: Long)
    extends QuaternaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "lcss_len"

  override def nullSafeEval(xa: Any, ya: Any, xb: Any, yb: Any): Any = {
    val axs = xa.asInstanceOf[ArrayData]; val ays = ya.asInstanceOf[ArrayData]
    val bxs = xb.asInstanceOf[ArrayData]; val bys = yb.asInstanceOf[ArrayData]
    val n = axs.numElements(); val m = bxs.numElements()
    require(n > 0 && m > 0, "lcss_len requires non-empty tracks")
    val prev = new Array[Long](m + 1)
    val cur = new Array[Long](m + 1)
    var i = 0
    while (i < n) {
      java.util.Arrays.fill(cur, 0L)
      var j = 0
      while (j < m) {
        val dx = axs.getLong(i) - bxs.getLong(j)
        val dy = ays.getLong(i) - bys.getLong(j)
        cur(j + 1) =
          if (dx * dx + dy * dy <= eps2) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): LcssExpr =
    copy(first = f, second = s, third = t, fourth = q)
}
