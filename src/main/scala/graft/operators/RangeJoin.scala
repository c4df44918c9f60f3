package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numeric range join — points to the intervals containing them. Spark
  * plans a raw `v BETWEEN lo AND hi` join as broadcast-nested-loop (or
  * a cartesian product), O(|P|x|I|); this is the 1-D face of the cell
  * prefilter the spatial join uses: intervals explode to the fixed
  * buckets they overlap, each point lands in exactly ONE bucket, the
  * bucket equi-join emits each true (point, interval) pair at most
  * once (no post-dedup), and the exact BETWEEN refines candidates
  * only. One hash shuffle; fan-out bounded by interval_width/bucket.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, vCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, bucket: Double): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    val ints = intervals.withColumn("__b", explode(sequence(
      floor(col(loCol) / bucket).cast("long"),
      floor(col(hiCol) / bucket).cast("long"))))
    val pts = points.withColumn("__b", floor(col(vCol) / bucket).cast("long"))
    pts.join(ints, Seq("__b"))
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__b")
  }

  /** Interval x interval OVERLAP join — both sides explode to their
    * bucket ranges, the bucket equi-join prefilters, and the
    * RESPONSIBLE-BUCKET rule (the bucket holding the overlap's left
    * edge, max(lo_a, lo_b) — contained in both sides' bucket ranges
    * whenever they overlap) emits each true pair exactly once with no
    * post-join distinct. The 1-D twin of the spatial bboxOverlapJoin.
    * Column names must be disjoint across the two inputs. */
  def intervalOverlapJoin(left: DataFrame, lo1: String, hi1: String,
      right: DataFrame, lo2: String, hi2: String, bucket: Double): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    def cover(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__b", explode(sequence(
        floor(col(lo) / bucket).cast("long"),
        floor(col(hi) / bucket).cast("long"))))
    cover(left, lo1, hi1).join(cover(right, lo2, hi2), Seq("__b"))
      .filter(col(lo1) <= col(hi2) && col(lo2) <= col(hi1) &&
        floor(greatest(col(lo1), col(lo2)) / bucket).cast("long") === col("__b"))
      .drop("__b")
  }
}
