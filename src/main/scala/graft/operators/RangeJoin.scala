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
}
