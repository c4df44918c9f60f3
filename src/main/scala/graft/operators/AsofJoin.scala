package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the LATEST right row with
  * `right.ts <= left.ts` per key (the general form of the replication
  * loop's start-offset resolution, graft.osm.Replicator.decideStartSeq;
  * DuckDB expresses it natively as `ASOF JOIN`, Spark has no built-in).
  *
  * Composition, not a custom physical operator: tag both sides, union,
  * and carry the right payload forward with an ignore-nulls `last()`
  * over (ts, tag) — ONE shuffle on the key, no per-row range probe and
  * no time-bucket explosion. At equal timestamps the right row sorts
  * BEFORE the left row (tag 0 < 1), so the boundary is inclusive —
  * matching ASOF's `left.ts >= right.ts`.
  *
  * Scale shape: |L|+|R| rows shuffle once on `keys`; the window scans
  * each partition in ts order — the same cost as a groupBy over the
  * union, with no risk of the O(|L|x|R|) blowup a naive
  * inequality-join plan produces.
  */
object AsofJoin {

  /** @param payload right-side value columns to carry (left must not
    *                already contain columns with these names) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload ${payload.mkString(",")} collides with left columns")
    val rightTyped = payload.map(c => c -> right.schema(c).dataType).toMap

    val l = left.withColumn("__tag", lit(1))
    val lAligned = payload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(rightTyped(c))))
    val rAligned = right.select(
      (keys :+ tsCol).map(col) ++ payload.map(col): _*)
      .withColumn("__tag", lit(0))
    // left-only columns ride as nulls on right rows
    val rFull = leftCols.filterNot((keys :+ tsCol).contains)
      .foldLeft(rAligned)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled: Seq[Column] = payload.map(c =>
      last(col(c), ignoreNulls = true).over(w).as(c))
    lAligned.unionByName(rFull.select(lAligned.columns.map(col): _*))
      .select((leftCols.map(col) :+ col("__tag")) ++ filled: _*)
      .filter(col("__tag") === 1)
      .drop("__tag")
  }
}
