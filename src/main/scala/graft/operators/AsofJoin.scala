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
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(payload.forall(!leftCols.contains(_)),
      s"payload ${payload.mkString(",")} collides with left columns")

    // the payload rides inside a STRUCT built only on right rows: the
    // struct itself is non-null for every right row even when its
    // fields are null, so last(ignoreNulls) stops at the matched row —
    // a matched right row with a legitimately NULL payload column
    // yields NULL (ASOF semantics), not an older row's value carried
    // past it
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__pay", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
    val rAligned = right.select(
      (keys :+ tsCol).map(col) :+ struct(payload.map(col): _*).as("__pay"): _*)
      .withColumn("__tag", lit(0))
    // left-only columns ride as nulls on right rows
    val rFull = leftCols.filterNot((keys :+ tsCol).contains)
      .foldLeft(rAligned)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filledPay = last(col("__pay"), ignoreNulls = true).over(w).as("__fp")
    l.unionByName(rFull.select(l.columns.map(col): _*))
      .select((leftCols.map(col) :+ col("__tag")) :+ filledPay: _*)
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__fp").getField(c).as(c)): _*)
  }
}
