package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Z-order (Morton-curve) clustering for scan pruning — the lakehouse
  * answer to spatial locality at 100 TB. The reference walks its whole
  * endpoint per query (/root/reference/src/sparql/SparqlWrapper.cpp
  * runs every SELECT against the full store); a Spark-native engine
  * instead PLACES the data so a bbox query never reads most of it:
  *
  *  - the stored table is clustered along the interleaved-bit curve
  *    and PARTITIONED by the top z-prefix (`zbucket` directories —
  *    the same role as an Iceberg spatial partition transform), so a
  *    bbox predicate prunes whole directories before listing files;
  *  - the box is decomposed into a bounded set of EXACT-cover
  *    z-intervals by quadtree recursion (the BIGMIN idea) — a single
  *    corner envelope [z(lo), z(hi)] degenerates to ~the full range
  *    when the box straddles the space's midlines, the decomposition
  *    does not;
  *  - the trailing exact lon/lat predicate removes the curve's jumps,
  *    so the result is exact regardless of interval over-approximation.
  *
  * Same public pattern as Delta OPTIMIZE ZORDER BY + GeoMesa z-range
  * scans. All row-side arithmetic is codegen'd builtins (floor /
  * shiftleft / bitwise or) mirrored verbatim in the DuckDB oracle,
  * like [[GeoFunctions]].
  */
object ZOrder {
  val LonLo = -180.0; val LonSpan = 360.0
  val LatLo = -90.0;  val LatSpan = 180.0

  /** Directory-partition granularity: top `BucketBits` bits of z. */
  val BucketBits = 5

  private def quant(c: Column, lo: Double, span: Double, bits: Int): Column = {
    val n = 1L << bits
    least(greatest(floor((c - lo) / span * n.toDouble).cast("long"), lit(0L)),
      lit(n - 1))
  }

  /** Morton code of (lon, lat) at `bits` per axis, as a Column. */
  def zValue(lon: Column, lat: Column, bits: Int): Column = {
    val ix = quant(lon, LonLo, LonSpan, bits)
    val iy = quant(lat, LatLo, LatSpan, bits)
    (0 until bits).map { b =>
      shiftleft(shiftright(ix, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(iy, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** DuckDB mirror of the axis quantization (same op order). */
  def quantSql(c: String, lo: Double, span: Double, bits: Int): String = {
    val n = 1L << bits
    s"LEAST(GREATEST(CAST(FLOOR(($c - ($lo)) / $span * ${n.toDouble}) AS BIGINT), 0), ${n - 1})"
  }

  /** DuckDB mirror of the bit interleave over pre-quantized columns. */
  def interleaveSql(ix: String, iy: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($ix >> $b) & 1) << ${2 * b}) | ((($iy >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", ") | (", ")")

  private def quantScalar(c: Double, lo: Double, span: Double, bits: Int): Long = {
    val n = 1L << bits
    math.min(math.max(math.floor((c - lo) / span * n.toDouble).toLong, 0L), n - 1)
  }

  private def interleaveScalar(ix: Long, iy: Long, bits: Int): Long = {
    var z = 0L; var b = 0
    while (b < bits) {
      z |= ((ix >> b) & 1L) << (2 * b) | ((iy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  /** Driver-side scalar mirror of [[zValue]]. */
  def zOf(lon: Double, lat: Double, bits: Int): Long =
    interleaveScalar(quantScalar(lon, LonLo, LonSpan, bits),
      quantScalar(lat, LatLo, LatSpan, bits), bits)

  /** Decompose a bbox into <= `maxIntervals` z-intervals whose union
    * covers every z a box point can take (quadtree recursion to
    * `maxDepth`, partially-covered leaves emitted whole — sound
    * over-approximation; adjacent intervals merged, then the smallest
    * inter-interval gaps merged until the budget holds). */
  def zIntervals(minLon: Double, maxLon: Double, minLat: Double, maxLat: Double,
      bits: Int, maxIntervals: Int = 16, maxDepth: Int = 8): Seq[(Long, Long)] = {
    val qx0 = quantScalar(minLon, LonLo, LonSpan, bits)
    val qx1 = quantScalar(maxLon, LonLo, LonSpan, bits)
    val qy0 = quantScalar(minLat, LatLo, LatSpan, bits)
    val qy1 = quantScalar(maxLat, LatLo, LatSpan, bits)
    val acc = ArrayBuffer.empty[(Long, Long)]
    // depth-first in ascending z: children visited in Morton order
    def rec(x: Long, y: Long, depth: Int): Unit = {
      val s = bits - depth
      val cx0 = x << s; val cx1 = ((x + 1) << s) - 1
      val cy0 = y << s; val cy1 = ((y + 1) << s) - 1
      if (cx1 < qx0 || cx0 > qx1 || cy1 < qy0 || cy0 > qy1) return
      if ((cx0 >= qx0 && cx1 <= qx1 && cy0 >= qy0 && cy1 <= qy1) ||
          depth == maxDepth) {
        val zlo = interleaveScalar(x, y, bits - s) << (2 * s)
        val span = if (s >= 32) Long.MaxValue else (1L << (2 * s)) - 1
        acc += ((zlo, zlo + span))
      } else {
        rec(2 * x, 2 * y, depth + 1)
        rec(2 * x + 1, 2 * y, depth + 1)
        rec(2 * x, 2 * y + 1, depth + 1)
        rec(2 * x + 1, 2 * y + 1, depth + 1)
      }
    }
    rec(0L, 0L, 0)
    // merge touching neighbors (DFS emitted ascending zlo)
    val merged = ArrayBuffer.empty[(Long, Long)]
    acc.foreach { iv =>
      if (merged.nonEmpty && iv._1 <= merged.last._2 + 1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, iv._2))
      else merged += iv
    }
    // enforce the budget by closing the smallest gaps (over-approx, sound)
    while (merged.length > maxIntervals) {
      var best = 1; var bestGap = Long.MaxValue
      var i = 1
      while (i < merged.length) {
        val gap = merged(i)._1 - merged(i - 1)._2
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      merged(best - 1) = (merged(best - 1)._1, merged(best)._2)
      merged.remove(best)
    }
    merged.toSeq
  }

  private def bucketShift(bits: Int): Int = 2 * bits - BucketBits

  /** Write `df` clustered along the curve: `zbucket` (top z-prefix)
    * directory partitions for coarse pruning, range-repartition on
    * zval for disjoint per-file z-ranges, sort within partitions for
    * row-group locality. Both derived columns are persisted — the
    * read-side predicates target them directly. */
  def cluster(df: DataFrame, lonCol: String, latCol: String, bits: Int,
      path: String, numFiles: Int): Unit =
    df.withColumn("zval", zValue(col(lonCol), col(latCol), bits))
      .withColumn("zbucket", shiftright(col("zval"), bucketShift(bits)))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)

  /** Bbox query over a z-clustered table: literal zbucket intervals
    * prune directories, literal zval intervals prune files/row-groups,
    * the exact lon/lat predicate removes the curve's jumps. */
  def bboxRead(spark: SparkSession, path: String, lonCol: String,
      latCol: String, bits: Int,
      minLon: Double, maxLon: Double, minLat: Double, maxLat: Double): DataFrame = {
    require(minLon <= maxLon && minLat <= maxLat,
      s"degenerate bbox [$minLon,$maxLon]x[$minLat,$maxLat]: min must not " +
        "exceed max (an antimeridian-crossing box must be split into two " +
        "boxes at +-180 by the caller)")
    val ivs = zIntervals(minLon, maxLon, minLat, maxLat, bits)
    if (ivs.isEmpty) // fully outside the quantized domain
      return spark.read.parquet(path).filter(lit(false))
    val shift = bucketShift(bits)
    val zPred = ivs.map { case (lo, hi) =>
      col("zval") >= lo && col("zval") <= hi
    }.reduce(_ || _)
    val bPred = ivs.map { case (lo, hi) =>
      col("zbucket") >= (lo >> shift) && col("zbucket") <= (hi >> shift)
    }.reduce(_ || _)
    spark.read.parquet(path)
      .filter(bPred && zPred &&
        col(lonCol) >= minLon && col(lonCol) <= maxLon &&
        col(latCol) >= minLat && col(latCol) <= maxLat)
  }
}
