package graft.spatial

import graft.{Bench, SparkTestBase}
import graft.geo.CellIndex
import org.apache.spark.sql.functions._

/** q157's hierarchical compaction, proven lossless: expanding every
  * compacted cell back down to the base resolution must reproduce the
  * original res-9 cover EXACTLY (set equality per way), and no parent
  * may pass res 6 (a res-5 parent is a complete aligned 16x16 base
  * block, needing >= 10.5° of lon span — geometrically impossible for
  * <= 4.5° rectangles; the claim the query's round bound rests on). */
class CompactCoverSpec extends SparkTestBase {

  test("compacted cover expands back to the exact base-res cover") {
    val dir = sfSmoke
    val compact = graft.SparkEntry.queries("q157_compact_cover")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(compact.nonEmpty)
    assert(compact.forall(_._3 >= 6), "res-5 parent should be impossible")
    assert(compact.exists(_._3 == 7), "res-7 promotions should occur")
    assert(compact.exists(_._3 == 8), "res-8 promotions should occur")

    def expand(cell: Long): Seq[Long] =
      if (CellIndex.res(cell) == 9) Seq(cell)
      else CellIndex.children(cell).flatMap(expand)
    val expanded: Map[Long, Set[Long]] = compact.groupBy(_._1)
      .map { case (w, cs) => w -> cs.flatMap(c => expand(c._2)).toSet }

    // base cover recomputed independently of the query's loop
    val n = CellIndex.width(9).toDouble
    val base = graft.synth.SynthUniverse.ways(spark, dir)
      .withColumn("ix", explode(sequence(
        floor((col("x0") + 180.0) / 360.0 * n).cast("long"),
        floor((col("x0") + col("w") + 180.0) / 360.0 * n).cast("long"))))
      .withColumn("iy", explode(sequence(
        floor((col("y0") + 90.0) / 180.0 * n).cast("long"),
        floor((col("y0") + col("h") + 90.0) / 180.0 * n).cast("long"))))
      .select(col("way_id"), col("ix"), col("iy"))
      .collect().map(r => (r.getLong(0), CellIndex.pack(9, r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (w, cs) => w -> cs.map(_._2).toSet }

    assert(expanded.keySet == base.keySet)
    for ((w, cells) <- base)
      assert(expanded(w) == cells, s"way $w roundtrip mismatch")
    // and it genuinely compacts
    val nCompact = compact.length
    val nBase = base.valuesIterator.map(_.size).sum
    assert(nCompact < nBase * 2 / 3, s"only $nBase -> $nCompact cells")
    Bench.clearState(spark)
  }
}
