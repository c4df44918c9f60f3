package graft.spatial

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** bbox-overlap join: exactness vs the naive cross product, exactly-once
  * emission WITHOUT a distinct (the reference-point rule), closed
  * (boundary-touching) semantics, and the dedup-free plan shape. */
class OverlapJoinSpec extends SparkTestBase {

  import spark.implicits._

  private val Res = 6

  /** Deterministic pseudo-random boxes spanning several cells each, so
    * pairs share multiple cover cells and the dedup rule is exercised. */
  private lazy val boxes = spark.range(400).select(
    col("id"),
    ((col("id") * 37 % 300).cast("double") - 150.0).as("minx"),
    ((col("id") * 53 % 140).cast("double") - 70.0).as("miny"))
    .select(col("id"), col("minx"), col("miny"),
      (col("minx") + 2.0 + (col("id") % 7).cast("double")).as("maxx"),
      (col("miny") + 2.0 + (col("id") * 3 % 5).cast("double")).as("maxy"))

  private def naivePairs = {
    val a = boxes.select(col("id").as("a_id"), col("minx").as("ax0"),
      col("miny").as("ay0"), col("maxx").as("ax1"), col("maxy").as("ay1"))
    val b = boxes.select(col("id").as("b_id"), col("minx").as("bx0"),
      col("miny").as("by0"), col("maxx").as("bx1"), col("maxy").as("by1"))
    a.crossJoin(b).filter(col("a_id") < col("b_id") &&
        col("ax0") <= col("bx1") && col("bx0") <= col("ax1") &&
        col("ay0") <= col("by1") && col("by0") <= col("ay1"))
      .select(col("a_id"), col("b_id"))
  }

  test("overlap join == naive cross product, each pair exactly once") {
    val got = SpatialJoin.bboxOverlapJoin(boxes, boxes, Res)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().sorted
    val want = naivePairs.as[(Long, Long)].collect().sorted
    assert(want.nonEmpty, "test premise: some boxes overlap")
    assert(got.toSeq == want.toSeq)
    assert(got.distinct.length == got.length, "a pair surfaced twice")
  }

  test("boundary-touching boxes count as overlapping (closed semantics)") {
    val touch = Seq((1L, 0.0, 0.0, 10.0, 10.0), (2L, 10.0, 0.0, 20.0, 10.0),
      (3L, 0.0, 10.0, 10.0, 20.0), (4L, 30.0, 30.0, 40.0, 40.0))
      .toDF("id", "minx", "miny", "maxx", "maxy")
    val got = SpatialJoin.bboxOverlapJoin(touch, touch, Res)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().sorted
    // 2 and 3 touch at the single corner point (10,10) — closed
    // semantics includes corner contact too
    assert(got.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("the plan deduplicates via the reference point, not an aggregate") {
    val plan = SpatialJoin.bboxOverlapJoin(boxes, boxes, Res)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"), plan)
    assert(!plan.contains("Deduplicate"), plan)
    // the corner-cell predicate (cellAt unrolls to greatest()-based
    // arithmetic inside the join condition)
    assert(plan.contains("greatest("), plan)
  }
}
