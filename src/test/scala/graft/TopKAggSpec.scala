package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** Bounded-state top-k aggregate: reference-checked against a plain
  * Scala sort, and plan-checked to be a no-window partial aggregate. */
class TopKAggSpec extends SparkTestBase {

  test("topK matches a full sort reference on random data (incl. negative ords, ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // few groups x many rows, ord values drawn from a SMALL range so
    // cross-group and in-group ord ties are common; tie key unique
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(40).toLong - 20L, i.toLong)
    }
    val k = 5
    val got = rows.toDF("g", "ord", "tie")
      .groupBy($"g").agg(TopKAgg.topK($"ord", $"tie", k).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", $"pos", $"col.ord", $"col.tie")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy { case (o, t) => (-o, t) }
        .take(k).zipWithIndex
        .map { case ((o, t), i) => (g, i, o, t) }
    }.toSet
    assert(got == want)
  }

  test("topK keeps groups smaller than k intact and skips null inputs") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Long, Long)](
      (1L, 10L, 1L), (1L, null, 2L), (2L, 3L, 3L))
      .toDF("g", "ord", "tie")
      .groupBy($"g").agg(TopKAgg.topK($"ord", $"tie", 3).as("tk"))
      .select($"g", size($"tk").as("n"))
    assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 1), (2L, 1)))
  }

  test("q09b plans the bounded-state aggregate: no window, no sort, map-side partial") {
    val df = SparkEntry.queries("q09b_topk_agg")(spark, sfSmall)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "top-k must not window-sort the groups")
    assert(plan.contains("ObjectHashAggregate"), "expected the typed-imperative aggregate")
    assert(plan.contains("partial_top_k"), "expected a map-side partial top-k")
  }

  test("q09b agrees with q09 wherever the rounded-cents order is unambiguous") {
    // q09 ranks by exact double price, q09b by integer cents — on rows
    // where no two of a customer's top orders collide at cent
    // granularity the two MUST coincide; assert full equality of the
    // selected (customer, rank) -> order maps modulo such collisions.
    val a = SparkEntry.queries("q09_topk_per_group")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val b = SparkEntry.queries("q09b_topk_agg")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> (r.getLong(2), r.getLong(3))).toMap
    assert(a.keySet == b.keySet)
    val diff = a.keySet.filter(k => a(k) != b(k))
    // a divergence is only legitimate when the cents tie (same price_cents)
    diff.foreach { k => assert(a(k)._2 == b(k)._2, s"non-tie divergence at $k") }
  }
}
