package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Bloom-prefiltered semi-join: exactness against the plain join,
  * real pruning on the probe side, and the prefilter's position in
  * the physical plan (before the exchange, inside codegen). */
class BloomJoinSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val probe = spark.range(100000)
    .select((col("id") % 20000).as("k"), col("id").as("payload"))
  // 5% of the key space, including keys ABSENT from the probe
  private lazy val build = spark.range(1500)
    .select((col("id") * 20 + 19000).as("k"))

  test("bloom semi-join == plain semi-join (false positives removed)") {
    val got = BloomJoin.semiJoin(probe, build, "k")
      .select("payload").as[Long].collect().sorted
    val want = probe.join(build, Seq("k"), "left_semi")
      .select("payload").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(want.nonEmpty, "test premise: the join matches something")
  }

  test("the prefilter prunes the probe to ~matches before the join") {
    val pred = BloomJoin.probePredicate(build, "k")
    val prefiltered = probe.filter(pred).count()
    val matches = probe.join(build, Seq("k"), "left_semi").count()
    // 4M bits / 1.5k keys -> false-positive rate ~0; allow 5% headroom
    assert(prefiltered >= matches)
    assert(prefiltered <= matches * 1.05 + 100,
      s"prefilter passed $prefiltered rows for $matches matches")
  }

  test("the bloom probe sits in the plan as a codegen filter on the probe side") {
    val plan = BloomJoin.semiJoin(probe, build, "k").queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("bloom_might_contain"), plan)
  }
}
