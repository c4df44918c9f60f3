package graft.operators

import graft.SparkTestBase

/** The bounded-state pass must be EXACT, not approximate: compare
  * against a sequential full count on skewed data whose vocabulary far
  * exceeds the counter budget (so the Misra-Gries decrement path is
  * actually exercised, not just the hashmap fill). */
class HeavyHittersSpec extends SparkTestBase {

  test("misra-gries candidates + recount == exact heavy hitters on skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // zipf-ish: ~5000 distinct keys over 20000 draws, heavy head
    val keys = Seq.fill(20000)(
      math.min((1.0 / (rnd.nextDouble() + 1e-9)).toInt, 5000).toString)
    val df = keys.toDF("k").repartition(8)
    val got = HeavyHitters.topFraction(df, "k", phiDen = 50, m = 60)
      .as[(String, Long)].collect().toMap
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter { case (_, c) => c * 50 > keys.size }
    assert(got == exact, s"got ${got.size} exact ${exact.size}")
    assert(got.nonEmpty, "test premise: some keys qualify")
  }

  test("an unsound counter budget (m + 1 < phiDen) is rejected") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("k")
    intercept[IllegalArgumentException] {
      HeavyHitters.topFraction(df, "k", phiDen = 200, m = 100)
    }
  }
}
