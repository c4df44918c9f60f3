package graft.operators

import graft.SparkTestBase

/** Prefix-filtered exact similarity join vs a brute-force all-pairs
  * reference on random set families — completeness is the AllPairs
  * prefix lemma, and this spec exercises it at several thresholds,
  * including sets that share nothing and identical duplicates. */
class SetSimJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(sets: Seq[(Long, Set[String])], bp: Int) =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if uni > 0 && inter * 10000 >= bp.toLong * uni
    } yield (ia, ib, inter, uni)).toSet

  private def run(sets: Seq[(Long, Set[String])], bp: Int) =
    SetSimJoin.jaccardSelfJoin(
        sets.map { case (i, s) => (i, s.toSeq) }.toDF("id", "set"),
        "id", "set", bp)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("equals brute force across thresholds on random token sets") {
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 60).map(i => s"tok$i")
    val sets = (1L to 120L).map { i =>
      // skewed family: a shared core + random tail makes both very
      // similar and barely-similar pairs
      val core = vocab.take(rnd.nextInt(6))
      val tail = Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      (i, (core ++ tail).toSet)
    } ++ Seq((200L, Set("unique1", "unique2")), // shares nothing
      (201L, vocab.take(10).toSet), (202L, vocab.take(10).toSet)) // identical
    for (bp <- Seq(2000, 5000, 8000, 10000)) {
      val got = run(sets, bp)
      val want = brute(sets, bp)
      assert(got == want, s"bp=$bp missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
    // the identical pair must always survive, even at threshold 1.0
    assert(run(sets, 10000).contains((201L, 202L, 10L, 10L)))
  }
}
