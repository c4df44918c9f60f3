package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("inclusive boundary, null before first state, per-key isolation") {
    val states = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "z"))
      .toDF("k", "t", "v")
    val left = Seq((1L, 9L), (1L, 10L), (1L, 25L), (2L, 15L), (3L, 50L))
      .toDF("k", "t")
    val got = AsofJoin.asofJoin(left, states, Seq("k"), "t", Seq("v"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got === Set(
      (1L, 9L, None),        // before any state
      (1L, 10L, Some("a")),  // equal ts -> inclusive
      (1L, 25L, Some("b")),  // latest prior
      (2L, 15L, Some("z")),  // keys don't leak
      (3L, 50L, None)))      // key with no states at all
  }

  test("a matched state with a NULL payload yields NULL, not an older value") {
    // ASOF semantics: the MATCHED row's value is returned verbatim —
    // a null payload on the latest state must not be skipped in favor
    // of an older non-null state
    val states = Seq((1L, 10L, Some("a")), (1L, 20L, None), (1L, 30L, Some("c")))
      .toDF("k", "t", "v")
    val left = Seq((1L, 25L), (1L, 35L)).toDF("k", "t")
    val got = AsofJoin.asofJoin(left, states, Seq("k"), "t", Seq("v"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got === Set(
      (1L, 25L, None),       // matched state at t=20 has v=NULL -> NULL
      (1L, 35L, Some("c"))))
  }

  test("payload name collision is rejected") {
    val l = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, Seq("k"), "t", Seq("v"))
    }
  }
}
