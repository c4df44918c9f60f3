package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q88 SemDedup: the planted perturbed copies must be the ones
  * dropped, never their originals. */
class SemDedupSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("every planted near-duplicate is dropped; every original kept") {
    val out = SimilarityQueries.queries("q88_semdedup")(spark, sfDir).cache()
    val planted = out.filter(col("vec_id") >= 1000000L)
    assert(planted.count() > 0, "test premise: copies were planted")
    // a planted copy always pairs with its lower-id original at
    // cos ~0.9999 — if any survived, it landed in a different k-means
    // cluster than its original, which the integer grid forbids at a
    // 1% perturbation
    assert(planted.filter(col("kept") === 1).count() == 0)
    assert(out.filter(col("vec_id") < 1000000L && col("kept") === 0).count() == 0,
      "an original was dropped — only copies (higher ids) may be")
  }
}
