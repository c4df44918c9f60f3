package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** q298 (int8-quantized IVF probe + exact re-rank) graded against the
  * STRUCTURAL recall bound of a single-probe IVF index: a true top-3
  * neighbor is reachable iff it sits in the query's cell, so per query
  * `n_hit ≤ |exact ∩ cell|` — and the quantized probe should achieve
  * that ceiling (quantization + the int8 top-10 cut + exact re-rank
  * lose ZERO reachable neighbors on this corpus). The absolute recall
  * number is a property of the 16-cell index on near-random synthetic
  * embeddings, not of the quantization. */
class QuantizedAnnSpec extends SparkTestBase {

  test("quantized probe achieves the single-probe cell ceiling at sf0.01") {
    val asg = SimilarityQueries.int8Index(spark, sfSmall)
      .select(col("vec_id"), col("cid")).cache()
    // exact ground truth = q19's machinery (top-5 emitted; take 3)
    val exact = SparkEntry.queries("q19_cosine_topk")(spark, sfSmall)
      .filter(col("rank") <= 3).select(col("query_id"), col("neighbor_id"))
    val qCell = asg.select(col("vec_id").as("query_id"), col("cid").as("qcid"))
    val nCell = asg.select(col("vec_id").as("neighbor_id"), col("cid").as("ncid"))
    val ceiling = exact.join(qCell, "query_id").join(nCell, "neighbor_id")
      .groupBy(col("query_id"))
      .agg(sum(when(col("qcid") === col("ncid"), 1L).otherwise(0L)).as("reachable"))
    val got = SparkEntry.queries("q298_quantized_ann")(spark, sfSmall)
      .join(ceiling, "query_id")
      .select(col("query_id"), col("n_hit"), col("reachable"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"query ${r.getLong(0)}: n_hit ${r.getLong(1)} != reachable ceiling ${r.getLong(2)}")
    }
    asg.unpersist()
  }

  test("int8 quantization stays in [-127, 127] and is injective enough to rank") {
    val q8 = SimilarityQueries.int8Index(spark, sfSmall)
    val mm = q8.select(explode(col("q8")).as("x"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx")).collect()(0)
    assert(mm.getLong(0) >= -127 && mm.getLong(1) <= 127)
    // per-dim affine over the full corpus hits both grid extremes:
    // x=mn → -127; x=mx → (range*254) div (range+1) - 127 = 126
    assert(mm.getLong(0) === -127 && mm.getLong(1) === 126)
  }
}
