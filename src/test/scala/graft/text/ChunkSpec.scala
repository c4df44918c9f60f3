package graft.text

import graft.SparkTestBase
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** q87 context-window chunking: stride/overlap invariants and the
  * shuffle-free plan shape. */
class ChunkSpec extends SparkTestBase {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val chunks =
    TextQueries.queries("q87_chunk_overlap")(spark, sfDir).cache()

  test("strided prefixes reconstruct every document exactly") {
    // chunk k starts at k*stride; taking the first `stride` chars of
    // each chunk and concatenating in order must rebuild the text
    val rebuilt = chunks
      .select(col("doc_id"), col("chunk_id"), col("chunk").substr(1, 192).as("head"))
      .groupBy("doc_id")
      .agg(array_join(sort_array(collect_list(struct(col("chunk_id"), col("head"))))
        .getField("head"), "").as("rebuilt"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bad = rebuilt.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(bad == 0)
  }

  test("consecutive chunks overlap by exactly 64 chars") {
    // wherever chunk k is full-length (256), its last 64 chars are
    // chunk k+1's first 64
    val a = chunks.select(col("doc_id"), col("chunk_id"),
      col("chunk").substr(193, 64).as("tail"), length(col("chunk")).as("len"))
    val b = chunks.select(col("doc_id"), (col("chunk_id") - 1).as("chunk_id"),
      col("chunk").substr(1, 64).as("head"))
    val joined = a.join(b, Seq("doc_id", "chunk_id")).filter(col("len") === 256)
    assert(joined.count() > 0, "test premise: some full-length chunks")
    assert(joined.filter(col("tail") =!= col("head").substr(lit(1), length(col("tail")))).count() == 0)
  }

  test("the chunk plan is narrow — no key shuffle") {
    // the only allowed exchange is Tables.spread's round-robin scan
    // widening (a no-op at production scan-task counts); the chunking
    // itself must never hash/range-partition
    val plan = TextQueries.queries("q87_chunk_overlap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }
}
