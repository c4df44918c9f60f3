package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The stream-maintained CMS must equal the batch-built matrix cell
  * for cell once every document has streamed through, and its state
  * must never exceed the d·w construction bound — the property that
  * makes sketch maintenance safe on an unbounded stream. */
class SketchStreamSpec extends SparkTestBase {

  test("streamed CMS equals the batch matrix; state bounded at d*w across all triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val docs = graft.queries.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("text")).as[SketchStream.Doc].collect()
    assert(docs.length >= 50)

    val input = MemoryStream[SketchStream.Doc]
    val sketch = SketchStream.cms(input.toDS())
    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString
    val q = sketch.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("stream_cms").start()
    try {
      var maxState = 0L
      docs.grouped(10).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          maxState = math.max(maxState, p.stateOperators.map(_.numRowsTotal).max)
      }
      assert(maxState > 0 && maxState <= 4 * 256,
        s"sketch state must stay within d*w, saw $maxState")

      val streamed = spark.table("stream_cms")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // batch reference: the same shared cell recipe over the same docs
      val batch = graft.queries.Tables.documents(spark, sfSmoke)
        .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("term"))
        .select(explode(graft.text.TextFunctions.cmsCells(col("term"), 4, 256L)).as("c"))
        .groupBy(col("c.j").as("j"), col("c.bkt").as("bkt"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      assert(batch.size <= 1024 && batch.values.sum > 0)
    } finally q.stop()
    graft.Bench.clearState(spark)
  }
}
