package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.{cmsCells, tokens}

/** Structured-Streaming face of the Count-Min sketch (batch q217):
  * the counter matrix maintained LIVE over an unbounded document
  * stream as a plain streaming aggregation.
  *
  * This is the sketch family's scale story made concrete: the CMS is
  * additive and order-insensitive, so no watermark, no custom state,
  * and no buffering are needed — the aggregation state IS the sketch,
  * bounded BY CONSTRUCTION at d·w rows (1024 at the defaults) no
  * matter how many documents stream through. Because the cell recipe
  * ([[graft.text.TextFunctions.cmsCells]]) is shared with the batch
  * build, a stream-maintained sketch is mergeable (per-cell sum) with
  * any batch-built sketch — the cross-shard merge a 100 TB multi-hose
  * ingest pipeline performs.
  *
  * Contrast with the engine's other streaming faces: [[DriftStream]]/
  * [[SessionStream]] buffer within a watermark because their folds are
  * order-SENSITIVE; a sketch needs neither ordering nor completeness,
  * which is exactly why production frequency monitoring runs on
  * sketches instead of exact counts.
  */
object SketchStream {

  case class Doc(doc_id: Long, text: String)

  /** The live d×w counter matrix (j, bkt, cnt). Read with
    * OutputMode.Complete — the result is the bounded sketch itself. */
  def cms(docs: Dataset[Doc], d: Int = 4, w: Long = 256L): DataFrame = {
    require(docs.isStreaming,
      "SketchStream.cms maintains a live sketch; use q217_cms_freq for batch")
    docs
      .select(explode(tokens(col("text"))).as("term"))
      .select(explode(cmsCells(col("term"), d, w)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bkt").as("bkt"))
      .agg(count(lit(1)).as("cnt"))
  }
}
