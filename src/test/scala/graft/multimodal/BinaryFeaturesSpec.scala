package graft.multimodal

import graft.SparkTestBase
import graft.synth.PagesSynth
import org.apache.spark.sql.functions._

class BinaryFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private def media = PagesSynth.pages(spark, sfSmoke)
    .select(col("url"), lit("text/html").as("mediaType"), col("html").as("media"))
    .as[MediaRow]

  test("binary feature extraction: schema, determinism, histogram totals") {
    val feats = BinaryFeatures.extract(media).collect()
    assert(feats.length === media.count())
    feats.foreach { f =>
      assert(f.nBytes > 0)
      assert(f.histogram.length === 16)
      assert(f.histogram.sum === f.nBytes, "histogram must cover every byte")
      assert(f.width >= 1 && f.height >= 1)
    }
    // deterministic across runs
    val again = BinaryFeatures.extract(media).collect()
    assert(feats.map(f => (f.url, f.width, f.height, f.nBytes)).toSet ===
      again.map(f => (f.url, f.width, f.height, f.nBytes)).toSet)
  }

  test("stub decode matches the pure function row-for-row") {
    val rows = media.collect()
    val feats = BinaryFeatures.extract(media).collect()
      .map(f => f.url -> (f.width, f.height)).toMap
    rows.foreach { r =>
      assert(feats(r.url) === BinaryFeatures.decodeStub(r.media))
    }
  }
}
