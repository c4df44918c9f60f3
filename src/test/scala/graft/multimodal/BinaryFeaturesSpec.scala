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

  test("sampleFrames keeps every k-th fixed-width frame with stable digests") {
    val payload = Array.tabulate(83)(i => (i % 251).toByte) // 5 full 16B frames + tail
    val ds = Seq(MediaRow("u1", "video/x-stub", payload)).toDS()
    val frames = BinaryFeatures.sampleFrames(ds, frameBytes = 16, every = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4)) // tail frame dropped
    val md = java.security.MessageDigest.getInstance("MD5")
    frames.foreach { f =>
      val want = md.digest(payload.slice(f.frame_idx * 16, f.frame_idx * 16 + 16))
        .map("%02x".format(_)).mkString
      md.reset()
      assert(f.frame_md5 === want, s"frame ${f.frame_idx}")
    }
    // payload shorter than one frame -> no rows
    assert(BinaryFeatures.sampleFrames(
      Seq(MediaRow("u2", "video/x-stub", Array[Byte](1, 2, 3))).toDS(), 16, 2).isEmpty)
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
