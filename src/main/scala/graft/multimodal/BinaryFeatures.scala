package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal columns: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs partition-wise over the binary batch. The DECODE step is a
  * clearly-marked deterministic STUB (no codec libraries exist in this
  * container) — the Spark-side plumbing (schema, encoders, partition
  * batching, feature shape) is real and tested, and swapping
  * [[BinaryFeatures.decodeStub]] for a real codec is a one-function
  * change.
  */
case class MediaRow(url: String, mediaType: String, media: Array[Byte])

case class FrameRow(url: String, frame_idx: Int, frame_md5: String)

case class MediaFeatures(
    url: String,
    mediaType: String,
    nBytes: Long,
    width: Int,            // STUB: derived deterministically from bytes
    height: Int,           // STUB
    histogram: Array[Long] // 16-bin byte-value histogram (real)
)

object BinaryFeatures {

  /** STUB decoder: a real implementation would parse the image/audio
    * container header. Deterministic fake: dimensions derived from the
    * first/last payload bytes so tests are stable. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val w = 1 + (bytes.headOption.getOrElse(0: Byte) & 0x7f)
    val h = 1 + (bytes.lastOption.getOrElse(0: Byte) & 0x7f)
    (w, h)
  }

  /** Real feature: 16-bin histogram over payload byte values. */
  def histogram(bytes: Array[Byte]): Array[Long] = {
    val h = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    h
  }

  /** Every-k-th frame sample of a video-like payload. The FRAME SPLIT
    * is the stub (fixed byte-width windows standing in for decoded
    * frames — a real implementation walks the container's frame index);
    * the Spark plumbing is real: partition-wise iteration, one
    * decoder-init site per partition, flatMap fan-out row shape, and a
    * digest per emitted frame. */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int, every: Int): Dataset[FrameRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val n = m.media.length / frameBytes
        (0 until n by every).iterator.map { i =>
          val fr = java.util.Arrays.copyOfRange(m.media,
            i * frameBytes, (i + 1) * frameBytes)
          md.reset()
          FrameRow(m.url, i,
            md.digest(fr).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Partition-wise feature extraction — one decoder instance per
    * partition (where a real codec would amortize its init cost),
    * constant memory per batch. */
  def extract(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { r =>
        val (w, h) = decodeStub(r.media)
        MediaFeatures(r.url, r.mediaType, r.media.length.toLong, w, h,
          histogram(r.media))
      }
    }
  }
}
