package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming conformance: the same windowed aggregation over
  * `events` must produce identical results via the streaming path
  * (file source -> watermark -> window agg -> memory sink) and the
  * batch path. Covers the engine's streaming surface (SURVEY.md §2.8)
  * beyond the batch replication loop. */
class StreamingSpec extends SparkTestBase {

  test("streamed windowed aggregation equals batch computation") {
    // file-stream source needs a directory; testdata is a single file
    val src = java.nio.file.Paths.get(s"$sfSmoke/events.parquet")
    val dirP = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/test-stream-events"))
    java.nio.file.Files.copy(src, dirP.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val dir = dirP.toString
    val schema = spark.read.parquet(dir).schema

    val streamed = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp")) // parquet NTZ -> event-time LTZ
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000, 0).cast("long")).as("v_bp"))

    val q = streamed.writeStream
      .format("memory").queryName("ev_agg").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("ev_agg")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("v_bp"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    val want = spark.read.parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000, 0).cast("long")).as("v_bp"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("v_bp"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(got === want)
    assert(got.nonEmpty)
  }
}
