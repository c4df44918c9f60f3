package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.jdk.CollectionConverters._

/** Per-partition lineage + metrics checkpointing (north rule:
  * "every stage checkpoints per-partition lineage + row-count/byte
  * metrics ... so a killed job resumes at partition granularity").
  *
  * A stage materializes its output per INPUT partition to
  * `<root>/stage=<name>/part-<id>.parquet`, committing each partition
  * independently with a `part-<id>.done` sidecar (row count inside,
  * written last = the commit point). Re-running the stage skips
  * partitions whose sidecar exists: a killed job resumes exactly where
  * it stopped and completed partitions are never recomputed.
  *
  * Partition jobs are scheduled with `SparkContext.runJob` over the
  * explicit remaining-partition id list — the per-partition commit the
  * north rule asks for. (On a real cluster the same structure maps to
  * task-committed files — mapreduce output committer v2 — plus a
  * metadata-table row per task; the sandbox is local-FS so the driver
  * performs the per-partition commit.)
  */
class Lineage(val spark: SparkSession, val root: String) {

  private def stageDir(stage: String) = Paths.get(root, s"stage=$stage")

  def completedPartitions(stage: String): Set[Int] = {
    val d = stageDir(stage)
    if (!Files.exists(d)) Set.empty
    else Files.list(d).iterator().asScala.map(_.getFileName.toString)
      .collect { case s if s.startsWith("part-") && s.endsWith(".done") =>
        s.stripPrefix("part-").stripSuffix(".done").toInt }
      .toSet
  }

  /** Run `stage` over `input` with per-partition resume. `fn` is a pure
    * per-partition transform preserving the input schema's shape into
    * `outSchema` rows. Returns the stage output (all partitions). */
  def runStage(stage: String, input: DataFrame,
      outSchema: org.apache.spark.sql.types.StructType)(
      fn: Iterator[Row] => Iterator[Row]): DataFrame = {
    val dir = stageDir(stage)
    Files.createDirectories(dir)
    val done = completedPartitions(stage)
    val rdd = input.rdd
    val todo = (0 until rdd.getNumPartitions).filterNot(done.contains)
    todo.foreach { pid =>
      // one job per pending partition; commit = parquet + .done marker
      val results: Array[Array[Row]] = spark.sparkContext.runJob(
        rdd, (it: Iterator[Row]) => fn(it).toArray, Seq(pid))
      val rows = results.head.toVector
      val df = spark.createDataFrame(rows.asJava, outSchema)
      val tmp = s"$dir/tmp-$pid"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val file = Files.list(Paths.get(tmp)).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(file, dir.resolve(s"part-$pid.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.walk(Paths.get(tmp)).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
      val bytes = Files.size(dir.resolve(s"part-$pid.parquet"))
      // commit point: "rows,bytes" — the north rule's per-partition
      // row-count/byte metrics live in the same atomic sidecar
      Files.write(dir.resolve(s"part-$pid.done"),
        s"${rows.size},$bytes".getBytes(StandardCharsets.UTF_8))
    }
    readStage(stage)
  }

  def readStage(stage: String): DataFrame =
    spark.read.parquet(stageDir(stage).toString + "/part-*.parquet")

  /** (partitionId -> rowCount) metrics from the .done sidecars. */
  def metrics(stage: String): Map[Int, Long] =
    rowByteMetrics(stage).map { case (pid, (rows, _)) => pid -> rows }

  /** (partitionId -> (rowCount, bytes)) — the full north-rule metric
    * pair. Tolerates legacy rows-only sidecars (bytes = 0). */
  def rowByteMetrics(stage: String): Map[Int, (Long, Long)] = {
    val d = stageDir(stage)
    if (!Files.exists(d)) Map.empty
    else Files.list(d).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".done"))
      .map { p =>
        val pid = p.getFileName.toString.stripPrefix("part-").stripSuffix(".done").toInt
        val parts = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.split(",")
        pid -> (parts(0).toLong, if (parts.length > 1) parts(1).toLong else 0L)
      }.toMap
  }
}
