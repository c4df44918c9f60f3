package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Per-partition lineage + metrics checkpointing (north rule:
  * "every stage checkpoints per-partition lineage + row-count/byte
  * metrics ... so a killed job resumes at partition granularity").
  *
  * A stage materializes its output per INPUT partition to
  * `<root>/stage=<name>/part-<id>.parquet`, committing each partition
  * independently with a `part-<id>.done` sidecar (row count + bytes
  * inside, written last = the commit point). Re-running the stage skips
  * partitions whose sidecar exists: a killed job resumes exactly where
  * it stopped and completed partitions are never recomputed.
  *
  * The write happens INSIDE the task (`SparkContext.runJob` schedules
  * ONE job over the pending-partition id list; each task streams its
  * rows straight into a parquet file via parquet-hadoop's Group writer
  * and then drops the `.done` marker). The driver never holds row
  * data — it only schedules and reads the sidecar metadata — so the
  * mechanism survives partitions far larger than driver memory.
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
    * per-partition transform into `outSchema` rows (supported field
    * types: long, int, double, boolean, string — the engine's snapshot
    * shapes). Returns the stage output (all partitions). */
  def runStage(stage: String, input: DataFrame,
      outSchema: StructType)(
      fn: Iterator[Row] => Iterator[Row]): DataFrame = {
    val dir = stageDir(stage)
    Files.createDirectories(dir)
    val done = completedPartitions(stage)
    val rdd = input.rdd
    val todo = (0 until rdd.getNumPartitions).filterNot(done.contains)
    if (todo.nonEmpty) {
      val dirStr = dir.toString
      val schemaJson = outSchema.json
      // ONE job over every pending partition — tasks run in parallel and
      // COMMIT INDEPENDENTLY: a task that finishes before a sibling
      // fails keeps its .done marker, so the rerun skips it.
      spark.sparkContext.runJob(rdd,
        (ctx: TaskContext, it: Iterator[Row]) =>
          Lineage.writePartition(dirStr, ctx.partitionId(), schemaJson, fn(it)),
        todo)
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

object Lineage {

  /** Task-side partition commit: stream `rows` into
    * `<dir>/part-<pid>.parquet` (tmp file + atomic rename), then write
    * the `.done` sidecar with "rows,bytes". Runs inside the executor
    * task — no row ever travels to the driver. Retried attempts
    * overwrite the tmp file; the rename + sidecar keep the commit
    * atomic per partition. */
  def writePartition(dir: String, pid: Int, schemaJson: String,
      rows: Iterator[Row]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.ParquetFileWriter
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types => PTypes}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val mb = PTypes.buildMessage()
    schema.fields.foreach { f =>
      val prim: PrimitiveType = f.dataType match {
        case LongType    => PTypes.optional(INT64).named(f.name)
        case IntegerType => PTypes.optional(INT32).named(f.name)
        case DoubleType  => PTypes.optional(DOUBLE).named(f.name)
        case BooleanType => PTypes.optional(BOOLEAN).named(f.name)
        case StringType  => PTypes.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case dt => throw new UnsupportedOperationException(
          s"Lineage stage output type $dt not supported (field ${f.name})")
      }
      mb.addField(prim)
    }
    val msgType = mb.named("spark_schema")

    val tmp = Paths.get(dir, s"tmp-$pid.parquet")
    Files.deleteIfExists(tmp)
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(msgType, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(tmp.toString))
      .withConf(conf)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(msgType)
    var n = 0L
    try {
      rows.foreach { r =>
        val g = factory.newGroup()
        var i = 0
        while (i < schema.length) {
          if (!r.isNullAt(i)) schema.fields(i).dataType match {
            case LongType    => g.add(i, r.getLong(i))
            case IntegerType => g.add(i, r.getInt(i))
            case DoubleType  => g.add(i, r.getDouble(i))
            case BooleanType => g.add(i, r.getBoolean(i))
            case StringType  => g.add(i, r.getString(i))
            case _ => ()
          }
          i += 1
        }
        writer.write(g)
        n += 1
      }
    } finally writer.close()

    val finalFile = Paths.get(dir, s"part-$pid.parquet")
    Files.move(tmp, finalFile, StandardCopyOption.REPLACE_EXISTING)
    // parquet-hadoop drops a .crc sibling for the tmp name; remove it so
    // the stage dir stays clean
    Files.deleteIfExists(Paths.get(dir, s".tmp-$pid.parquet.crc"))
    val bytes = Files.size(finalFile)
    // commit point: "rows,bytes" — the north rule's per-partition
    // row-count/byte metrics live in the same atomic sidecar
    Files.write(Paths.get(dir, s"part-$pid.done"),
      s"$n,$bytes".getBytes(StandardCharsets.UTF_8))
  }
}
