package graft.tables

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Disk-backed stand-ins for the STORED tables the IVM query family
  * maintains (VERDICT r4 item 4): the plain `qNNN` oracle queries
  * rebuild their stored inputs in-query so DuckDB can mirror them from
  * the raw parquet, which makes their bench number ~3/4 scaffolding.
  * The `_stored` bench twins read the same state from parquet written
  * ONCE per (sfDir, table) — the production shape, where a live
  * replication loop already has the cluster/band/layer tables on disk
  * (at 100 TB: bucketed Iceberg tables; the read path is identical).
  *
  * The build is keyed by sfDir and a version tag so a code change or a
  * different scale factor can never serve stale state. `target/` is
  * wiped by `sbt clean`, which is the invalidation story.
  */
object StoredState {

  /** Bump when any builder's derivation changes shape or content. */
  private val Version = "v1"

  private def root(dir: String): String =
    s"target/stored-state/$Version/${dir.replaceAll("[^A-Za-z0-9.]+", "_")}"

  /** Read `name` from parquet, building it first iff absent. */
  def table(s: SparkSession, dir: String, name: String)(build: => DataFrame): DataFrame = {
    val path = s"${root(dir)}/$name"
    if (!Files.exists(Paths.get(path, "_SUCCESS")))
      build.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }
}
