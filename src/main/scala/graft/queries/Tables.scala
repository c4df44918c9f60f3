package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Shared table loaders + exact-arithmetic helpers for oracle parity.
  *
  * All money/double aggregates are converted to exact integer units
  * (cents / basis points) BEFORE aggregation so that Spark and the
  * DuckDB oracle produce bit-identical results regardless of
  * floating-point accumulation order.
  */
object Tables {
  /** Spread a scan to the session's core count before CPU-bound narrow
    * work. The test parquet files have ONE row group, so their scans
    * are inherently one task — every narrow pipeline downstream
    * (tokenize / shingle / hash / PIP refine) would run single-threaded
    * no matter how many cores the executor has, which destroys the
    * N→4N scaling the north rule requires. Gated on the plan's actual
    * scan partitioning, so at production scale (many files / many row
    * groups → already ≥cores scan tasks) this is a strict no-op and no
    * shuffle is added. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // toRdd, not .rdd: same partition count, but skips building the
    // InternalRow->Row deserializer stage .rdd would graft onto the plan
    if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p) else df
  }

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    spread(s.read.parquet(s"$dir/$name.parquet"))

  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame   = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def nation(s: SparkSession, dir: String): DataFrame   = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame   = t(s, dir, "region")
  def part(s: SparkSession, dir: String): DataFrame     = t(s, dir, "part")
  def events(s: SparkSession, dir: String): DataFrame   = t(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")

  /** double money -> exact integer cents. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
  /** double ratio -> exact integer basis points. */
  def bp(c: Column): Column = round(c * 10000, 0).cast("long")
}
