package graft.tables

import graft.SparkTestBase
import graft.queries.TableQueries
import org.apache.spark.sql.functions._

/** q73 end-to-end: the corpus MOR maintenance query must leave the
  * commit history it claims (create → delta ×2 → compact — batch 3
  * folds the chain) and its resolved state must equal the closed form
  * of the three batches. */
class TableQueriesSpec extends SparkTestBase {

  test("q73 corpus maintenance: delta+compact history, closed-form final state") {
    val dir = "/root/testdata/sf0.001"
    val got = TableQueries.queries("q73_mor_corpus")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // closed form (mirrors the DuckDB oracle)
    val u = when(col("doc_id") % 5 between(1, 3), col("doc_id") % 5).otherwise(0L)
    val d = when((col("doc_id") % 17 between(1, 3)) &&
      col("doc_id") % 17 =!= col("doc_id") % 5, col("doc_id") % 17).otherwise(0L)
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), u.as("u"), d.as("d"), col("n_chars"))
      .filter(col("d") === 0 || col("u") > col("d"))
      .select(col("doc_id"), col("u").cast("long"),
        (col("n_chars") + col("u")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)

    val root = "target/q73_store_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    val t = SnapshotTable.load(spark, root)
    val ops = t.snapshotsMeta.orderBy("snapshot_id")
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops === Seq("create", "delta", "delta", "compact"))
  }
}
