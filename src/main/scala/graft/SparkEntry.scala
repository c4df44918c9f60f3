package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the operator inventory from the query modules:
  *  - [[graft.queries.RelationalQueries]] — generic relational shapes
  *    (agg / window-dedup W1 / semi-anti joins / ordered reconstruction).
  */
object SparkEntry {
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (_root_.graft.queries.RelationalQueries.queries,
        _root_.graft.queries.RelationalQueries.oracles),
      (_root_.graft.queries.TextQueries.queries,
        _root_.graft.queries.TextQueries.oracles),
      (_root_.graft.queries.DedupQueries.queries,
        _root_.graft.queries.DedupQueries.oracles),
      (_root_.graft.queries.SimilarityQueries.queries,
        _root_.graft.queries.SimilarityQueries.oracles),
      (_root_.graft.queries.SpatialQueries.queries,
        _root_.graft.queries.SpatialQueries.oracles),
      (_root_.graft.queries.OsmQueries.queries,
        _root_.graft.queries.OsmQueries.oracles),
      (_root_.graft.queries.FunctionQueries.queries,
        _root_.graft.queries.FunctionQueries.oracles),
      (_root_.graft.queries.GeomTripleQueries.queries,
        _root_.graft.queries.GeomTripleQueries.oracles),
      (_root_.graft.queries.TripleSinkQueries.queries,
        _root_.graft.queries.TripleSinkQueries.oracles),
      (_root_.graft.queries.TableQueries.queries,
        _root_.graft.queries.TableQueries.oracles),
      (_root_.graft.queries.GraphQueries.queries,
        _root_.graft.queries.GraphQueries.oracles),
      (_root_.graft.queries.WarcQueries.queries,
        _root_.graft.queries.WarcQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_per_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
