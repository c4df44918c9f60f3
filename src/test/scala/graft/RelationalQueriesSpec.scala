package graft

import org.apache.spark.sql.functions._

class RelationalQueriesSpec extends SparkTestBase {

  test("all registered queries run and return rows on sf0.001") {
    // q05 (anti-join) may legitimately return 0 rows on tiny data;
    // q158's >= 20-shared-tiles bar is empty below sf0.01 (10.9k
    // pairs there — the threshold is oracle semantics, not tunable).
    val mayBeEmpty = Set("q05_antijoin_customers_without_orders",
      "q158_cotraveler_pairs",
      // q177 verifies q158-style candidates (>= 30 shared tiles):
      // none exist below sf0.01 for the same density reason.
      "q177_hausdorff")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfSmoke).count()
      assert(mayBeEmpty(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("no query key collides across modules (map merge would silently drop one)") {
    val moduleMaps = Seq(
      queries.RelationalQueries.queries, queries.TextQueries.queries,
      queries.DedupQueries.queries, queries.SimilarityQueries.queries,
      queries.SpatialQueries.queries, queries.OsmQueries.queries,
      queries.FunctionQueries.queries, queries.GeomTripleQueries.queries,
      queries.TripleSinkQueries.queries, queries.TableQueries.queries,
      queries.GraphQueries.queries, queries.WarcQueries.queries)
    assert(moduleMaps.map(_.size).sum === SparkEntry.queries.size,
      "duplicate query key across modules")
    assert(SparkEntry.queries.size === SparkEntry.oracleSql.size)
  }

  test("every query has matching oracle coverage or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep the rows-only list deliberate and small
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q03 dedup-to-latest keeps exactly one row per (user, type)") {
    val df = SparkEntry.queries("q03_dedup_latest")(spark, sfSmoke)
    val dup = df.groupBy(col("user_id"), col("event_type")).count()
      .filter(col("count") > 1).count()
    assert(dup === 0)
  }

  test("q07 ordered reconstruction member count equals group size") {
    val df = SparkEntry.queries("q07_ordered_group_concat")(spark, sfSmoke)
    val bad = df.filter(
      size(split(col("members"), ";")) =!= col("n_members")).count()
    assert(bad === 0)
  }
}
