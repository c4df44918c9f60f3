package graft.rdf

import graft.SparkTestBase
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The round's headline scan property, pinned: each owned-family
  * derivation reads its layer EXACTLY ONCE (array-build + one explode),
  * never once per triple family — at corpus scale the layer never fits
  * a cache, so an N-family union would read the parquet N times. */
class SinglePassDeriveSpec extends SparkTestBase {
  import spark.implicits._

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("full way/node/rel families plan one parquet scan + one explode each") {
    val dir = "target/test-tables/singlepass"
    Seq((1L, "10;11;12", "LINESTRING(0 0, 1 1)",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Map("k" -> "v")))
      .toDF("way_id", "members", "wkt", "ts", "tags")
      .write.mode("overwrite").parquet(s"$dir/ways")
    Seq((1L, 1.0, 2.0,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Map("k" -> "v")))
      .toDF("node_id", "lon", "lat", "ts", "tags")
      .write.mode("overwrite").parquet(s"$dir/nodes")
    Seq((1L, "way/10/outer;node/11/",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Map("k" -> "v")))
      .toDF("rel_id", "members", "ts", "tags")
      .write.mode("overwrite").parquet(s"$dir/rels")

    val cases = Seq(
      TripleDerive.ownedWayTriplesFull(spark.read.parquet(s"$dir/ways")),
      TripleDerive.ownedNodeTriplesFull(spark.read.parquet(s"$dir/nodes")),
      TripleDerive.ownedRelTriplesFull(spark.read.parquet(s"$dir/rels")))
    cases.foreach { df =>
      val plan = formatted(df)
      assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan).size === 1,
        "layer must be scanned exactly once:\n" +
          plan.linesIterator.take(25).mkString("\n"))
      assert("\\(\\d+\\) Generate".r.findAllIn(plan).size === 1,
        "one explode expected:\n" + plan.linesIterator.take(25).mkString("\n"))
      assert(!plan.contains("Union"), "no per-family union branches")
    }
    // and the families are actually all there
    val fams = cases.head.select(col("p")).distinct().as[String].collect().toSet
    assert(Set("osmway:member", "osm2rdfmember:id", "osm2rdfmember:pos",
      "geo:asWKT", "rdf:type", "osmmeta:timestamp", "osmkey:k",
      "osm2rdf:facts").subsetOf(fams), fams.toString)
  }
}
