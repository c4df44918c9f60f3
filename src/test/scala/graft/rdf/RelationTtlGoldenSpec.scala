package graft.rdf

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Row-for-row golden vs osm2rdf's relation output
  * (/root/reference/tests/data/relation.ttl — route-bus relation
  * 11892035 with 171 ordered members): the fixture file is PARSED AT
  * TEST TIME with the engine's own triple-line regex (S7/F12,
  * TtlHelper.cpp:13-21 semantics), its blank-node member family
  * `_:6_N` is mapped to the engine's deterministic keys
  * `osm2rdfmember:rel_11892035_N` (SURVEY §1.3), and
  * [[TripleDerive.relMemberTriples]] must reproduce the complete
  * member/id/role/pos triple set exactly. */
class RelationTtlGoldenSpec extends SparkTestBase {

  private val RelId = 11892035L

  /** (s, p, o) with quotes and `^^xsd:*` datatype suffixes stripped —
    * the engine types objects structurally, not textually. */
  private def parseFixture(): Seq[(String, String, String)] = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("/root/reference/tests/data/relation.ttl"))
    val re = """^(\S+)\s(\S+)\s(.*)\s\.$""".r
    import scala.jdk.CollectionConverters._
    lines.asScala.toSeq
      .filterNot(_.startsWith("@"))                       // P6
      .collect { case re(s, p, o) =>
        val o1 = o.replaceAll("""\^\^\S+$""", "")
        val o2 = if (o1.startsWith("\"") && o1.endsWith("\""))
          o1.substring(1, o1.length - 1) else o1
        (s, p, o2)
      }
  }

  test("relation 11892035 member triples match relation.ttl row for row") {
    val fixture = parseFixture()
    def key(bn: String): String = // _:6_N -> deterministic (relId, pos) key
      "osm2rdfmember:rel_" + RelId + "_" + bn.stripPrefix("_:6_")

    // golden member family, blank nodes replaced by deterministic keys
    val goldenMembers = fixture.collect {
      case (s, "osmrel:member", o) if s == s"osmrel:$RelId" =>
        (s, "osmrel:member", key(o))
      case (bn, p @ ("osm2rdfmember:id" | "osm2rdfmember:role" | "osm2rdfmember:pos"), o)
          if bn.startsWith("_:6_") =>
        (key(bn), p, o)
    }.toSet
    assert(goldenMembers.size === 171 * 4)

    // reconstruct the rel_members input table FROM the fixture
    val byKey = fixture.filter(_._1.startsWith("_:6_"))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap)
    val memberRows = byKey.toSeq.map { case (bn, props) =>
      val uri = props("osm2rdfmember:id")
      val kind = if (uri.startsWith("osmnode:")) "node"
        else if (uri.startsWith("osmway:")) "way" else "relation"
      Row(RelId, props("osm2rdfmember:pos").toInt,
        uri.replaceAll("^\\D+", "").toLong, kind, props("osm2rdfmember:role"))
    }
    val schema = StructType(Seq(
      StructField("rel_id", LongType), StructField("pos", IntegerType),
      StructField("member_id", LongType), StructField("member_kind", StringType),
      StructField("role", StringType)))
    import scala.jdk.CollectionConverters._
    val relMembers = spark.createDataFrame(memberRows.asJava, schema)

    val got = TripleDerive.relMemberTriples(relMembers)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === goldenMembers,
      s"missing=${(goldenMembers -- got).take(5)}\nextra=${(got -- goldenMembers).take(5)}")

    // header family sanity from the same fixture: 4 tags -> facts "4"
    val tagCount = fixture.count { case (s, p, _) =>
      s == s"osmrel:$RelId" && p.startsWith("osmkey:") }
    val facts = fixture.collectFirst { case (s, "osm2rdf:facts", o)
      if s == s"osmrel:$RelId" => o }.get
    assert(tagCount.toString === facts)
  }
}
