package graft.osm

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** Parse the reference's REAL daily diff fixture
  * (/root/reference/tests/data/427.osc[.gz] — a 1 MB OsmChange file)
  * with the engine's reader: the gzip and plain paths must agree
  * element-for-element, and the parsed stream must round-trip through
  * the W1 dedup window without losing any (kind, id) key. */
class RealDiffSpec extends SparkTestBase {

  private lazy val plain = OscReader.parseFile("427.osc",
    Files.readAllBytes(Paths.get("/root/reference/tests/data/427.osc"))).toVector
  private lazy val gz = OscReader.parseFile("427.osc.gz",
    Files.readAllBytes(Paths.get("/root/reference/tests/data/427.osc.gz"))).toVector

  test("gzip and plain parses agree element-for-element") {
    assert(plain.nonEmpty)
    assert(plain.size === gz.size)
    assert(plain.map(o => (o.kind, o.action, o.id, o.version)) ===
      gz.map(o => (o.kind, o.action, o.id, o.version)))
  }

  test("all three kinds and all three actions are present with sane shapes") {
    val byKind = plain.groupBy(_.kind).view.mapValues(_.size).toMap
    assert(byKind.keySet === Set("node", "way", "relation"))
    assert(plain.map(_.action).toSet === Set("create", "modify", "delete"))
    // every way carries ordered refs; every relation carries members
    assert(plain.filter(o => o.kind == "way" && o.action != "delete")
      .forall(_.nodeRefs.nonEmpty))
    assert(plain.filter(o => o.kind == "relation" && o.action != "delete")
      .forall(_.members.nonEmpty))
    // every non-deleted node has coordinates
    assert(plain.filter(o => o.kind == "node" && o.action != "delete")
      .forall(o => o.lon.isDefined && o.lat.isDefined))
  }

  test("W1 dedup over the real diff keeps every (kind, id) exactly once") {
    import spark.implicits._
    val ds = plain.toDF()
    val winners = ChangePipeline.dedupLatest(ds)
    assert(winners.count() ===
      plain.map(o => (o.kind, o.id)).distinct.size)
    // winner version is the max version of its key
    val maxV = plain.groupBy(o => (o.kind, o.id)).view
      .mapValues(_.map(_.version).max).toMap
    val bad = winners.select("kind", "id", "version").collect().count { r =>
      maxV((r.getString(0), r.getLong(1))) != r.getInt(2) }
    assert(bad === 0)
  }
}
