package graft.osm

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import graft.SparkTestBase

/** Parses synthesized equivalents of the reference fixtures
  * (tests/data/insert_node.osc / modify_node.osc / delete_node.osc /
  * test.osc / 427.osc semantics — see FIXTURES.md §3). */
class OscReaderSpec extends SparkTestBase {

  val oscXml: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<osmChange version="0.6" generator="graft-test">
      |<create>
      |  <node id="1" version="1" timestamp="2024-07-07T19:48:37Z" lat="42.7957187" lon="13.5690032">
      |    <tag k="name" v="Monte Piselli - San Giacomo"/>
      |    <tag k="natural" v="peak"/>
      |  </node>
      |  <way id="6177369" version="3" timestamp="2024-01-01T00:00:00Z">
      |    <nd ref="1"/><nd ref="2"/><nd ref="3"/>
      |    <tag k="highway" v="path"/>
      |  </way>
      |</create>
      |<modify>
      |  <node id="1" version="2" timestamp="2024-08-01T00:00:00Z" lat="42.8" lon="13.6"/>
      |</modify>
      |<delete>
      |  <relation id="11892035" version="5" timestamp="2024-08-02T10:00:00Z" visible="false">
      |    <member type="way" ref="1069363308" role="outer"/>
      |    <member type="node" ref="42" role=""/>
      |  </relation>
      |</delete>
      |</osmChange>""".stripMargin

  private def gzip(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(s.getBytes(StandardCharsets.UTF_8)); gz.close()
    bos.toByteArray
  }

  test("parses all three sections, kinds, tags, ordered refs and members") {
    val ops = OscReader.parseFile("changes/000000427.osc",
      oscXml.getBytes(StandardCharsets.UTF_8)).toVector
    assert(ops.size === 4)
    assert(ops.map(_.seq).distinct === Vector(427))

    val node = ops.find(o => o.kind == "node" && o.action == "create").get
    assert(node.id === 1L && node.version === 1)
    assert(node.lon.contains(13.5690032) && node.lat.contains(42.7957187))
    assert(node.tags === Map("name" -> "Monte Piselli - San Giacomo", "natural" -> "peak"))

    val way = ops.find(_.kind == "way").get
    assert(way.action === "create")
    assert(way.nodeRefs === Seq(1L, 2L, 3L)) // order preserved
    assert(way.tags === Map("highway" -> "path"))

    val mod = ops.find(o => o.kind == "node" && o.action == "modify").get
    assert(mod.version === 2 && mod.lon.contains(13.6))

    val del = ops.find(_.kind == "relation").get
    assert(del.action === "delete" && !del.visible)
    assert(del.members === Seq(
      RelMember(1069363308L, "way", "outer"), RelMember(42L, "node", "")))
  }

  test("gzip round-trip and distributed read via binaryFile source") {
    val dir = Files.createDirectories(Paths.get("target/test-osc"))
    Files.write(dir.resolve("000000001.osc.gz"), gzip(oscXml))
    Files.write(dir.resolve("000000002.osc"),
      oscXml.replace("id=\"1\"", "id=\"9\"").getBytes(StandardCharsets.UTF_8))
    val ds = OscReader.read(spark, dir.toString + "/*.osc*")
    val ops = ds.collect()
    assert(ops.length === 8)
    assert(ops.map(_.seq).toSet === Set(1, 2))
    assert(ops.count(_.id == 9L) === 2) // node create + modify renamed in seq 2
  }

  test("bzip2 round-trip (S2, Decompressor.cpp:53-68 analog)") {
    val bos = new ByteArrayOutputStream()
    val bz = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos)
    bz.write(oscXml.getBytes(StandardCharsets.UTF_8)); bz.close()
    val ops = OscReader.parseFile("changes/000000003.osc.bz2", bos.toByteArray).toVector
    assert(ops.size === 4)
    assert(ops.map(_.seq).distinct === Vector(3))
  }

  test("timestamp parsing keeps UTC instant with and without Z") {
    assert(OscReader.parseTs("2024-07-07T19:48:37Z").toInstant ===
      java.time.Instant.parse("2024-07-07T19:48:37Z"))
    assert(OscReader.parseTs("2024-07-07T19:48:37").toInstant ===
      java.time.Instant.parse("2024-07-07T19:48:37Z"))
  }
}
