package graft.sources

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.SparkTestBase
import graft.synth.PagesSynth

class WarcReaderSpec extends SparkTestBase {

  private def ts(epoch: Long) = new Timestamp(epoch * 1000L)

  test("file round trip: binaryFile scan of member-per-record .warc.gz recovers every page row") {
    val dir = Files.createTempDirectory(Paths.get("target"), "warc")
    val pages = PagesSynth.pages(spark, sfSmoke)
      .select("url", "warc_ts", "html").collect()
    // 4 container files, records striped across them
    pages.zipWithIndex.groupBy(_._2 % 4).foreach { case (shard, rs) =>
      val bytes = WarcReader.containerBytes(rs.iterator.map { case (r, _) =>
        (r.getString(0), r.getTimestamp(1), r.getAs[Array[Byte]](2))
      })
      Files.write(dir.resolve(f"crawl-$shard%05d.warc.gz"), bytes)
    }
    val back = WarcReader.read(spark, dir.toString + "/*.warc.gz")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).toSet
    val want = pages.map(r => (r.getString(0), r.getTimestamp(1).getTime,
      new String(r.getAs[Array[Byte]](2), "UTF-8"))).toSet
    assert(back === want)
    graft.tables.SnapshotTable.deleteRecursively(dir)
  }

  test("malformed member: error row emitted, neighbors before AND after survive") {
    val good1 = WarcReader.memberBytes("u1", ts(100), "payload one".getBytes)
    val bad = {
      val m = WarcReader.memberBytes("u2", ts(200), "payload two".getBytes)
      m.take(m.length - 6) // chop the CRC/ISIZE trailer → gunzip fails
    }
    val good2 = WarcReader.memberBytes("u3", ts(300), "payload three".getBytes)
    val container = good1 ++ bad ++ good2
    val rows = WarcReader.parseContainer("t.warc.gz", container).toVector
    val good = rows.filter(_.error == null)
    val errs = rows.filter(_.error != null)
    assert(good.map(_.url).toSet === Set("u1", "u3"))
    assert(errs.nonEmpty)
    assert(errs.forall(e => e.error.contains("t.warc.gz")))
  }

  test("malformed header variants each yield one error row, not an exception") {
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val cases = Seq(
      "no version" -> gz("NOT-WARC\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes),
      "no blank line" -> gz("WARC/1.0\r\nContent-Length: 3".getBytes),
      "missing length" -> gz("WARC/1.0\r\nWARC-Target-URI: u\r\n\r\nxy\r\n\r\n".getBytes),
      "short payload" -> gz(("WARC/1.0\r\nWARC-Target-URI: u\r\n" +
        "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 999\r\n\r\nxy").getBytes),
      "bad date" -> gz(("WARC/1.0\r\nWARC-Target-URI: u\r\n" +
        "WARC-Date: yesterday\r\nContent-Length: 2\r\n\r\nxy\r\n\r\n").getBytes))
    cases.foreach { case (name, bytes) =>
      val rows = WarcReader.parseContainer(name, bytes).toVector
      assert(rows.length === 1, name)
      assert(rows.head.error != null, name)
    }
  }

  test("record framing is exact: trailing CRLF CRLF present, Content-Length honored with binary payload") {
    // payload containing \r\n\r\n (the header terminator) must not
    // confuse the parser — Content-Length framing wins
    val payload = "a\r\n\r\nb<tag>&amp;é".getBytes("UTF-8")
    val member = WarcReader.memberBytes("u", ts(42), payload)
    val rows = WarcReader.parseContainer("p", member).toVector
    assert(rows.length === 1)
    assert(rows.head.error == null)
    assert(rows.head.html.sameElements(payload))
    assert(rows.head.warc_ts === ts(42))
  }
}
