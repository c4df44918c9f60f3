package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import org.apache.commons.compress.compressors.gzip.{GzipCompressorInputStream, GzipCompressorOutputStream}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One parsed WARC record (PERMISSIVE: a malformed member yields a row
  * with `error` set and the data columns null, like Spark's own
  * `_corrupt_record` convention — neighbors still parse). */
case class WarcRow(url: String, warc_ts: Timestamp, html: Array[Byte],
    error: String)

/** Common-Crawl-style WARC container source: `binaryFile` scan + gzip
  * MEMBER-PER-RECORD split + header parse into (url, warc_ts, html)
  * rows — the pages-side analog of the reference's change-file ingest
  * (/root/reference/src/util/Decompressor.cpp:34-50 gunzip + the S1
  * per-file contract), re-expressed as a distributed Spark source.
  *
  * Format (ISO 28500, the subset Common Crawl emits): each record is
  * an INDEPENDENT gzip member — `WARC/1.0\r\n`, header lines
  * (`WARC-Target-URI`, `WARC-Date`, `Content-Length`, ...), blank
  * line, `Content-Length` payload bytes, `\r\n\r\n`. Member-per-record
  * framing is what makes a 1 GB container splittable in principle;
  * here the parallelism unit is the FILE (Common Crawl ships ~1 GB
  * containers, so a 100 TB corpus is ~100k files — ample tasks for a
  * 1000-executor cluster, and `binaryFile` never holds more than one
  * container per task in memory).
  *
  * Fault containment: a member that fails to gunzip or parse becomes
  * one `error` row, and the scan RESYNCS by searching for the next
  * gzip magic (`1f 8b 08`) so one corrupt member cannot swallow the
  * rest of the container.
  */
object WarcReader {

  private val Magic = Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08.toByte)

  /** All rows, including PERMISSIVE error rows. */
  def readWithErrors(spark: SparkSession, pathGlob: String): Dataset[WarcRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseContainer(path, bytes) }
  }

  /** Clean (url, warc_ts, html) rows — the input_hint page shape. */
  def read(spark: SparkSession, pathGlob: String): DataFrame =
    readWithErrors(spark, pathGlob).where("error IS NULL")
      .select("url", "warc_ts", "html")

  /** Split one container into gzip members (one record each) and parse
    * every member independently. */
  def parseContainer(path: String, bytes: Array[Byte]): Iterator[WarcRow] = {
    val out = Vector.newBuilder[WarcRow]
    var off = 0
    while (off < bytes.length) {
      readMember(bytes, off) match {
        case Right((member, consumed)) =>
          out += parseRecord(path, member)
          off += consumed
        case Left(err) =>
          out += WarcRow(null, null, null, s"$path@$off: $err")
          // resync: scan past the failed member's own magic for the
          // next gzip member header
          val next = indexOfMagic(bytes, off + 1)
          off = if (next < 0) bytes.length else next
      }
    }
    out.result().iterator
  }

  /** Gunzip exactly ONE member starting at `off`; returns the
    * decompressed bytes plus the compressed length consumed
    * (commons-compress tracks it via InputStreamStatistics). */
  private def readMember(bytes: Array[Byte], off: Int): Either[String, (Array[Byte], Int)] =
    try {
      val raw = new ByteArrayInputStream(bytes, off, bytes.length - off)
      val gz = new GzipCompressorInputStream(raw, false) // one member only
      val member = gz.readAllBytes()
      val consumed = gz.getCompressedCount.toInt
      gz.close()
      if (consumed <= 0) Left("empty gzip member")
      else Right((member, consumed))
    } catch {
      case e: java.io.IOException => Left(s"gunzip failed: ${e.getMessage}")
    }

  private def indexOfMagic(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i <= bytes.length - Magic.length) {
      if (bytes(i) == Magic(0) && bytes(i + 1) == Magic(1) && bytes(i + 2) == Magic(2))
        return i
      i += 1
    }
    -1
  }

  /** Parse one decompressed member: version line, header lines to the
    * blank line, then Content-Length payload bytes. */
  def parseRecord(path: String, member: Array[Byte]): WarcRow = {
    // header block ends at the first \r\n\r\n
    val headEnd = indexOfCrlfCrlf(member)
    if (headEnd < 0)
      return WarcRow(null, null, null, s"$path: no header terminator")
    val header = new String(member, 0, headEnd, UTF_8)
    val lines = header.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("WARC/"))
      return WarcRow(null, null, null, s"$path: bad version line")
    val fields = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val lenOpt = fields.get("content-length").flatMap(s => s.toIntOption)
    if (lenOpt.isEmpty)
      return WarcRow(null, null, null, s"$path: missing Content-Length")
    val start = headEnd + 4
    val len = lenOpt.get
    if (start + len > member.length)
      return WarcRow(null, null, null,
        s"$path: truncated payload (${member.length - start} of $len bytes)")
    val payload = java.util.Arrays.copyOfRange(member, start, start + len)
    val url = fields.getOrElse("warc-target-uri", null)
    val ts = fields.get("warc-date").flatMap(parseWarcDate).orNull
    if (url == null || ts == null)
      WarcRow(null, null, null, s"$path: missing WARC-Target-URI or WARC-Date")
    else WarcRow(url, ts, payload, null)
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i <= b.length - 4) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** WARC-Date is ISO-8601 UTC (`2026-01-01T00:00:00Z`). */
  private def parseWarcDate(s: String): Option[Timestamp] =
    try Some(Timestamp.from(java.time.Instant.parse(s)))
    catch { case _: java.time.format.DateTimeParseException => None }

  // ---- encode side (test-boundary synthesis + the parity oracle) ----

  /** One record serialized per spec (response record, raw payload). */
  def recordBytes(url: String, ts: Timestamp, payload: Array[Byte]): Array[Byte] = {
    val date = java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(ts.toInstant)
    val header =
      s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"WARC-Date: $date\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        "\r\n"
    val h = header.getBytes(UTF_8)
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One gzip member wrapping one record. */
  def memberBytes(url: String, ts: Timestamp, payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new GzipCompressorOutputStream(bos)
    gz.write(recordBytes(url, ts, payload))
    gz.close()
    bos.toByteArray
  }

  /** Concatenate members into one container blob. */
  def containerBytes(records: Iterator[(String, Timestamp, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { case (url, ts, payload) =>
      bos.write(memberBytes(url, ts, payload))
    }
    bos.toByteArray
  }
}
