package graft.osm

import java.io.{ByteArrayInputStream, InputStream}
import java.sql.Timestamp
import java.util.zip.GZIPInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import org.apache.spark.sql.{Dataset, SparkSession}

/** OsmChange (`.osc` / `.osc.gz`) source: binaryFile scan + per-file
  * gunzip + StAX pull-parse into a typed `Dataset[ChangeOp]`.
  *
  * Re-imagines /root/reference/src/util/Decompressor.cpp:34-50 (gzip),
  * src/util/XmlReader.cpp:31-52 (XML→ptree) and the per-element
  * routing of src/osm/OsmChangeHandler.cpp:153-197 — but streaming
  * (constant memory per file, no materialized property tree) and
  * distributed (one task per change file; files are the natural
  * parallelism unit of the replication stream, README.md:22-26).
  *
  * The sequence number is taken from the trailing digits of the file
  * name (mirrors the reference's `XXX/XXX/XXX.osc.gz` layout,
  * src/util/URLHelper.cpp:57-72).
  */
object OscReader {

  def read(spark: SparkSession, pathGlob: String): Dataset[ChangeOp] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseFile(path, bytes) }
  }

  def parseFile(path: String, bytes: Array[Byte]): Iterator[ChangeOp] = {
    val seq = "(\\d+)\\.osc(\\.gz|\\.bz2)?$".r.findFirstMatchIn(path)
      .map(_.group(1).toInt).getOrElse(0)
    val raw: InputStream = new ByteArrayInputStream(bytes)
    // S1 gzip / S2 bzip2 (Decompressor.cpp:34-68); commons-compress
    // ships with Spark so the bzip2 leg costs no extra dependency.
    val in =
      if (path.endsWith(".gz")) new GZIPInputStream(raw)
      else if (path.endsWith(".bz2"))
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(raw)
      else raw
    parseStream(seq, in)
  }

  /** StAX pull-parse of one `<osmChange>` document. */
  def parseStream(seq: Int, in: InputStream): Iterator[ChangeOp] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(in)
    val out = Vector.newBuilder[ChangeOp]

    var action: String = null
    var kind: String = null
    var id = 0L; var version = 0; var ts: Timestamp = null; var visible = true
    var lon: Option[Double] = None; var lat: Option[Double] = None
    var refs = Vector.newBuilder[Long]
    var mems = Vector.newBuilder[RelMember]
    var tags = Map.newBuilder[String, String]

    def attr(name: String): Option[String] =
      Option(r.getAttributeValue(null, name))

    def flush(): Unit = {
      out += ChangeOp(seq, action, kind, id, version, ts, visible,
        lon, lat, refs.result(), mems.result(), tags.result())
      refs = Vector.newBuilder; mems = Vector.newBuilder; tags = Map.newBuilder[String, String]
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case a @ ("create" | "modify" | "delete") => action = a
            case k @ ("node" | "way" | "relation") =>
              kind = k
              id = attr("id").map(_.toLong).getOrElse(0L)
              version = attr("version").map(_.toInt).getOrElse(0)
              ts = attr("timestamp").map(parseTs).orNull
              visible = attr("visible").forall(_ != "false")
              lon = attr("lon").map(_.toDouble)
              lat = attr("lat").map(_.toDouble)
            case "nd" => attr("ref").foreach(v => refs += v.toLong)
            case "member" =>
              mems += RelMember(
                attr("ref").map(_.toLong).getOrElse(0L),
                attr("type").getOrElse(""),
                attr("role").getOrElse(""))
            case "tag" =>
              for (k <- attr("k"); v <- attr("v")) tags += (k -> v)
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "node" | "way" | "relation" => flush()
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    out.result().iterator
  }

  /** ISO-8601 with trailing Z (reference keeps the Z suffix,
    * tests/osm/Node.cpp:18-23); stored as UTC timestamp. */
  def parseTs(s: String): Timestamp =
    Timestamp.from(java.time.Instant.parse(if (s.endsWith("Z")) s else s + "Z"))
}
