package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.WarcReader
import graft.synth.PagesSynth
import graft.text.TextExtractor

/** WARC container ingest face (VERDICT r4 item 3): the pages-side
  * analog of the reference's gzip change-file ingest
  * (/root/reference/src/util/Decompressor.cpp:34-50, S1 contract).
  *
  *  - q296: full encode→decode round trip — pages rows serialized to
  *    gzip member-per-record containers (one per partition, in-plan,
  *    no disk) and parsed back through the production
  *    [[WarcReader.parseContainer]] path; output must equal the pages
  *    projection DuckDB derives straight from `documents`.
  *  - q297: fault containment — every 10th record's member is
  *    truncated mid-payload; the surviving rows must be exactly the
  *    non-corrupted ones (the resync scan keeps one bad member from
  *    swallowing its container).
  */
object WarcQueries {

  /** Pages encoded to gzip member-per-record containers (one per
    * partition, in-plan) and parsed back through the production
    * [[WarcReader.parseContainer]] path; clean rows only. */
  private def parsedPages(s: SparkSession, dir: String,
      corruptEvery: Option[Int]): DataFrame = {
    import s.implicits._
    val pages = PagesSynth.pages(s, dir)
      .select(col("url"), col("warc_ts"), col("html"))
    val parsed = pages
      .repartition(32, col("url"))
      .as[(String, Timestamp, Array[Byte])]
      .mapPartitions { it =>
        val bos = new java.io.ByteArrayOutputStream()
        it.foreach { case (u, t, h) =>
          val member = WarcReader.memberBytes(u, t, h)
          // corruption rule is DATA-derived (trailing doc id in the
          // url) so the oracle can mirror it — partition-local
          // positions aren't SQL-visible
          val docId = u.substring(u.lastIndexOf('/') + 1).toLong
          val bad = corruptEvery.exists(k => docId % k == 0)
          // truncate the gzip trailer + tail: gunzip fails mid-member,
          // exercising the error row + magic-byte resync path
          if (bad) bos.write(member, 0, math.max(1, member.length - 8))
          else bos.write(member)
        }
        WarcReader.parseContainer("mem", bos.toByteArray)
      }
    parsed.toDF().where(col("error").isNull)
  }

  private def roundTrip(s: SparkSession, dir: String,
      corruptEvery: Option[Int]): DataFrame =
    parsedPages(s, dir, corruptEvery)
      .select(col("url"),
        unix_timestamp(col("warc_ts")).as("epoch"),
        length(col("html")).cast("long").as("n_bytes"),
        TextExtractor.extractCol(decode(col("html"), "UTF-8")).as("text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q296_warc_roundtrip" -> ((s, dir) => roundTrip(s, dir, None)),
    "q297_warc_errors" -> ((s, dir) =>
      // corrupt the member of every doc_id % 10 == 0 record; survivors
      // must be exactly the other rows. n_bytes/text are dropped: the
      // per-byte parity is q296's job, this one proves WHICH rows
      // survive a corrupt neighbor.
      roundTrip(s, dir, Some(10)).select(col("url"), col("epoch"))),
    "q299_warc_pipeline" -> ((s, dir) => {
      // the COMPLETE north-rule ingest→join journey through the real
      // container format: WARC members → parse → HTML→text extraction
      // → gazetteer geo-entity extraction → cell-prefiltered PIP join
      // → per-polygon doc counts. Every stage is the production
      // operator (WarcReader, TextExtractor, pointsOf, pipJoin); the
      // oracle re-derives the whole chain from `documents` in SQL.
      val docs = parsedPages(s, dir, None).select(
        regexp_extract(col("url"), "(\\d+)$", 1).cast("long").as("doc_id"),
        TextExtractor.extractCol(decode(col("html"), "UTF-8")).as("text"))
      val pts = graft.synth.SynthUniverse.pointsOf(docs)
      val polys = graft.spatial.SpatialJoin.polygons(
        graft.synth.SynthUniverse.wayMembers(s, dir),
        graft.synth.SynthUniverse.nodes(s, dir))
      graft.spatial.SpatialJoin.pipJoin(pts, polys, SpatialQueries.PipRes)
        .groupBy(col("way_id"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_hits"))
    }),
  )

  private val pagesCte: String =
    s"""pages AS (SELECT
       |  'https://example.org/' || source || '/' || doc_id AS url,
       |  1700000000 + doc_id * 60 AS epoch,
       |  ${PagesSynth.htmlSql} AS html,
       |  doc_id
       |FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q296_warc_roundtrip" ->
      s"""WITH $pagesCte
         |SELECT url, CAST(epoch AS BIGINT) AS epoch,
         |  CAST(strlen(html) AS BIGINT) AS n_bytes,
         |  ${TextExtractor.extractSql("html")} AS text
         |FROM pages""".stripMargin,
    "q297_warc_errors" ->
      s"""WITH $pagesCte
         |SELECT url, CAST(epoch AS BIGINT) AS epoch
         |FROM pages WHERE doc_id % 10 <> 0""".stripMargin,
    // the gazetteer/hash-placement CTE is SynthSql.pointsCte retargeted
    // at the WARC-extracted text instead of documents.text
    "q299_warc_pipeline" ->
      s"""WITH $pagesCte,
         |docs2 AS (SELECT doc_id,
         |  ${graft.text.TextExtractor.extractSql("html")} AS text FROM pages),
         |${graft.synth.SynthSql.pointsCte.replace("FROM documents", "FROM docs2")},
         |${graft.synth.SynthSql.waysCte}
         |SELECT way_id,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  COUNT(*) AS n_hits
         |FROM points JOIN ways
         |  ON lon BETWEEN x0 AND x0 + w AND lat BETWEEN y0 AND y0 + h
         |GROUP BY 1""".stripMargin,
  )
}
