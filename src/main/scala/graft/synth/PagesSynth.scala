package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables
import graft.text.TextExtractor

/** The north-rule `pages` table (url, warc_ts, html BINARY, text, lang)
  * synthesized deterministically from `documents` (no external data):
  * html wraps the document text in a fixed template exercising script/
  * style blocks, entities, and nested tags; `text` is DEFINED as
  * `TextExtractor.extract(html)` — the byte-identical invariant is
  * asserted per row in PagesSpec and oracle-checked in q41.
  */
object PagesSynth {

  /** html template as a Column expression over (doc_id, source, text). */
  def htmlCol(docId: org.apache.spark.sql.Column, source: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lit("<html><head><title>Doc &lt;"), docId, lit("&gt;</title>"),
      lit("<style>p { color: red; }</style></head>"),
      lit("<body><h1>"), source, lit("</h1>"),
      lit("<script>if (1 < 2) { x = \"a&b\"; }</script>"),
      lit("<p>"), regexp_replace(text, " merge ", " &amp; "), lit("</p>"),
      lit("<footer>end &quot;page&quot;</footer></body></html>"))

  /** DuckDB mirror of [[htmlCol]]. */
  val htmlSql: String =
    "'<html><head><title>Doc &lt;' || doc_id || '&gt;</title>" +
      "<style>p { color: red; }</style></head>" +
      "<body><h1>' || source || '</h1>" +
      "<script>if (1 < 2) { x = \"a&b\"; }</script>" +
      "<p>' || regexp_replace(text, ' merge ', ' &amp; ', 'g') || '</p>" +
      "<footer>end &quot;page&quot;</footer></body></html>'"

  /** pages(url, warc_ts, html, text, lang) per BASELINE.json input_hint. */
  def pages(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val html = htmlCol(col("doc_id"), col("source"), col("text"))
    d.select(
      concat(lit("https://example.org/"), col("source"), lit("/"), col("doc_id")).as("url"),
      timestamp_seconds(lit(1700000000L) + col("doc_id") * 60).as("warc_ts"),
      encode(html, "UTF-8").as("html"),
      TextExtractor.extractCol(html).as("text"),
      col("lang"))
  }
}
