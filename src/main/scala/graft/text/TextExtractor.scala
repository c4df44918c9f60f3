package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HTML → text extraction (the north-rule per-row
  * invariant: byte-identical extracted text per url).
  *
  * Two implementations of the SAME specification:
  *  - [[extractCol]]: codegen'd Column chain (regexp_replace) — the
  *    100 TB path, stays inside whole-stage codegen;
  *  - [[extract]]: pure Scala reference implementation used for the
  *    per-row invariant test and driver-side use.
  *
  * Spec (applied in this exact order; order is part of the contract):
  *  1. drop <script>...</script> and <style>...</style> blocks;
  *  2. every remaining tag <...> becomes a single space;
  *  3. decode entities &lt; &gt; &quot; &apos; then &amp; LAST;
  *  4. collapse whitespace runs to one space; trim.
  */
object TextExtractor {

  val BlockRe = "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
  val TagRe = "<[^>]*>"

  def extract(html: String): String = {
    var s = html.replaceAll(BlockRe, " ")
    s = s.replaceAll(TagRe, " ")
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
    s.replaceAll("\\s+", " ").trim
  }

  def extract(html: Array[Byte]): String =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def extractCol(html: Column): Column = {
    var s = regexp_replace(html, BlockRe, " ")
    s = regexp_replace(s, TagRe, " ")
    s = regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      s, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&apos;", "'"), "&amp;", "&")
    trim(regexp_replace(s, "\\s+", " "))
  }

  /** DuckDB mirror of [[extractCol]] for the oracle. */
  def extractSql(html: String): String = {
    val noBlocks = s"regexp_replace($html, '$BlockRe', ' ', 'g')"
    val noTags = s"regexp_replace($noBlocks, '$TagRe', ' ', 'g')"
    val decoded = s"replace(replace(replace(replace(replace($noTags," +
      " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&apos;', ''''), '&amp;', '&')"
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}
