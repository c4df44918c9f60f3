package graft.text

import graft.SparkTestBase
import graft.synth.PagesSynth
import java.nio.charset.StandardCharsets

class PagesSpec extends SparkTestBase {

  test("per-row invariant: text is byte-identical to extract(html) for every url") {
    val rows = PagesSynth.pages(spark, sfSmall)
      .select("url", "html", "text").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val url = r.getString(0)
      val html = r.getAs[Array[Byte]](1)
      val text = r.getString(2)
      val re = TextExtractor.extract(html)
      assert(re.getBytes(StandardCharsets.UTF_8)
        .sameElements(text.getBytes(StandardCharsets.UTF_8)),
        s"extraction mismatch for $url:\n got: $re\n want: $text")
    }
  }

  test("golden extraction: script/style dropped, entities decoded, ws collapsed") {
    val html =
      """<html><head><title>T &lt;1&gt;</title><style>p {a:b}</style></head>
        |<body><script>if (1 < 2) { x = "a&b"; }</script>
        |<h1>Hello</h1>  <p>one &amp; two &quot;q&quot;</p></body></html>""".stripMargin
    assert(TextExtractor.extract(html) === "T <1> Hello one & two \"q\"")
  }

  test("extraction is deterministic and stable across engine paths") {
    // Column path (codegen) vs pure Scala path on the same input
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val htmls = Seq(
      "<p>a</p><p>b</p>",
      "plain no tags",
      "<script>drop()</script>keep &amp; this",
      "<style>s</style><b>bold</b> &apos;q&apos;")
    val viaCol = htmls.toDF("h").select(TextExtractor.extractCol(col("h")))
      .collect().map(_.getString(0))
    assert(viaCol.toSeq === htmls.map(TextExtractor.extract))
  }
}
