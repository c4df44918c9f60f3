package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{BinaryFeatures, MediaRow}
import graft.synth.{SynthSql, SynthUniverse}

/** The reference's scalar-function family (SURVEY.md §2.7) exercised as
  * oracle-checked projections, plus the multimodal binary-column path.
  *
  *  - q28: F1 trailing-digit id extraction
  *    (/root/reference/src/util/OsmObjectHelper.cpp:25-43), F3 zero-pad
  *    sequence → XXX/XXX/XXX path (util/URLHelper.cpp:57-72), F4 url
  *    join (URLHelper.cpp:43-54), F7 xmlEncode entity escaping
  *    (util/XmlReader.cpp:141-159) — all whole-stage-codegen string ops,
  *    no UDFs.
  *  - q41: multimodal binary metadata — documents.text re-encoded as an
  *    opaque binary payload (the pages.html column shape), pushed
  *    through the typed mapPartitions feature extractor
  *    [[graft.multimodal.BinaryFeatures.extract]] (real histogram +
  *    clearly-marked deterministic decode STUB), metadata checked
  *    against a byte-level DuckDB oracle.
  */
object FunctionQueries {

  /** F7 xmlEncode: '&' first so later entities aren't double-escaped. */
  private def xmlEncode(c: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
      "\"" -> "&quot;", "'" -> "&apos;")
      .foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** F8 xmlDecode incl. the reference's backslash quirk: `&quot;` →
    * `\"` and `&apos;` → `\'` — backslash-ESCAPED, not bare — as applied
    * to osmkey: objects (/root/reference/src/util/XmlReader.cpp:162-205,
    * applied at OsmChangeHandler.cpp:609-611). Entity order is the
    * inverse of [[xmlEncode]]: `&amp;` last so it can't re-trigger. */
  private def xmlDecodeQuirk(c: Column): Column =
    Seq("&quot;" -> "\\\"", "&apos;" -> "\\'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** F5 percent-encoding — the GENERAL byte encoder
    * [[graft.functions.UrlCodec]] (full non-unreserved set, uppercase
    * %XX, UTF-8 multi-byte per byte). The oracle mirrors it with an
    * exhaustive replace chain over every character class the test
    * string exercises. */
  private def percentEncode(c: Column): Column =
    graft.functions.UrlCodec.percentEncode(c)

  /** Every (char -> %XX bytes) pair the q47 probe string exercises —
    * reserved ASCII plus multi-byte UTF-8. '%' first so the chain can't
    * double-escape its own output. */
  private val encPairs: Seq[(String, String)] = Seq(
    "%" -> "%25", " " -> "%20", "!" -> "%21", "\"" -> "%22", "#" -> "%23",
    "$" -> "%24", "&" -> "%26", "'" -> "%27", "(" -> "%28", ")" -> "%29",
    "*" -> "%2A", "+" -> "%2B", "," -> "%2C", "/" -> "%2F", ":" -> "%3A",
    ";" -> "%3B", "<" -> "%3C", "=" -> "%3D", ">" -> "%3E", "?" -> "%3F",
    "@" -> "%40", "[" -> "%5B", "\\" -> "%5C", "]" -> "%5D", "^" -> "%5E",
    "`" -> "%60", "{" -> "%7B", "|" -> "%7C", "}" -> "%7D",
    "é" -> "%C3%A9", "ß" -> "%C3%9F", "€" -> "%E2%82%AC")

  /** The reserved-set + non-ASCII probe suffix ('~' stays unreserved). */
  private val probeSuffix: String = " !\"#$%'()*+,;<>@[\\]^`|~éß€"

  private def sqlPercentEncode(expr: String): String =
    encPairs.foldLeft(expr) { case (acc, (from, to)) =>
      s"replace($acc, '${from.replace("'", "''")}', '$to')"
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_url_encode" -> ((s, dir) => {
      SynthUniverse.changes(s, dir).select(col("seq"),
        percentEncode(concat(lit("update=DELETE WHERE { ?s ?p "),
          col("kind"), lit(":"), col("id"), lit(" } & flag=1/2?x=y"),
          lit(probeSuffix))).as("encoded"))
    }),
    "q48_state_parse" -> ((s, dir) => {
      // S5/F15: state.txt has backslash-escaped colons
      // (extractStateFromStateFile, OsmDataFetcher.cpp:178-202).
      val state = concat(lit("#Sat Aug 16 00:00:00 UTC 2025\nsequenceNumber="),
        col("seq"), lit("\ntimestamp=2025-08-0"), (col("seq") % 9) + 1,
        lit("T00\\:00\\:0"), col("seq") % 10, lit("Z"))
      SynthUniverse.changes(s, dir).select(col("seq").as("in_seq"),
        regexp_extract(state, "sequenceNumber=(\\d+)", 1).cast("long").as("seq_out"),
        replace(regexp_extract(state, "timestamp=(\\S+)", 1),
          lit("\\:"), lit(":")).as("ts_out"))
    }),
    "q46_xml_decode" -> ((s, dir) => {
      val raw = concat(col("v"), lit("&\"x'<>"))
      SynthUniverse.tags(s, dir)
        .filter(col("kind") === "node")
        .select(col("id"), xmlEncode(raw).as("enc"),
          xmlDecodeQuirk(xmlEncode(raw)).as("dec"))
    }),
    "q28_uri_scalars" -> ((s, dir) => {
      val seq9 = format_string("%09d", col("seq"))
      val path = concat_ws("/",
        substring(seq9, 1, 3), substring(seq9, 4, 3), substring(seq9, 7, 3))
      SynthUniverse.changes(s, dir)
        .select(col("seq"),
          path.as("path"),
          concat(lit("https://planet.osm.org/replication/day/"), path,
            lit(".osc.gz")).as("url"),
          regexp_extract(concat(lit("osmnode:"), col("id")), "(\\d+)$", 1)
            .cast("long").as("id_rt"),
          // F6 isValidUri (/root/reference/src/util/URLHelper.cpp:93-96)
          concat(lit("https://planet.osm.org/replication/day/"), path,
            lit(".osc.gz")).rlike("^https?://[A-Za-z0-9./_~-]+$").as("is_valid"),
          xmlEncode(concat(lit("a&b<"), col("kind"), lit(">\"c'"))).as("xml_enc"))
    }),
    "q137_frame_sample" -> ((s, dir) => {
      // multimodal FRAME-SAMPLING plumbing with no codec (offline
      // container, cf. q103): each document carries a fake "video" — 24
      // concatenated 16-byte frames whose bytes are deterministic but
      // opaque (md5 of doc_id:frame) — and the sampler slices every 4th
      // frame back out by byte arithmetic and fingerprints it. The
      // schema (binary column + typed metadata), the stride slicing,
      // and the narrow no-shuffle batch shape are the real pipeline;
      // only the pixel codec is absent. Synth and sampler share no
      // code: the sampler sees only the assembled bytes.
      val video = concat((0 until 24).map(i =>
        unhex(md5(concat(col("doc_id"), lit(s":$i"))))): _*)
      Tables.documents(s, dir)
        .select(col("doc_id"), video.as("video"))
        .select(col("doc_id"), col("video"),
          explode(array((0 until 24 by 4).map(i => lit(i)): _*)).as("fidx"))
        .select(col("doc_id"), col("fidx").cast("long").as("fidx"),
          // the sampler slices the BINARY; the oracle slices its hex
          // rendering — byte-offset agreement is exactly the check
          lower(hex(expr("substring(video, fidx*16 + 1, 16)"))).as("frame_hex"),
          length(col("video")).cast("long").as("n_bytes"))
    }),
    "q246_phash_neardup" -> ((s, dir) => {
      // perceptual-hash near-duplicate IMAGE detection — the
      // multimodal member of the dedup family (q13 text MinHash, q14
      // SimHash; this is aHash over an opaque 32-byte "thumbnail"
      // BINARY column). The codec is the honest stub (offline
      // container, cf. q103/q137): a real deployment decodes pixels
      // first; here the thumbnail bytes are deterministic md5 chunks,
      // with every 9th document carrying its PREDECESSOR's thumbnail
      // perturbed by one byte — the planted near-dup pairs. The
      // Spark-side plumbing is the real pipeline: fingerprint =
      // 32-bit mean-threshold aHash computed from the BINARY by byte
      // arithmetic, candidates from a 4x8-bit band equi-join (never
      // all-pairs), verify = bit_count(xor) <= 3 on candidates only.
      // With 4 bands and <= 3 differing bits, pigeonhole guarantees
      // one clean band, so banding is EXACT at this threshold — the
      // brute-force quadratic oracle must agree pair-for-pair.
      val sid = when(col("doc_id") % 9 === 1, col("doc_id") - 1)
        .otherwise(col("doc_id"))
      val h0 = concat(md5(concat(lit("img:"), sid)),
        md5(concat(lit("img2:"), sid)))
      val hexStr = when(col("doc_id") % 9 === 1,
        concat(expr("substring(h0, 1, (doc_id % 16) * 2)"), lit("00"),
          expr("substring(h0, (doc_id % 16) * 2 + 3, 64)")))
        .otherwise(col("h0"))
      val img = Tables.documents(s, dir)
        .select(col("doc_id"), h0.as("h0"))
        .select(col("doc_id"), unhex(hexStr).as("img"))
      // feature extraction reads ONLY the binary column
      val bytes = (1 to 32).map(i =>
        conv(hex(substring(col("img"), i, 1)), 16, 10).cast("long").as(s"b$i"))
      val withB = img.select(col("doc_id") +: bytes: _*)
        .withColumn("s", (1 to 32).map(i => col(s"b$i")).reduce(_ + _))
      val fp = (1 to 32).map(i =>
        when(col(s"b$i") * 32 > col("s"), lit(1L << (i - 1))).otherwise(lit(0L)))
        .reduce(_ + _)
      val fps = withB.select(col("doc_id"), fp.as("fp"))
      val bands = fps.select(col("doc_id"), col("fp"),
        explode(array((0 to 3).map(k => struct(lit(k).as("band"),
          shiftright(col("fp"), 8 * k).bitwiseAND(lit(255L)).as("key"))): _*)).as("bk"))
        .select(col("doc_id"), col("fp"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = bands.select(col("doc_id").as("id_a"), col("fp").as("fp_a"),
          col("band"), col("key"))
        .join(bands.select(col("doc_id").as("id_b"), col("fp").as("fp_b"),
          col("band"), col("key")), Seq("band", "key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
        .distinct()
      cand
        .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
    }),
    "q103_png_header" -> ((s, dir) => {
      // real binary-format decode with NO codec library: a PNG
      // signature + IHDR chunk is assembled as actual bytes (unhex /
      // big-endian packing), then parsed BACK by independent byte
      // arithmetic (substring into the binary + hex + base-16 conv) —
      // the image-metadata extraction a multimodal pipeline runs
      // before any pixel decode. Synth and parse deliberately share
      // no code; the closed-form oracle catches either side lying.
      // Pure narrow codegen plan, no shuffle.
      val w = lit(16L) + col("doc_id") % 2048
      val h = lit(16L) + (col("doc_id") * 7) % 2048
      def be4(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
      val header = concat(
        unhex(lit("89504E470D0A1A0A")), // PNG signature
        unhex(lit("0000000D")),         // IHDR length = 13
        encode(lit("IHDR"), "UTF-8"),
        be4(w), be4(h),
        unhex(lit("0806000000")))       // depth 8, RGBA, std flags
      Tables.documents(s, dir).select(col("doc_id"), header.as("png"))
        .select(col("doc_id"),
          conv(hex(substring(col("png"), 17, 4)), 16, 10).cast("long").as("width"),
          conv(hex(substring(col("png"), 21, 4)), 16, 10).cast("long").as("height"),
          conv(hex(substring(col("png"), 25, 1)), 16, 10).cast("long").as("bit_depth"),
          (hex(substring(col("png"), 1, 8)) === "89504E470D0A1A0A")
            .cast("long").as("is_png"),
          length(col("png")).cast("long").as("n_bytes"))
    }),
    "q41_binary_meta" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select(
        concat(lit("doc:"), col("doc_id")).as("url"),
        lit("text/html").as("mediaType"),
        encode(col("text"), "UTF-8").as("media")).as[MediaRow]
      BinaryFeatures.extract(media)
        .select(col("url"), col("nBytes").as("n_bytes"),
          col("width"), col("height"),
          element_at(col("histogram"), 3).as("hist_bin2"),
          element_at(col("histogram"), 8).as("hist_bin7"))
    }),
    "q62_frame_sample" -> ((s, dir) => {
      import s.implicits._
      // frame sampling over the video-like payload: every 4th 16-byte
      // frame window, digested per frame (split stub, real plumbing —
      // see BinaryFeatures.sampleFrames)
      val media = Tables.documents(s, dir).select(
        concat(lit("doc:"), col("doc_id")).as("url"),
        lit("video/x-stub").as("mediaType"),
        encode(col("text"), "UTF-8").as("media")).as[MediaRow]
      BinaryFeatures.sampleFrames(media, frameBytes = 16, every = 4).toDF()
    }),
  )

  val oracles: Map[String, String] = Map(
    "q47_url_encode" ->
      s"""WITH ${SynthSql.changesCte},
         |raw AS (SELECT seq,
         |  'update=DELETE WHERE { ?s ?p ' || kind || ':' || id || ' } & flag=1/2?x=y'
         |    || '${probeSuffix.replace("'", "''")}' AS r
         |  FROM changes)
         |SELECT seq, ${sqlPercentEncode("r")} AS encoded
         |FROM raw""".stripMargin,
    "q48_state_parse" ->
      s"""WITH ${SynthSql.changesCte},
         |st AS (SELECT seq AS in_seq,
         |  '#Sat Aug 16 00:00:00 UTC 2025' || chr(10) || 'sequenceNumber=' || seq
         |    || chr(10) || 'timestamp=2025-08-0' || (seq % 9 + 1)
         |    || 'T00\\:00\\:0' || (seq % 10) || 'Z' AS state
         |  FROM changes)
         |SELECT in_seq,
         |  CAST(regexp_extract(state, 'sequenceNumber=(\\d+)', 1) AS BIGINT) AS seq_out,
         |  replace(regexp_extract(state, 'timestamp=(\\S+)', 1), '\\:', ':') AS ts_out
         |FROM st""".stripMargin,
    "q46_xml_decode" ->
      s"""WITH ${SynthSql.waysCte}, ${SynthSql.nodesCte},
         |t AS (SELECT node_id AS id, 'v' || (node_id % 7) || '&"x''<>' AS raw FROM nodes),
         |e AS (SELECT id, replace(replace(replace(replace(replace(raw,
         |        '&','&amp;'), '<','&lt;'), '>','&gt;'), '"','&quot;'),
         |        '''','&apos;') AS enc FROM t)
         |SELECT id, enc,
         |  replace(replace(replace(replace(replace(enc,
         |    '&quot;', '\\"'), '&apos;', '\\'''), '&lt;','<'), '&gt;','>'),
         |    '&amp;','&') AS dec
         |FROM e""".stripMargin,
    "q28_uri_scalars" ->
      s"""WITH ${SynthSql.changesCte},
         |f AS (SELECT seq, kind, id, printf('%09d', seq) AS seq9 FROM changes),
         |g AS (SELECT seq, kind, id,
         |        substr(seq9,1,3) || '/' || substr(seq9,4,3) || '/' || substr(seq9,7,3) AS path
         |      FROM f)
         |SELECT seq, path,
         |  'https://planet.osm.org/replication/day/' || path || '.osc.gz' AS url,
         |  CAST(regexp_extract('osmnode:' || id, '(\\d+)$$', 1) AS BIGINT) AS id_rt,
         |  regexp_matches('https://planet.osm.org/replication/day/' || path || '.osc.gz',
         |    '^https?://[A-Za-z0-9./_~-]+$$') AS is_valid,
         |  replace(replace(replace(replace(replace(
         |    'a&b<' || kind || '>"c''',
         |    '&','&amp;'), '<','&lt;'), '>','&gt;'), '"','&quot;'), '''','&apos;') AS xml_enc
         |FROM g""".stripMargin,
    "q137_frame_sample" -> {
      val terms = (0 until 24)
        .map(i => s"md5(doc_id || ':$i')").mkString(" || ")
      val strides = (0 until 24 by 4).mkString(", ")
      s"""WITH v AS (SELECT doc_id, $terms AS video_hex FROM documents)
         |SELECT doc_id, CAST(fidx AS BIGINT) AS fidx,
         |  substring(video_hex, fidx*32 + 1, 32) AS frame_hex,
         |  CAST(length(video_hex) // 2 AS BIGINT) AS n_bytes
         |FROM v, unnest([$strides]) AS t(fidx)""".stripMargin
    },
    // independent formulation: brute-force quadratic hamming join —
    // exact at threshold 3 (pigeonhole over the 4 bands), so the
    // banded plan must reproduce it pair-for-pair
    "q246_phash_neardup" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 1 THEN doc_id - 1 ELSE doc_id END AS sid
        |  FROM documents),
        |hx0 AS (SELECT doc_id,
        |    md5('img:' || sid) || md5('img2:' || sid) AS h0
        |  FROM src),
        |hx AS (SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 1 THEN
        |      substr(h0, 1, CAST((doc_id % 16) * 2 AS INT)) || '00'
        |        || substr(h0, CAST((doc_id % 16) * 2 + 3 AS INT), 64)
        |    ELSE h0 END AS h
        |  FROM hx0),
        |bytes AS (SELECT doc_id, i,
        |    CAST('0x' || substr(h, CAST(2*i - 1 AS INT), 2) AS BIGINT) AS b
        |  FROM hx, range(1, 33) t(i)),
        |st AS (SELECT doc_id, SUM(b) AS s FROM bytes GROUP BY 1),
        |fp AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN b * 32 > s THEN 1::BIGINT << CAST(i - 1 AS INT)
        |      ELSE 0 END) AS BIGINT) AS fp
        |  FROM bytes JOIN st USING (doc_id) GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin,
    "q103_png_header" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 2048 AS BIGINT) AS width,
        |  CAST(16 + (doc_id * 7) % 2048 AS BIGINT) AS height,
        |  CAST(8 AS BIGINT) AS bit_depth,
        |  CAST(1 AS BIGINT) AS is_png,
        |  CAST(29 AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    "q41_binary_meta" ->
      """SELECT 'doc:' || doc_id AS url,
        |  octet_length(encode(text)) AS n_bytes,
        |  1 + (ascii(text[1]) & 127) AS width,
        |  1 + (ascii(text[-1]) & 127) AS height,
        |  length(text) - length(regexp_replace(text, '[ -/]', '', 'g')) AS hist_bin2,
        |  length(text) - length(regexp_replace(text, '[p-~\x7f]', '', 'g')) AS hist_bin7
        |FROM documents""".stripMargin,
    "q62_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, octet_length(encode(text)) // 16, 4)) AS idx
        |  FROM documents)
        |SELECT 'doc:' || doc_id AS url, CAST(idx AS INT) AS frame_idx,
        |  md5(substr(text, CAST(idx * 16 + 1 AS INT), 16)) AS frame_md5
        |FROM f""".stripMargin,
  )
}
