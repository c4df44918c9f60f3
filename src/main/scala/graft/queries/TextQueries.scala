package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Text-analysis operators over the `documents` table — the
  * language-ID / quality-scoring / token-counting / fingerprinting
  * stages a large-scale training-data pipeline runs before dedup.
  * All scores are emitted in exact integer milli/ppm units so the
  * DuckDB oracle hashes bit-identically.
  */
object TextQueries {

  /** (lang, stopword profile). Deliberately tiny n-gram-free heuristic
    * profiles; argmax with (score DESC, lang ASC) tie-break. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "y", "es", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3"),
  )

  private def inList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ",", ")")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_langid" -> ((s, dir) => {
      // score_l = count of profile-stopword tokens (with multiplicity);
      // winner = min over (−score, lang) struct ordering — codegen'd,
      // no UDF, no shuffle beyond the scan.
      val docs = Tables.documents(s, dir).withColumn("ts", tokens(col("text")))
      val scored = langProfiles.foldLeft(docs) { case (df, (lang, words)) =>
        df.withColumn(s"score_$lang",
          expr(s"size(filter(ts, t -> t IN ${inList(words)}))").cast("long"))
      }
      val candidates = array(langProfiles.map { case (lang, _) =>
        struct((-col(s"score_$lang")).as("neg"), lit(lang).as("lang"))
      }: _*)
      scored.select(
        col("doc_id"),
        array_min(candidates).getField("lang").as("pred_lang"),
        greatest(langProfiles.map(p => col(s"score_${p._1}")): _*).as("best_score"))
    }),
    "q16_quality_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).withColumn("ts", tokens(col("text")))
      docs.select(
        col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        size(array_distinct(col("ts"))).cast("long").as("n_types"),
        round(lit(1000.0) * size(array_distinct(col("ts"))) / size(col("ts")), 0)
          .cast("long").as("ttr_milli"),
        round(lit(1000.0) *
          expr("size(filter(ts, t -> t IN ('the','a','of','and','is')))") / size(col("ts")), 0)
          .cast("long").as("stop_milli"),
        round(lit(1000.0) * size(array_distinct(col("ts"))) / size(col("ts")) *
          least(lit(1.0), size(col("ts")) / lit(100.0)), 0)
          .cast("long").as("quality_milli"))
    }),
    "q17_token_count" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        regexp_count(lower(col("text")), lit("[a-z]+")).cast("long").as("word_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"))
    }),
    "q18_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        rollingFingerprint(tokens(col("text"))).as("fingerprint"))
    }),
    "q61_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: flag training docs sharing an exact
      // n-gram with the held-out set (doc_id % 11 here; n=3 suits this
      // corpus's vocabulary — production uses 8-13). Scale shape: the
      // benchmark gram set is the SMALL side (broadcast); training docs
      // stream through one explode + hash semi-join + count — never an
      // all-pairs comparison.
      val n = 3
      val grams = Tables.documents(s, dir)
        .withColumn("ts", tokens(col("text")))
        .filter(size(col("ts")) >= n)
        .select(col("doc_id"), explode(
          transform(sequence(lit(1), size(col("ts")) - (n - 1)),
            i => array_join(slice(col("ts"), i, lit(n)), " "))).as("g"))
      val bench = grams.filter(col("doc_id") % 11 === 0).select(col("g")).distinct()
      grams.filter(col("doc_id") % 11 =!= 0)
        .join(broadcast(bench), Seq("g"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_hits"))
    }),
  )

  private val profileSql = langProfiles.map { case (lang, words) =>
    lang -> s"len(list_filter(ts, t -> t IN ${inList(words)}))"
  }

  val oracles: Map[String, String] = Map(
    "q15_langid" -> {
      val scores = profileSql.map { case (l, e) => s"SELECT doc_id, '$l' AS lang, $e AS score FROM toks" }
        .mkString("\nUNION ALL\n")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents
         |), scores AS ($scores)
         |SELECT doc_id, lang AS pred_lang, CAST(score AS BIGINT) AS best_score
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, lang ASC) AS rn FROM scores)
         |WHERE rn = 1""".stripMargin
    },
    "q16_quality_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(ts) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(ts)) AS BIGINT) AS n_types,
        |  CAST(ROUND(1000.0*len(list_distinct(ts))/len(ts),0) AS BIGINT) AS ttr_milli,
        |  CAST(ROUND(1000.0*len(list_filter(ts, t -> t IN ('the','a','of','and','is')))/len(ts),0) AS BIGINT) AS stop_milli,
        |  CAST(ROUND(1000.0*len(list_distinct(ts))/len(ts)*LEAST(1.0, len(ts)/100.0),0) AS BIGINT) AS quality_milli
        |FROM toks""".stripMargin,
    "q17_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS word_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual
        |FROM documents""".stripMargin,
    "q18_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents
        |)
        |SELECT doc_id,
        |  CAST(list_reduce(
        |    list_prepend(0::BIGINT,
        |      [CAST('0x' || substr(md5(t),1,15) AS BIGINT) % 1099511627776 for t in ts]),
        |    (a, b) -> (a * 1000003 + b) % 1099511627776) AS BIGINT) AS fingerprint
        |FROM toks""".stripMargin,
    "q61_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, unnest([array_to_string(ts[i:i+2], ' ')
        |                         for i in range(1, len(ts) - 1)]) AS g
        |  FROM toks WHERE len(ts) >= 3
        |),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 11 = 0)
        |SELECT g.doc_id, CAST(COUNT(DISTINCT g.g) AS BIGINT) AS n_hits
        |FROM grams g JOIN bench b ON g.g = b.g
        |WHERE g.doc_id % 11 <> 0
        |GROUP BY 1""".stripMargin,
  )
}
