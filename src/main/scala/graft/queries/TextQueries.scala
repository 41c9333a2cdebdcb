package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * n-gram-heuristic language ID, quality scoring, token counting
  * (whitespace + regex), and document fingerprinting. All arithmetic is
  * portable (length/replace/md5), so DuckDB computes identical values.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Occurrences of marker `m` in text via length-difference — portable,
    * overlapping-free count (plain string replace, not regex). */
  private def markerCount(text: Column, m: String): Column =
    ((length(text) - length(replace(text, lit(m), lit("")))) / m.length).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Language ID by stopword-marker scores with a fixed priority order on
    // ties (en > es > de > fr); confusion counts per (actual, predicted).
    "q_lang_id" -> ((s, dir) => {
      val txt = concat(lit(" "), lower(col("text")), lit(" "))
      val en = markerCount(txt, " the ") + markerCount(txt, " and ")
      val es = markerCount(txt, " el ") + markerCount(txt, " la ")
      val de = markerCount(txt, " der ") + markerCount(txt, " und ")
      val fr = markerCount(txt, " le ") + markerCount(txt, " et ")
      t(s, dir, "documents")
        .withColumn("pred",
          when(en >= es && en >= de && en >= fr && en > 0, "en")
            .when(es >= de && es >= fr && es > 0, "es")
            .when(de >= fr && de > 0, "de")
            .when(fr > 0, "fr")
            .otherwise("unk"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
    }),

    // Quality score: token count, average token length, stopword ratio,
    // punctuation ratio → weighted score.
    "q_quality" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val nToks = size(toks).cast("long")
      val txt = concat(lit(" "), lower(col("text")), lit(" "))
      val stop = markerCount(txt, " the ") + markerCount(txt, " a ") + markerCount(txt, " and ")
      val punct = (length(col("text")) -
        length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long")
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          nToks.as("n_tokens"),
          round((length(col("text")) - nToks + 1).cast("double") / nToks.cast("double"), 4)
            .as("avg_token_len"),
          round(stop.cast("double") / nToks.cast("double"), 4).as("stopword_ratio"),
          punct.as("n_punct"),
          round(
            least(nToks.cast("double") / 100.0, lit(1.0)) * 0.4 +
              least(stop.cast("double") / nToks.cast("double") * 5.0, lit(1.0)) * 0.6, 4)
            .as("quality_score"))
    }),

    // Token counting: whitespace tokens + BPE-ish regex pieces
    // (letter runs / digit runs / single non-alnum), aggregated per source.
    "q_token_count" -> ((s, dir) => {
      val nWs = size(split(col("text"), "\\s+")).cast("long")
      val nRe = regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).cast("long")
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(nWs).as("ws_tokens"), sum(nRe).as("re_tokens"),
          count(lit(1)).as("n_docs"))
    }),

    // Document fingerprinting: full-content hash of normalized text +
    // prefix hash of the first 8 tokens (the cheap near-dup prefilter).
    "q_fingerprint" -> ((s, dir) => {
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val toks = split(norm, " ")
      val prefix = concat_ws(" ", slice(toks, 1, 8))
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(norm).as("fp_full"),
          substring(md5(prefix), 1, 16).as("fp_prefix"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_lang_id" ->
      """WITH m AS (
        |  SELECT lang,
        |    (length(t) - length(replace(t, ' the ', ''))) // 5 + (length(t) - length(replace(t, ' and ', ''))) // 5 AS en,
        |    (length(t) - length(replace(t, ' el ', ''))) // 4 + (length(t) - length(replace(t, ' la ', ''))) // 4 AS es,
        |    (length(t) - length(replace(t, ' der ', ''))) // 5 + (length(t) - length(replace(t, ' und ', ''))) // 5 AS de,
        |    (length(t) - length(replace(t, ' le ', ''))) // 4 + (length(t) - length(replace(t, ' et ', ''))) // 4 AS fr
        |  FROM (SELECT lang, concat(' ', lower(text), ' ') AS t FROM documents))
        |SELECT lang,
        |       CASE WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
        |            WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
        |            WHEN de >= fr AND de > 0 THEN 'de'
        |            WHEN fr > 0 THEN 'fr'
        |            ELSE 'unk' END AS pred,
        |       count(*) AS n
        |FROM m GROUP BY 1, 2""".stripMargin,

    "q_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |         cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         length(text) AS n_chars2,
        |         cast((length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' the ', ''))) // 5
        |            + (length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' a ', ''))) // 3
        |            + (length(concat(' ', lower(text), ' ')) - length(replace(concat(' ', lower(text), ' '), ' and ', ''))) // 5 AS BIGINT) AS stop,
        |         cast(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |       round(cast(n_chars2 - n_tokens + 1 AS DOUBLE) / cast(n_tokens AS DOUBLE), 4) AS avg_token_len,
        |       round(cast(stop AS DOUBLE) / cast(n_tokens AS DOUBLE), 4) AS stopword_ratio,
        |       n_punct,
        |       round(least(cast(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 +
        |             least(cast(stop AS DOUBLE) / cast(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.6, 4) AS quality_score
        |FROM q""".stripMargin,

    "q_token_count" ->
      """SELECT source,
        |       cast(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS ws_tokens,
        |       cast(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS re_tokens,
        |       count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    "q_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp_full,
        |       substr(md5(array_to_string((string_split(norm, ' '))[1:8], ' ')), 1, 16) AS fp_prefix
        |FROM n""".stripMargin
  )
}
