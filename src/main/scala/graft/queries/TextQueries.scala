package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.functions.TextFunctions.{English, LangProfiles}
import org.apache.spark.sql.functions._

/** Text-analysis operator family (language-ID, quality scoring, token
  * counting, fingerprinting) as oracle-checked queries. All column
  * functions are pure Catalyst expressions, so each has an exact
  * DuckDB mirror (list_filter / list_transform lambdas).
  */
object TextQueries {

  /** DuckDB-side whitespace tokenization matching TextFunctions.tokens. */
  private val toksSql =
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> length(x) > 0)"

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  def defs: Seq[QueryDef] = Seq(
    // ----- q23: token statistics per language
    QueryDef(
      "q23_token_stats",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"lang", TextFunctions.tokenCount($"text").as("n_tokens"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("total_tokens"),
            min($"n_tokens").as("min_tokens"),
            max($"n_tokens").as("max_tokens"))
          .orderBy($"lang")
      },
      Some(s"""SELECT lang, COUNT(*) AS n_docs,
              |  SUM(len($toksSql)) AS total_tokens,
              |  MIN(len($toksSql)) AS min_tokens,
              |  MAX(len($toksSql)) AS max_tokens
              |FROM documents
              |GROUP BY lang
              |ORDER BY lang""".stripMargin)),

    // ----- q24: language-ID confusion matrix (labeled lang × predicted)
    QueryDef(
      "q24_lang_id",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"lang", TextFunctions.langId($"text").as("pred"))
          .groupBy($"lang", $"pred")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"pred")
      },
      Some {
        val scores = LangProfiles.default.map { case (code, words) =>
          s"len(list_filter($toksSql, x -> x IN ${inList(words)})) AS s_$code"
        }.mkString(",\n  ")
        s"""SELECT lang, pred, COUNT(*) AS n FROM (
           |  SELECT lang,
           |    CASE
           |      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           |      WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           |      WHEN s_es >= s_fr THEN 'es'
           |      ELSE 'fr' END AS pred
           |  FROM (SELECT lang,
           |  $scores
           |  FROM documents))
           |GROUP BY lang, pred
           |ORDER BY lang, pred""".stripMargin
      }),

    // ----- q25: per-document quality scoring (length/repetition/
    // stopword-density/token-shape heuristics)
    QueryDef(
      "q25_quality_score",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(
            $"doc_id",
            TextFunctions.tokenCount($"text").as("n_tokens"),
            round(TextFunctions.distinctRatio($"text"), 4).as("distinct_ratio"),
            round(TextFunctions.stopwordRatio($"text", English.stopwords), 4).as("stopword_ratio"),
            round(TextFunctions.avgTokenLen($"text"), 4).as("avg_token_len"),
            round(TextFunctions.qualityScore($"text"), 4).as("quality"))
          .orderBy($"doc_id")
      },
      Some {
        val sw = inList(English.stopwords)
        s"""SELECT doc_id,
           |  len($toksSql) AS n_tokens,
           |  round(CASE WHEN len($toksSql) = 0 THEN 0.0
           |    ELSE len(list_distinct($toksSql)) * 1.0 / len($toksSql) END, 4) AS distinct_ratio,
           |  round(CASE WHEN len($toksSql) = 0 THEN 0.0
           |    ELSE len(list_filter($toksSql, x -> x IN $sw)) * 1.0 / len($toksSql) END, 4) AS stopword_ratio,
           |  round(CASE WHEN len($toksSql) = 0 THEN 0.0
           |    ELSE list_sum(list_transform($toksSql, x -> length(x))) * 1.0 / len($toksSql) END, 4) AS avg_token_len,
           |  round(
           |    0.3 * (CASE WHEN len($toksSql) = 0 THEN 0.0
           |      ELSE len(list_distinct($toksSql)) * 1.0 / len($toksSql) END) +
           |    0.3 * least(len($toksSql) / 100.0, 1.0) +
           |    0.2 * (1.0 - (CASE WHEN len($toksSql) = 0 THEN 0.0
           |      ELSE len(list_filter($toksSql, x -> x IN $sw)) * 1.0 / len($toksSql) END)) +
           |    0.2 * least((CASE WHEN len($toksSql) = 0 THEN 0.0
           |      ELSE list_sum(list_transform($toksSql, x -> length(x))) * 1.0 / len($toksSql) END) / 8.0, 1.0),
           |  4) AS quality
           |FROM documents
           |ORDER BY doc_id""".stripMargin
      })
  )
}
