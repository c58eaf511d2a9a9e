package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table, each with a DuckDB
  * oracle computing the identical formula (SURVEY.md §7.1 item 8 /
  * training-data-pipeline extension surface).
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Common DuckDB fragments mirroring TextFunctions. */
  private val duckToks = "regexp_split_to_array(trim(text), '\\s+')"
  private def duckStopCount(toksExpr: String, words: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> t IN (${words.map("'" + _ + "'").mkString(",")})))"

  // ------------------------------------------------------ token counting
  def txtTokens(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    d.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_calc"),
      size(bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  val txtTokensSql: String =
    s"""SELECT doc_id,
       |  CAST(len($duckToks) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars_calc,
       |  CAST(len(regexp_extract_all(text, '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT) AS n_bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ quality scoring
  def txtQuality(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    d.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      stopwordCount(tokens(col("text")), EnglishStops).as("n_stop"),
      punctCount(col("text")).as("n_punct"),
      qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  val txtQualitySql: String = {
    val stops = duckStopCount(duckToks, EnglishStops)
    s"""SELECT doc_id,
       |  CAST(len($duckToks) AS BIGINT) AS n_tokens,
       |  CAST($stops AS BIGINT) AS n_stop,
       |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:()-]', '', 'g')) AS BIGINT) AS n_punct,
       |  ROUND(LEAST(GREATEST(
       |    LEAST(len($duckToks) / 64.0, 1.0) * 0.5
       |    + LEAST(($stops * 1.0 / len($duckToks)) * 5.0, 1.0) * 0.4
       |    + (1.0 - LEAST(((length(text) - length(regexp_replace(text, '[.,!?;:()-]', '', 'g'))) * 1.0
       |         / GREATEST(length(text), 1)) * 10.0, 1.0)) * 0.1,
       |    0.0), 1.0), 6) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ language ID
  def txtLangId(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // materialize the four marker scores through a projection boundary,
    // then argmax over plain columns — one codegen'd regexp_count per
    // language per row (the r2 shape inlined interpreted HOF score
    // expressions into every `when`/`greatest`, ~24 evals per row)
    val scored = d.select(col("doc_id") +:
      LangMarkers.map { case (lang, m) => markerCount(col("text"), m).as(s"s_$lang") }: _*)
    val pred = langIdFromScores(LangMarkers.map { case (lang, _) => lang -> col(s"s_$lang") })
    scored.select(pred.as("lang_pred"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang_pred"))
  }

  val txtLangIdSql: String = {
    val scoreExprs = LangMarkers.map { case (lang, markers) =>
      lang -> duckStopCount(duckToks, markers)
    }
    val best = s"GREATEST(${scoreExprs.map(_._2).mkString(", ")})"
    val cases = scoreExprs.map { case (lang, sc) =>
      s"WHEN $sc > 0 AND $sc = $best THEN '$lang'"
    }.mkString(" ")
    s"""SELECT lang_pred, COUNT(*) AS n_docs FROM (
       |  SELECT CASE $cases ELSE 'und' END AS lang_pred FROM documents
       |) GROUP BY lang_pred ORDER BY lang_pred""".stripMargin
  }

  // ------------------------------------------------------ fingerprinting
  def txtFingerprint(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    d.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  val txtFingerprintSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_tokens" -> (txtTokens _),
    "txt_quality" -> (txtQuality _),
    "txt_langid" -> (txtLangId _),
    "txt_fingerprint" -> (txtFingerprint _),
  )

  val oracles: Map[String, String] = Map(
    "txt_tokens" -> txtTokensSql,
    "txt_quality" -> txtQualitySql,
    "txt_langid" -> txtLangIdSql,
    "txt_fingerprint" -> txtFingerprintSql,
  )
}
