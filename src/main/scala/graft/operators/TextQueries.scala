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

  // ------------------------------------------------------ unigram entropy
  /** Token-unigram entropy per document (plus type-token ratio and a
    * normalized form): the distribution-shape quality signal that catches
    * gibberish (low entropy = few tokens repeated; high normalized entropy
    * = near-uniform). Each term's p·ln p contribution is cast to
    * DECIMAL(30,15) before summing — exact associative addition, so
    * Spark's partial-aggregation order and the oracle's sequential scan
    * agree (ln itself matches per-element; see q28/tfidf precedent).
    *
    * Scale: explode → map-combined (doc, term) counts → doc-level
    * aggregation joined on doc_id. Two map-combined shuffles, both keyed
    * by document — no skew beyond document size. */
  def txtEntropy(s: SparkSession, dir: String): DataFrame = {
    // tf feeds TWO branches (tot aggregation + join left side); without a
    // persist each branch re-runs the explode + count (txtTfidf precedent)
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = tf.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("types"))
    val p = col("cnt").cast("double") / col("n").cast("double")
    val out = tf.join(tot, Seq("doc_id"))
      .groupBy(col("doc_id"), col("n"), col("types"))
      .agg(sum((p * log(p)).cast("decimal(30,15)")).as("hsum"))
      .select(col("doc_id"),
        col("n").as("n_tokens"),
        col("types").as("n_types"),
        // types/n is a small-integer ratio that CAN land exactly on a .x5
        // rounding boundary (e.g. 1/640) where the engines' round() rules
        // diverge - use the floor(x*1e6+0.5) HALF_UP spelling (identical
        // IEEE op sequence both engines; see q14's bal_hundreds)
        (floor(col("types").cast("double") / col("n").cast("double") * 1e6 + 0.5) /
          1e6).as("ttr"),
        (round(-col("hsum").cast("double"), 6) + 0.0).as("entropy"),
        when(col("types") > 1,
          round(-col("hsum").cast("double") / log(col("types").cast("double")), 6) + 0.0)
          .otherwise(lit(0.0)).as("entropy_norm"))
      .orderBy(col("doc_id"))
      // one row per doc — materialize, then release the corpus-scale
      // (doc, term) cache instead of leaking it until clearCache
      .localCheckpoint()
    tf.unpersist()
    out
  }

  val txtEntropySql: String =
    """WITH terms AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS cnt FROM terms GROUP BY 1, 2
      |), tot AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS types
      |  FROM tf GROUP BY 1
      |), h AS (
      |  SELECT tf.doc_id, tot.n, tot.types,
      |    SUM(CAST((CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
      |      * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(30,15)))
      |      AS hsum
      |  FROM tf JOIN tot ON tf.doc_id = tot.doc_id
      |  GROUP BY 1, 2, 3
      |)
      |SELECT doc_id, n AS n_tokens, types AS n_types,
      |  FLOOR(CAST(types AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
      |    / 1000000.0 AS ttr,
      |  ROUND(-CAST(hsum AS DOUBLE), 6) + 0.0 AS entropy,
      |  CASE WHEN types > 1
      |    THEN ROUND(-CAST(hsum AS DOUBLE) / ln(CAST(types AS DOUBLE)), 6) + 0.0
      |    ELSE 0.0 END AS entropy_norm
      |FROM h ORDER BY doc_id""".stripMargin

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
    "txt_entropy" -> (txtEntropy _),
    "txt_fingerprint" -> (txtFingerprint _),
  )

  val oracles: Map[String, String] = Map(
    "txt_tokens" -> txtTokensSql,
    "txt_quality" -> txtQualitySql,
    "txt_langid" -> txtLangIdSql,
    "txt_entropy" -> txtEntropySql,
    "txt_fingerprint" -> txtFingerprintSql,
  )
}
