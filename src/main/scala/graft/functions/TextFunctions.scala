package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, quality signals, language-ID heuristic, and
  * document fingerprinting. All pure `functions._` compositions — codegen'd,
  * partition-local, no state, so they cost one map pass at any scale.
  */
object TextFunctions {

  /** Whitespace tokenizer (the oracle-parity baseline).
    *
    * Note on `\s`: Java regex `\s` includes vertical tab (\x0B) while the
    * oracle engine's RE2 `\s` does not — a latent tokenization divergence
    * on text containing VT. The generated corpora contain none (verified
    * per round); revisit with an explicit char class if the corpus ever
    * carries exotic whitespace. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword split: lowercase word pieces, digits, and punctuation
    * as separate tokens (regex approximation of a byte-pair pretokenizer). */
  def bpeTokens(text: Column): Column =
    // GPT-2-style pretokenizer shape: contractions, letter runs, digit runs,
    // punctuation runs.
    regexp_extract_all(text, lit("'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Word n-gram shingles (space-joined), empty array when too short.
    * 1-based indexing to mirror SQL `element_at`/DuckDB list indexing. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(typedlit(Seq.empty[String]))

  /** Punctuation character count (fixed class, oracle-safe: no quote chars). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:()-]", ""))).cast("long")

  def stopwordCount(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops.map(x => x: Any): _*))).cast("long")

  /** Whitespace-delimited marker-word count straight off the text — equal
    * by construction to `stopwordCount(tokens(text), words)` (a token
    * matches a marker iff the marker appears with whitespace or a string
    * boundary on both sides; the lookarounds consume nothing, so adjacent
    * occurrences like "a a a" all count). Unlike the higher-order `filter`
    * (CodegenFallback in Spark), `regexp_count` stays inside whole-stage
    * codegen, which matters when a query evaluates several marker sets per
    * row (language ID). Markers must be regex-literal words. */
  def markerCount(text: Column, words: Seq[String]): Column = {
    require(words.forall(_.matches("[A-Za-z]+")), "markers must be plain words")
    regexp_count(text, lit(words.mkString("(?<=^|\\s)(?:", "|", ")(?=$|\\s)")))
      .cast("long")
  }

  val EnglishStops: Seq[String] =
    Seq("the", "a", "an", "is", "are", "of", "to", "and", "in", "that", "it")

  /** Heuristic quality score in [0,1]: rewards mid-length docs, a healthy
    * stopword ratio, and low punctuation density (the classic C4-style
    * cheap filters, computable in one pass). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stopRatio = stopwordCount(toks, EnglishStops).cast("double") / nTok
    val punctRatio = punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    round(least(greatest(
      lenScore * lit(0.5) + least(stopRatio * lit(5.0), lit(1.0)) * lit(0.4) +
        (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.1),
      lit(0.0)), lit(1.0)), 6)
  }

  /** Marker-word language scores. Language ID by argmax with fixed priority
    * order (deterministic, oracle-expressible). Real pipelines swap in a
    * fastText-style model at the same call site. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "es", "y", "las"))

  def langScores(toks: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, markers) =>
      lang -> stopwordCount(toks, markers)
    }

  /** Argmax with fixed priority order over pre-materialized score COLUMNS.
    * Callers must compute the scores through a projection boundary first —
    * inlining score expressions here duplicates each one ~6× (once per
    * `when` guard plus once inside every `greatest`), which multiplied to
    * ~24 full text scans per row in the r2 shape. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc > 0 && sc === best, lit(lang)).otherwise(acc)
    }
  }

  def langId(text: Column): Column =
    langIdFromScores(LangMarkers.map { case (lang, markers) =>
      lang -> markerCount(text, markers)
    })

  /** Normalized-content fingerprint: md5 over lowercased,
    * whitespace-collapsed text. Two docs with the same fingerprint are
    * exact duplicates modulo case/whitespace. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))))
}
