package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-composition operators for training-data pipelines: deterministic
  * rate-based stratified sampling, fixed-size per-stratum sampling, and
  * source-mixture weighting. Sampling decisions are pure functions of a
  * stable document hash — replayable across runs, engines, and retries
  * (the property a 100 TB pipeline needs so a re-run of one partition
  * makes the same keep/drop calls), never `rand()`.
  */
object SamplingOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadFan(s, dir, "documents", "doc_id")

  /** md5(doc_id) hex digest — this file's shared entropy source. The
    * digest's 32 hex chars are budgeted in DISJOINT 1-based ranges so no
    * two operators (or ds_split in CurationOps) ever consume correlated
    * bits: char 1 = ds_split bucket, 2..5 = sampStratified rate bits,
    * 6..17 = sampWeighted 48-bit uniform, 18..32 = sampFixed order key.
    * The budget is FULL — an operator needing more entropy takes a fresh
    * SALTED digest (md5 of "doc_id:<salt>", independent of every range by
    * avalanche) rather than re-reading someone's chars; see
    * [[sampBySource]]. Lowercase-hex string comparison is numeric
    * comparison (fixed width, '0'<'9'<'a'<'f'), and md5 is portable: any
    * engine produces the identical digest for the identical string. */
  private def docMd5 = md5(col("doc_id").cast("string").cast("binary"))
  private def hexRange(start: Int, len: Int) = substring(docMd5, start, len)
  private def duckHex(start: Int, len: Int) =
    s"substr(md5(CAST(doc_id AS VARCHAR)), $start, $len)"
  /** Fresh per-operator entropy when the shared digest is spent: the salt
    * makes the digest independent of docMd5 and of any other salt. */
  private def saltedHex(salt: String, start: Int, len: Int) =
    substring(md5(concat(col("doc_id").cast("string"), lit(":" + salt))
      .cast("binary")), start, len)
  private def duckSaltedHex(salt: String, start: Int, len: Int) =
    s"substr(md5(CAST(doc_id AS VARCHAR) || ':$salt'), $start, $len)"
  private val StratStart = 2; private val StratLen = 4
  private val WeightStart = 6; private val WeightLen = 12
  private val FixedStart = 18; private val FixedLen = 15

  // ------------------------------------------------ rate-based stratified
  /** Language-stratified sampling at per-stratum keep rates (en 1.0,
    * de/fr/es 0.5, zh 0.25 — the up/down-weighting a multilingual corpus
    * mix applies). Reports per-language total, kept, and achieved rate.
    *
    * Scale: the keep decision is one map-side hash expression; the report
    * is one map-combined count shuffle of |langs| groups. Selecting the
    * kept rows instead of counting them is the same plan minus the agg. */
  def sampStratified(s: SparkSession, dir: String): DataFrame = {
    val kept = when(col("lang") === "en", lit(true))
      .when(col("lang").isin("de", "fr", "es"),
        hexRange(StratStart, StratLen) < "8000")
      .otherwise(hexRange(StratStart, StratLen) < "4000")
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
      .select(col("lang"), col("n_total"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_total").cast("double"), 6)
          .as("rate"))
      .orderBy(col("lang"))
  }

  val sampStratifiedSql: String =
    s"""WITH k AS (
       |  SELECT lang,
       |    CASE WHEN lang = 'en' THEN TRUE
       |         WHEN lang IN ('de', 'fr', 'es') THEN ${duckHex(StratStart, StratLen)} < '8000'
       |         ELSE ${duckHex(StratStart, StratLen)} < '4000' END AS kept
       |  FROM documents
       |)
       |SELECT lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  ROUND(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS rate
       |FROM k GROUP BY lang ORDER BY lang""".stripMargin

  // --------------------------------------------- fixed-size per-stratum
  /** Deterministic fixed-size sample: the first `n` documents per source in
    * md5-hash order (doc_id tiebreak) — a content-independent "random but
    * replayable" pick, the batch analogue of reservoir sampling.
    *
    * Scale: one shuffle partitioned by source; per-stratum state is the
    * top-n heap, not the stratum. With few strata and huge rows-per-stratum
    * the window sort is the bottleneck — the two-phase salted top-k in
    * `SimilarityOps.topKPerKey` is the drop-in replacement at that shape
    * (same output, one extra shuffle of n*salt rows). */
  def sampFixed(s: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .select(col("source"), col("doc_id"), hexRange(FixedStart, FixedLen).as("h"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("source"), col("doc_id"), col("rank").cast("long").as("rank"))
      .orderBy(col("source"), col("rank"))
  }

  val sampFixedSql: String =
    s"""SELECT source, doc_id,
       |  CAST(ROW_NUMBER() OVER (
       |    PARTITION BY source
       |    ORDER BY ${duckHex(FixedStart, FixedLen)}, doc_id) AS BIGINT)
       |    AS rank
       |FROM documents
       |QUALIFY rank <= 5
       |ORDER BY source, rank""".stripMargin

  // --------------------------------------------- weighted (A-Res) sampling
  /** Deterministic weighted sampling without replacement, per stratum
    * (Efraimidis–Spirakis A-Res via the exponential race): each doc gets
    * priority −ln(u)/w with u a 48-bit hash-uniform and w = n_chars, and
    * the n smallest priorities per source win — P(selection) ∝ weight,
    * replayable because u comes from md5(doc_id), never rand().
    * 0x-prefixed hex parses as an integer on both engines; 48 bits keep
    * the value exact in a double.
    *
    * Scale: same one-shuffle-per-stratum shape as [[sampFixed]] (and the
    * same two-phase salted top-k escape hatch for huge strata); the
    * priority is a map-side expression. */
  def sampWeighted(s: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val u = (conv(hexRange(WeightStart, WeightLen), 16, 10).cast("double") + 0.5) /
      lit(281474976710656.0)
    val w = Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
    docs(s, dir)
      // zero-weight items are unsampleable BY DEFINITION in A-Res
      // (P ∝ w = 0): excluded from the frame, not given an ∞ priority —
      // ANSI Spark makes 1/0 a runtime error, and the two engines
      // disagree on ∞ ordering edge cases; the explicit filter pins one
      // semantics on both sides (found by the r15 degenerate sweep's
      // empty documents)
      .filter(col("n_chars") > 0)
      .select(col("source"), col("doc_id"),
        (-log(u) / col("n_chars").cast("double")).as("pri"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("source"), col("doc_id"), col("rank").cast("long").as("rank"))
      .orderBy(col("source"), col("rank"))
  }

  val sampWeightedSql: String =
    s"""WITH p AS (
       |  SELECT source, doc_id,
       |    -ln((CAST(CAST('0x' || ${duckHex(WeightStart, WeightLen)} AS BIGINT)
       |         AS DOUBLE) + 0.5) / 281474976710656.0)
       |      / CAST(n_chars AS DOUBLE) AS pri
       |  FROM documents WHERE n_chars > 0
       |)
       |SELECT source, doc_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS BIGINT)
       |    AS rank
       |FROM p QUALIFY rank <= 5 ORDER BY source, rank""".stripMargin

  // ------------------------------------------------- source mix weighting
  /** Per-source mixture statistics for a token-budgeted training mix:
    * token share, the up/down-sampling weight that would flatten the mix to
    * uniform-over-sources, and the number of epochs of each source a 1M-
    * token uniform budget implies (>1 = the source repeats, the standard
    * "epochs per dataset" knob in LLM data recipes).
    *
    * Scale: one map-combined count/sum shuffle of |sources| groups; the
    * totals cross as a broadcast scalar row, never a driver constant. */
  def mixWeights(s: SparkSession, dir: String): DataFrame = {
    val perSrc = docs(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    val share = col("n_tokens").cast("double") / col("tot_tokens").cast("double")
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(share, 6).as("token_share"),
        round((lit(1.0) / col("n_sources").cast("double")) / share, 6)
          .as("mix_weight"),
        round((lit(1000000.0) / col("n_sources").cast("double"))
          / col("n_tokens").cast("double"), 6).as("epochs_1m"))
      .orderBy(col("source"))
  }

  val mixWeightsSql: String =
    """WITH per_src AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
      |      AS n_tokens
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_sources
      |  FROM per_src
      |)
      |SELECT source, n_docs, n_tokens,
      |  ROUND(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE), 6)
      |    AS token_share,
      |  ROUND((1.0 / CAST(n_sources AS DOUBLE))
      |    / (CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)), 6)
      |    AS mix_weight,
      |  ROUND((1000000.0 / CAST(n_sources AS DOUBLE)) / CAST(n_tokens AS DOUBLE), 6)
      |    AS epochs_1m
      |FROM per_src CROSS JOIN tot ORDER BY source""".stripMargin

  // --------------------------------- excess-loss-proportional mixing
  /** DoReMi-shaped domain reweighting (Xie et al. 2023) with a unigram LM
    * standing in for the proxy model: train the unigram model ON the whole
    * corpus, score every document's average NLL against it, and upweight
    * the sources whose EXCESS loss over the easiest source is largest —
    * the domains the current model explains worst, i.e. where the next
    * token of training signal buys the most. `weight = (1−α) ·
    * excess/Σexcess + α/|S|` with uniform smoothing α = 0.2 (DoReMi's
    * mixture-with-uniform step, so no domain starves); a degenerate corpus
    * where every source scores identically falls back to uniform. Emits
    * (source, n_docs, mean_nll, excess, weight).
    *
    * Determinism: per-doc ll is the DECIMAL(30,15)-exact token sum (the
    * [[TextQueries.txtUnigramPpl]] discipline), per-source means and the
    * Σexcess re-enter DECIMAL before summing — no step depends on float
    * addition order.
    *
    * Scale: (doc, term) tf is map-combined; the unigram table is
    * vocabulary-sized; per-source stats are |S| rows of model state
    * crossed back as broadcasts. Nothing after the tf shuffle touches
    * corpus-sized data. */
  def mixDoremi(s: SparkSession, dir: String, alpha: Double = 0.2): DataFrame = {
    val dec = "decimal(30,15)"
    val tf = docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val total = tf.agg(sum(col("tf")).as("total"))
    val perDoc = tf
      .join(uni, Seq("term"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("source"), col("tf"),
        log(col("cf").cast("double") / col("total").cast("double")).as("lnp"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum((col("tf").cast("double") * col("lnp")).cast(dec)).as("ll"))
      .select(col("source"),
        (-col("ll").cast("double") / col("n_tokens").cast("double")).as("avg_nll"))
    val perSrc = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("avg_nll").cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("mean_nll"))
    val withMin = perSrc
      .crossJoin(broadcast(perSrc.agg(min(col("mean_nll")).as("mn"))))
      .withColumn("excess", col("mean_nll") - col("mn"))
    val tot2 = withMin.agg(sum(col("excess").cast(dec)).as("se"),
      count(lit(1)).as("ns"))
    val report = withMin.crossJoin(broadcast(tot2))
      .select(col("source"), col("n_docs"),
        (round(col("mean_nll"), 6) + 0.0).as("mean_nll"),
        (round(col("excess"), 6) + 0.0).as("excess"),
        (round(when(col("se").cast("double") > 0.0,
          lit(1.0 - alpha) * col("excess") / col("se").cast("double") +
            lit(alpha) / col("ns").cast("double"))
          .otherwise(lit(1.0) / col("ns").cast("double")), 6) + 0.0).as("weight"))
      .orderBy(col("source"))
      .localCheckpoint()
    tf.unpersist()
    report
  }

  val mixDoremiSql: String =
    """WITH terms AS (
      |  SELECT doc_id, source,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, source, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2, 3
      |), uni AS (
      |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(tf) AS BIGINT) AS total FROM tf
      |), per_doc AS (
      |  SELECT tf.doc_id, tf.source,
      |    -CAST(SUM(CAST(CAST(tf.tf AS DOUBLE)
      |        * ln(CAST(cf AS DOUBLE) / CAST(total AS DOUBLE)) AS DECIMAL(30,15)))
      |      AS DOUBLE) / CAST(SUM(tf.tf) AS DOUBLE) AS avg_nll
      |  FROM tf JOIN uni ON tf.term = uni.term CROSS JOIN tot
      |  GROUP BY tf.doc_id, tf.source
      |), per_src AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CAST(avg_nll AS DECIMAL(30,15))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE) AS mean_nll
      |  FROM per_doc GROUP BY source
      |), mn AS (
      |  SELECT MIN(mean_nll) AS mn FROM per_src
      |), ex AS (
      |  SELECT source, n_docs, mean_nll, mean_nll - mn AS excess
      |  FROM per_src CROSS JOIN mn
      |), se AS (
      |  SELECT CAST(SUM(CAST(excess AS DECIMAL(30,15))) AS DOUBLE) AS se,
      |    CAST(COUNT(*) AS BIGINT) AS ns
      |  FROM ex
      |)
      |SELECT source, n_docs,
      |  ROUND(mean_nll, 6) + 0.0 AS mean_nll,
      |  ROUND(excess, 6) + 0.0 AS excess,
      |  ROUND(CASE WHEN se > 0.0
      |    THEN 0.8 * excess / se + 0.2 / CAST(ns AS DOUBLE)
      |    ELSE 1.0 / CAST(ns AS DOUBLE) END, 6) + 0.0 AS weight
      |FROM ex CROSS JOIN se ORDER BY source""".stripMargin

  // ------------------------------------------ annealed mixture schedule
  /** Annealed data schedule: per-epoch source weights interpolating
    * linearly from the corpus's NATURAL token shares (epoch 0) to the
    * UNIFORM distribution (last epoch) — the "start on the easy natural
    * mix, end flat so tail sources get airtime late in training" schedule
    * (the linear special case of temperature annealing τ: 1 → 0; a
    * production run swaps the uniform endpoint for any target mix, e.g.
    * [[mixDoremi]]'s). Emits (epoch, source, weight), epochs 0..3.
    *
    * Determinism: shares derive from integer token sums; the
    * interpolation is one double expression per row, identical both
    * engines. Scale: |sources| model rows crossed with an epochs-range
    * literal — everything after the token-count aggregation is model
    * state. */
  def mixAnneal(s: SparkSession, dir: String, epochs: Int = 4): DataFrame = {
    val perSrc = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(tokenCount(col("text"))).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("tot"),
      count(lit(1)).as("ns"))
    val t = col("epoch").cast("double") / lit((epochs - 1).toDouble)
    perSrc.crossJoin(broadcast(tot))
      .crossJoin(s.range(epochs.toLong).toDF("epoch"))
      .select(col("epoch"), col("source"),
        (round((lit(1.0) - t) *
            (col("n_tokens").cast("double") / col("tot").cast("double"))
          + t * (lit(1.0) / col("ns").cast("double")), 6) + 0.0).as("weight"))
      .orderBy(col("epoch"), col("source"))
  }

  val mixAnnealSql: String =
    """WITH per_src AS (
      |  SELECT source,
      |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
      |      AS n_tokens
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
      |    CAST(COUNT(*) AS BIGINT) AS ns
      |  FROM per_src
      |)
      |SELECT e.epoch, source,
      |  ROUND((1.0 - CAST(e.epoch AS DOUBLE) / 3.0)
      |      * (CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE))
      |    + (CAST(e.epoch AS DOUBLE) / 3.0) * (1.0 / CAST(ns AS DOUBLE)), 6)
      |    + 0.0 AS weight
      |FROM per_src CROSS JOIN tot CROSS JOIN range(4) e(epoch)
      |ORDER BY epoch, source""".stripMargin

  // --------------------------------------- temperature-scaled mixing
  /** Temperature sampling over source token shares — the multilingual /
    * multi-source rebalancing rule (share^τ / Σ share^τ): τ=1 keeps the
    * natural distribution, τ→0 flattens to uniform, upweighting small
    * sources. Written as exp(τ·ln p) on BOTH engines (one libm op sequence
    * — `pow` implementations may differ in the last ulp), and the
    * normalizer sums through DECIMAL(30,15) so partial-aggregation order
    * can't move it.
    *
    * Scale: one map-combined aggregation over the corpus, then model-sized
    * (per-source) arithmetic with a broadcast scalar normalizer. */
  def sampTemperature(s: SparkSession, dir: String): DataFrame = {
    val perSrc = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(tokenCount(col("text"))).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("tot_tokens"))
    def pTau(tau: Double): Column =
      // p^tau as exp(tau·ln p), then ONE deterministic rounding to
      // DECIMAL(30,15) — the same value feeds the numerator and the
      // normalizer sum on both engines
      exp(lit(tau) * log(col("n_tokens").cast("double") /
        col("tot_tokens").cast("double"))).cast("decimal(30,15)")
    val powed = perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tot_tokens").cast("double"))
          .as("share"),
        pTau(0.7).as("p07"), pTau(0.5).as("p05"))
    val z = powed.agg(sum(col("p07")).as("z07"), sum(col("p05")).as("z05"))
    powed.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"),
        round(col("share"), 6).as("token_share"),
        (round(col("p07").cast("double") / col("z07").cast("double"), 6) + 0.0)
          .as("w_tau07"),
        (round(col("p05").cast("double") / col("z05").cast("double"), 6) + 0.0)
          .as("w_tau05"))
      .orderBy(col("source"))
  }

  val sampTemperatureSql: String =
    """WITH per_src AS (
      |  SELECT source,
      |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
      |      AS n_tokens
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM per_src
      |), powed AS (
      |  SELECT source, n_tokens,
      |    CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS share,
      |    CAST(exp(0.7 * ln(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)))
      |      AS DECIMAL(30,15)) AS p07,
      |    CAST(exp(0.5 * ln(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)))
      |      AS DECIMAL(30,15)) AS p05
      |  FROM per_src CROSS JOIN tot
      |), z AS (
      |  SELECT SUM(p07) AS z07, SUM(p05) AS z05 FROM powed
      |)
      |SELECT source, n_tokens,
      |  ROUND(share, 6) AS token_share,
      |  ROUND(CAST(p07 AS DOUBLE) / CAST(z07 AS DOUBLE), 6) + 0.0 AS w_tau07,
      |  ROUND(CAST(p05 AS DOUBLE) / CAST(z05 AS DOUBLE), 6) + 0.0 AS w_tau05
      |FROM powed CROSS JOIN z ORDER BY source""".stripMargin

  // ------------------------------------ temperature weights → resample
  /** The step that closes the mixing loop: APPLY the τ=0.7 temperature
    * weights ([[sampTemperature]]) to the corpus — per-source doc targets
    * `w_s · (budgetFrac · N)`, keep rates `min(1, target/n_s)`, and a
    * hash-gated per-doc selection, so the resampled corpus materializes
    * deterministically (same md5-bucket machinery as the other samplers:
    * replayable across runs, engines, and partitionings — no rand()).
    * Reports per source: docs, rate, kept (expected kept ≈ rate·n with
    * binomial noise from the hash buckets; both engines count the SAME
    * docs, so the oracle matches exactly).
    *
    * Scale: the weight table is model-sized (per-source) and crosses as a
    * broadcast join; the per-doc gate is one map-side compare; the report
    * is one map-combined rollup. */
  def sampBySource(s: SparkSession, dir: String,
      tau: Double = 0.7, budgetFrac: Double = 0.3): DataFrame = {
    val d = docs(s, dir)
    val perSrc = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src_docs"),
        sum(tokenCount(col("text"))).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("n_src_docs")).as("tot_docs"))
    val powed = perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_src_docs"), col("tot_docs"),
        exp(lit(tau) * log(col("n_tokens").cast("double") /
          col("tot_tokens").cast("double"))).cast("decimal(30,15)").as("p"))
    val z = powed.agg(sum(col("p")).as("z"))
    val rates = powed.crossJoin(broadcast(z))
      .select(col("source"),
        least(lit(1.0),
          (col("p").cast("double") / col("z").cast("double")) *
            (lit(budgetFrac) * col("tot_docs").cast("double")) /
            col("n_src_docs").cast("double")).as("rate"))
    // SALTED digest — the shared md5's ranges are all spoken for, and
    // reusing sampStratified's chars would correlate the two samplers'
    // keep decisions (a composed pipeline would select a biased subset)
    val u = (conv(saltedHex("bysource", 1, 4), 16, 10).cast("double") + 0.5) /
      65536.0
    d.select(col("source"), u.as("u"))
      .join(broadcast(rates), Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (round(max(col("rate")), 6) + 0.0).as("rate"),
        sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  val sampBySourceSql: String =
    s"""WITH per_src AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src_docs,
       |    CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
       |      AS n_tokens
       |  FROM documents GROUP BY source
       |), tot AS (
       |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
       |    CAST(SUM(n_src_docs) AS BIGINT) AS tot_docs
       |  FROM per_src
       |), powed AS (
       |  SELECT source, n_src_docs, tot_docs,
       |    CAST(exp(0.7 * ln(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)))
       |      AS DECIMAL(30,15)) AS p
       |  FROM per_src CROSS JOIN tot
       |), z AS (
       |  SELECT SUM(p) AS z FROM powed
       |), rates AS (
       |  SELECT source,
       |    LEAST(1.0,
       |      (CAST(p AS DOUBLE) / CAST(z AS DOUBLE))
       |        * (0.3 * CAST(tot_docs AS DOUBLE)) / CAST(n_src_docs AS DOUBLE)) AS rate
       |  FROM powed CROSS JOIN z
       |), gated AS (
       |  SELECT d.source,
       |    (CAST(CAST('0x' || ${duckSaltedHex("bysource", 1, 4)} AS BIGINT) AS DOUBLE)
       |      + 0.5) / 65536.0 AS u,
       |    rate
       |  FROM documents d JOIN rates ON d.source = rates.source
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  ROUND(MAX(rate), 6) + 0.0 AS rate,
       |  CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM gated GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------- budget-constrained assembly
  /** Token-budget corpus assembly — the step that turns mixture weights
    * into an actual training set: give every source an equal slice of a
    * global token budget (`frac` of the corpus, flattened across sources —
    * [[mixWeights]]' uniform-mix posture) and fill each slice GREEDILY by
    * document quality (stopword ratio, the classic natural-text signal,
    * doc_id tiebreak) until the slice overflows; the crossing document is
    * kept, so every non-exhausted source lands at or just past its budget.
    * Reports per source what the assembly kept vs. its budget.
    *
    * Scale: one map-side projection per doc (token array materialized
    * before the stopword fold — the re-split lesson); the greedy fill is a
    * per-source ordered cumulative sum — source-sized sort partitions (the
    * txt_ppl_buckets posture: sources are few and large; a skewed source
    * sorts in parallel by range partitioning within the window shuffle);
    * the budget scalar crosses as a broadcast. */
  def mixBudget(s: SparkSession, dir: String, frac: Double = 0.3): DataFrame = {
    val scored = docs(s, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_tokens"),
        round(stopwordCount(col("toks"), EnglishStops).cast("double") /
          size(col("toks")).cast("double"), 6).as("q"))
    val perSrc = scored.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val tot = perSrc.agg(sum(col("src_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.crossJoin(broadcast(tot))
      .withColumn("budget_tokens",
        floor((lit(frac) * col("tot_tokens").cast("double")) /
          col("n_sources").cast("double")).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") - col("n_tokens") < col("budget_tokens"))
      .groupBy(col("source"))
      .agg(max(col("budget_tokens")).as("budget_tokens"),
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("n_tokens_kept"))
      .orderBy(col("source"))
  }

  val mixBudgetSql: String = {
    val stops = graft.functions.TextFunctions.EnglishStops
      .map("'" + _ + "'").mkString(",")
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
       |      AS n_tokens,
       |    ROUND(CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |        t -> t IN ($stops))) AS DOUBLE)
       |      / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE),
       |      6) AS q
       |  FROM documents
       |), tot AS (
       |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
       |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |  FROM scored
       |), cum AS (
       |  SELECT scored.*,
       |    CAST(FLOOR((0.3 * CAST(tot_tokens AS DOUBLE))
       |      / CAST(n_sources AS DOUBLE)) AS BIGINT) AS budget_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM scored CROSS JOIN tot
       |)
       |SELECT source, MAX(budget_tokens) AS budget_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_kept
       |FROM cum WHERE cum - n_tokens < budget_tokens
       |GROUP BY source ORDER BY source""".stripMargin
  }

  // ------------------------------------- epoch-aware repeat-factor plan
  /** Epoch-aware mixture plan — the step after weighting and before
    * assembly: given a per-source QUALITY-proportional target mixture
    * (mean stopword ratio, the natural-text signal [[mixBudget]] ranks
    * by; token-share temperature weights are the [[sampTemperature]]
    * lane) and a global token budget of `budgetMult` × the corpus, decide
    * how many EPOCHS (repeat passes) of each source the training set
    * takes. Small-but-high-quality sources get upweighted until the
    * repetition cap (`maxEpochs`, the "repeating data degrades quality"
    * guard every pretraining mix applies) binds; the plan reports the
    * capped epoch count, the tokens it actually yields, and the deficit
    * the cap left unfilled — the number the curator re-allocates.
    *
    * Determinism: per-source quality is rounded to 6dp then summed as
    * DECIMAL (exact, order-free — the entropy discipline); every later
    * step is identical IEEE double arithmetic on identical operands in
    * both engines, so the plan hash-matches the oracle exactly.
    *
    * Scale: one map-combined shuffle of |sources| groups; the totals
    * cross back as a broadcast scalar. The plan frame is |sources| rows —
    * model-sized at any corpus size. */
  def mixEpochs(s: SparkSession, dir: String, budgetMult: Double = 2.0,
      maxEpochs: Double = 4.0): DataFrame = {
    val perSrc = docs(s, dir)
      .select(col("source"), tokens(col("text")).as("toks"))
      .select(col("source"), size(col("toks")).cast("long").as("n_tokens"),
        stopwordCount(col("toks"), EnglishStops).as("n_stop"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("avail_tokens"),
        sum(col("n_stop")).as("src_stop"))
      .withColumn("q",
        round(col("src_stop").cast("double") /
          col("avail_tokens").cast("double"), 6).cast("decimal(30,15)"))
    val tot = perSrc.agg(sum(col("avail_tokens")).as("tot_tokens"),
      sum(col("q")).as("z"))
    val w = col("q").cast("double") / col("z").cast("double")
    val desired = lit(budgetMult) * col("tot_tokens").cast("double") * w
    val epochs =
      least(lit(maxEpochs), desired / col("avail_tokens").cast("double"))
    val eff =
      floor(epochs * col("avail_tokens").cast("double")).cast("long")
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("avail_tokens"),
        round(w, 6).as("weight"),
        round(epochs, 6).as("epochs"),
        eff.as("eff_tokens"),
        greatest(lit(0L), ceil(desired).cast("long") - eff)
          .as("deficit_tokens"))
      .orderBy(col("source"))
  }

  val mixEpochsSql: String = {
    val stops = graft.functions.TextFunctions.EnglishStops
      .map("'" + _ + "'").mkString(",")
    val wExpr = "(CAST(q AS DOUBLE) / CAST(z AS DOUBLE))"
    val desired = s"(2.0 * CAST(tot_tokens AS DOUBLE) * $wExpr)"
    val epochs =
      s"LEAST(4.0, $desired / CAST(avail_tokens AS DOUBLE))"
    val eff =
      s"CAST(FLOOR($epochs * CAST(avail_tokens AS DOUBLE)) AS BIGINT)"
    s"""WITH per_src AS (
       |  SELECT source,
       |    CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
       |      AS avail_tokens,
       |    CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |        t -> t IN ($stops)))) AS BIGINT) AS src_stop
       |  FROM documents GROUP BY source
       |), srcq AS (
       |  SELECT source, avail_tokens,
       |    CAST(ROUND(CAST(src_stop AS DOUBLE) / CAST(avail_tokens AS DOUBLE),
       |      6) AS DECIMAL(30,15)) AS q
       |  FROM per_src
       |), tot AS (
       |  SELECT CAST(SUM(avail_tokens) AS BIGINT) AS tot_tokens, SUM(q) AS z
       |  FROM srcq
       |)
       |SELECT source, avail_tokens,
       |  ROUND($wExpr, 6) AS weight,
       |  ROUND($epochs, 6) AS epochs,
       |  $eff AS eff_tokens,
       |  GREATEST(CAST(0 AS BIGINT),
       |    CAST(CEIL($desired) AS BIGINT) - $eff) AS deficit_tokens
       |FROM srcq CROSS JOIN tot ORDER BY source""".stripMargin
  }

  // ----------------------------------------- DSIR importance weighting
  /** Data Selection via Importance Resampling (Xie et al. 2023), unigram
    * form: treat one source's documents as the TARGET distribution (the
    * high-quality slice a curator wants more of), the rest as RAW, fit
    * add-1-smoothed unigram models to both over the joint vocabulary, and
    * score every document by its log importance weight
    * `Σ_t tf(t) · (ln p_tgt(t) − ln p_raw(t))` — documents whose token mix
    * looks target-like score high. Reports the top-N candidates; the
    * resample step itself is [[sampWeighted]]'s hash-Gumbel machinery
    * applied to these weights (DSIR samples ∝ exp(log_w), which is exactly
    * A-Res on `w = exp(log_w)` — composition, not new machinery). DSIR's
    * full form hashes n-grams into a bounded feature space; with words as
    * the features the shape is identical, and swapping `term` for
    * `xxhash64(term) % B` bounds model state at any corpus size.
    *
    * Per-token contributions are cast to DECIMAL(30,15) before the per-doc
    * sum (exact, order-free — the entropy/BM25 discipline); ln evaluates
    * per element identically on both engines.
    *
    * Scale: (doc, term) tf is map-combined; both unigram models come from
    * ONE conditional-sum pass over tf (never a second corpus scan); the
    * count table is vocabulary-sized (shuffle join keyed by term,
    * broadcastable when the vocab fits — Spark picks that automatically);
    * totals cross as a broadcast scalar; the top-N is a k-row global
    * sort. */
  def sampDsir(s: SparkSession, dir: String, target: String = "src0",
      topN: Int = 100): DataFrame = {
    val tf = docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnts = tf.groupBy(col("term")).agg(
      sum(when(col("source") === target, col("tf")).otherwise(lit(0L)))
        .as("c_tgt"),
      sum(when(col("source") =!= target, col("tf")).otherwise(lit(0L)))
        .as("c_raw"))
    val tot = cnts.agg(sum(col("c_tgt")).as("n_tgt"),
      sum(col("c_raw")).as("n_raw"), count(lit(1)).as("v"))
    val llr =
      log((col("c_tgt") + 1).cast("double") /
          (col("n_tgt") + col("v")).cast("double")) -
      log((col("c_raw") + 1).cast("double") /
          (col("n_raw") + col("v")).cast("double"))
    val report = tf
      .join(cnts, Seq("term"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("tf"), llr.as("llr"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum((col("tf").cast("double") * col("llr")).cast("decimal(30,15)"))
          .as("w"))
      .select(col("doc_id"), col("n_tokens"),
        (round(col("w").cast("double"), 6) + 0.0).as("log_w"))
      .orderBy(col("log_w").desc, col("doc_id"))
      .limit(topN)
      .localCheckpoint()
    tf.unpersist()
    report
  }

  /** [[sampDsir]]'s hashed form — DSIR as published: terms hash into a
    * FIXED feature space of `b` buckets, so the model is `b` doubles of
    * llr regardless of corpus size (the property that lets the same model
    * score an unbounded stream). Training is one map-combined count pass;
    * the returned array is model state (the centroid-collect precedent:
    * k-row, never corpus-row). */
  def dsirLlrBuckets(s: SparkSession, dir: String, target: String = "src0",
      b: Int = 4096): Array[Double] = {
    val counts = docs(s, dir)
      .select(col("source"), explode(tokens(lower(col("text")))).as("term"))
      .select(col("source"),
        pmod(xxhash64(col("term")), lit(b.toLong)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("source") === target, 1L).otherwise(0L)).as("c_tgt"),
        sum(when(col("source") =!= target, 1L).otherwise(0L)).as("c_raw"))
      .collect() // ≤ b rows — model state, not corpus rows
    val cTgt = Array.fill(b)(0L)
    val cRaw = Array.fill(b)(0L)
    counts.foreach { r =>
      val i = r.getLong(0).toInt
      cTgt(i) = r.getLong(1); cRaw(i) = r.getLong(2)
    }
    val nTgt = cTgt.sum.toDouble
    val nRaw = cRaw.sum.toDouble
    Array.tabulate(b)(i =>
      math.log((cTgt(i) + 1.0) / (nTgt + b)) -
        math.log((cRaw(i) + 1.0) / (nRaw + b)))
  }

  /** Score any doc frame against a trained bucket model: ONE stateless
    * projection (token array materialized first — the txtBoilerplate
    * re-split lesson; per-token bucket lookup folds inside the row). No
    * explode, no shuffle, no state — identical on batch and stream, which
    * is what makes it [[graft.streaming.StreamOps.streamingDsirScore]]. */
  def dsirScore(d: DataFrame, buckets: Array[Double]): DataFrame = {
    val b = buckets.length
    val lut = typedlit(buckets.toSeq)
    d.select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (round(aggregate(col("toks"), lit(0.0), (acc, t) =>
          acc + element_at(lut,
            (pmod(xxhash64(t), lit(b.toLong)) + lit(1L)).cast("int"))), 6)
          + 0.0).as("log_w"))
  }

  val sampDsirSql: String =
    """WITH terms AS (
      |  SELECT doc_id, source,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, source, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2, 3
      |), cnts AS (
      |  SELECT term,
      |    SUM(CASE WHEN source = 'src0' THEN tf ELSE 0 END) AS c_tgt,
      |    SUM(CASE WHEN source <> 'src0' THEN tf ELSE 0 END) AS c_raw
      |  FROM tf GROUP BY 1
      |), tot AS (
      |  SELECT SUM(c_tgt) AS n_tgt, SUM(c_raw) AS n_raw, COUNT(*) AS v FROM cnts
      |), llr AS (
      |  SELECT term,
      |    ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(n_tgt + v AS DOUBLE))
      |      - ln(CAST(c_raw + 1 AS DOUBLE) / CAST(n_raw + v AS DOUBLE)) AS llr
      |  FROM cnts CROSS JOIN tot
      |), scored AS (
      |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
      |    SUM(CAST(CAST(tf.tf AS DOUBLE) * llr AS DECIMAL(30,15))) AS w
      |  FROM tf JOIN llr USING (term) GROUP BY 1
      |)
      |SELECT doc_id, n_tokens, ROUND(CAST(w AS DOUBLE), 6) + 0.0 AS log_w
      |FROM scored ORDER BY log_w DESC, doc_id LIMIT 100""".stripMargin

  // ------------------------------------- deterministic training-order shuffle
  /** Deterministic global shuffle — the training-order permutation every
    * pretraining run applies before packing: rank documents by
    * (md5(doc_id), doc_id). Hash-derived like every sampler here, so the
    * permutation is replayable from the ids alone (re-run, resume, and
    * audit all see the same order) and batching-invariant — no `rand()`,
    * no seed state.
    *
    * Scale: global ROW_NUMBER over one ordered partition is the classic
    * driver-shaped bottleneck, so the rank is TWO-PHASE (the txt_pack
    * prefix-sum discipline): range-partition by the hash key (range
    * partitioning preserves the global (hkey, doc_id) order across
    * partitions), rank locally in parallel, then add per-partition offsets
    * — the driver sees `parts` counts, never rows. The partitioned frame
    * persists so both phases read one pid assignment; report
    * materialized, cache released. */
  def dsShuffle(s: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    val keyed = docs(s, dir)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("hkey"))
      .repartitionByRange(parts, col("hkey"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = keyed.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid + 1, acc + n)
    }.init.zip(totals).map { case ((_, base), (pid, _)) => (pid, base) }
    val baseDf = s.createDataFrame(bases.toSeq).toDF("pid", "base")
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("hkey"), col("doc_id"))
    val report = keyed
      .withColumn("local_rank", row_number().over(wLocal))
      .join(broadcast(baseDf), Seq("pid"))
      .select(col("doc_id"), col("hkey"),
        (col("base") + col("local_rank")).cast("long").as("shuffle_rank"))
      .orderBy(col("doc_id"))
      .localCheckpoint()
    keyed.unpersist()
    report
  }

  val dsShuffleSql: String =
    """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hkey,
      |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |    AS BIGINT) AS shuffle_rank
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------- soft-dedup weighting
  /** Soft deduplication: keep every copy but weight each document by the
    * inverse of its exact-duplicate multiplicity (`1/n_copies` over the
    * [[graft.functions.TextFunctions.fingerprint]] groups) — the
    * repetition-aware loss-weighting alternative to hard dropping, so a
    * doc duplicated 10× contributes the same expected gradient mass as a
    * unique one. Emits per doc the multiplicity, the weight, and the
    * effective (weight-scaled) token count the epoch planner sums.
    *
    * Scale: ONE fingerprint-keyed shuffle (a window count over the fp
    * partition — no join back); everything else is map-side arithmetic. */
  def sampSoftDedup(s: SparkSession, dir: String): DataFrame = {
    val wfp = Window.partitionBy(col("fp"))
    docs(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("n_copies", count(lit(1)).over(wfp))
      .select(col("doc_id"), col("n_copies"), col("n_tokens"),
        (round(lit(1.0) / col("n_copies"), 6) + 0.0).as("weight"),
        (round(col("n_tokens") / col("n_copies"), 6) + 0.0).as("eff_tokens"))
      .orderBy(col("doc_id"))
  }

  val sampSoftDedupSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS fp,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies
      |  FROM f
      |)
      |SELECT doc_id, n_copies, n_tokens,
      |  ROUND(CAST(1.0 AS DOUBLE) / n_copies, 6) + 0.0 AS weight,
      |  ROUND(n_tokens / n_copies, 6) + 0.0 AS eff_tokens
      |FROM m ORDER BY doc_id""".stripMargin

  // ------------------------------------------ temperature-ladder sweep
  /** Temperature ladder for the mixture designer: for each τ, the
    * DIVERSITY summary of the τ-scaled source weights — effective source
    * count `exp(−Σ w·ln w)` (perplexity of the weight distribution) and
    * the heaviest single-source weight. τ=1 is the natural mix; lower τ
    * flattens. Read next to [[sampTemperature]] (which emits the weights
    * themselves at fixed τ): the sweep is how you PICK τ — the smallest
    * flattening that brings eff_sources where you want it. Entropy
    * contributions route through DECIMAL(30,15).
    *
    * Scale: everything after the per-source token agg is model-sized
    * (|sources| × |ladder|). */
  def mixTempSweep(s: SparkSession, dir: String): DataFrame = {
    val taus = Seq(0.3, 0.5, 0.7, 1.0)
    val perSrc = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(tokenCount(col("text"))).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("tot_tokens"))
    val share = col("n_tokens").cast("double") / col("tot_tokens").cast("double")
    val powed = perSrc.crossJoin(broadcast(tot))
      .select(col("source") +: taus.map { t =>
        exp(lit(t) * log(share)).cast("decimal(30,15)").as(s"p${(t * 10).toInt}")
      }: _*)
    val z = powed.agg(
      taus.map(t => sum(col(s"p${(t * 10).toInt}")).as(s"z${(t * 10).toInt}")).head,
      taus.tail.map(t => sum(col(s"p${(t * 10).toInt}")).as(s"z${(t * 10).toInt}")): _*)
    val entries = taus.map { t =>
      val k = (t * 10).toInt
      val w = col(s"p$k").cast("double") / col(s"z$k").cast("double")
      struct(lit(t).as("tau"),
        (w * log(w)).cast("decimal(30,15)").as("wlw"),
        w.as("w"))
    }
    powed.crossJoin(broadcast(z))
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.tau").as("tau"), col("e.wlw").as("wlw"), col("e.w").as("w"))
      .groupBy(col("tau"))
      .agg((round(exp(-sum(col("wlw")).cast("double")), 6) + 0.0)
        .as("eff_sources"),
        (round(max(col("w")), 6) + 0.0).as("max_w"))
      .orderBy(col("tau"))
  }

  val mixTempSweepSql: String =
    """WITH per_src AS (
      |  SELECT source,
      |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
      |      AS n_tokens
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM per_src
      |), powed AS (
      |  SELECT source,
      |    CAST(exp(0.3 * ln(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE))) AS DECIMAL(30,15)) AS p3,
      |    CAST(exp(0.5 * ln(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE))) AS DECIMAL(30,15)) AS p5,
      |    CAST(exp(0.7 * ln(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE))) AS DECIMAL(30,15)) AS p7,
      |    CAST(exp(1.0 * ln(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE))) AS DECIMAL(30,15)) AS p10
      |  FROM per_src CROSS JOIN tot
      |), z AS (
      |  SELECT SUM(p3) AS z3, SUM(p5) AS z5, SUM(p7) AS z7, SUM(p10) AS z10
      |  FROM powed
      |), e AS (
      |  SELECT tau,
      |    CASE tau WHEN 0.3 THEN CAST(p3 AS DOUBLE) / CAST(z3 AS DOUBLE)
      |      WHEN 0.5 THEN CAST(p5 AS DOUBLE) / CAST(z5 AS DOUBLE)
      |      WHEN 0.7 THEN CAST(p7 AS DOUBLE) / CAST(z7 AS DOUBLE)
      |      ELSE CAST(p10 AS DOUBLE) / CAST(z10 AS DOUBLE) END AS w
      |  FROM powed CROSS JOIN z
      |  CROSS JOIN (SELECT unnest([0.3, 0.5, 0.7, 1.0]) AS tau) t
      |)
      |SELECT tau,
      |  ROUND(exp(-CAST(SUM(CAST(w * ln(w) AS DECIMAL(30,15))) AS DOUBLE)),
      |    6) + 0.0 AS eff_sources,
      |  ROUND(MAX(w), 6) + 0.0 AS max_w
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------- dedup-aware mixture shares
  /** Mixture shares on EFFECTIVE tokens: each source's share of the
    * corpus computed twice — on raw token counts and on
    * [[sampSoftDedup]]-weighted effective tokens (each doc contributes
    * `n_tokens/n_copies`) — with the shift between them. The
    * dup-honesty correction to [[mixWeights]]: a source that mostly
    * duplicates itself claims a larger raw share than the unique content
    * it actually brings, and `share_shift` is exactly the overweight a
    * naive mixture would hand it.
    *
    * Scale: one fingerprint-keyed window (the softdedup shape) + one
    * source-keyed map-combined rollup; totals broadcast. */
  def mixEffective(s: SparkSession, dir: String): DataFrame = {
    val wfp = Window.partitionBy(col("fp"))
    val wAll = Window.partitionBy()
    docs(s, dir)
      .select(col("source"), fingerprint(col("text")).as("fp"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("n_copies", count(lit(1)).over(wfp))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("raw_tokens"),
        (round(sum((col("n_tokens") / col("n_copies"))
          .cast("decimal(30,15)")).cast("double"), 6) + 0.0).as("eff_tokens"))
      .withColumn("tot_raw", sum(col("raw_tokens")).over(wAll))
      .withColumn("tot_eff", sum(col("eff_tokens").cast("decimal(30,15)"))
        .over(wAll).cast("double"))
      .select(col("source"), col("raw_tokens"), col("eff_tokens"),
        (round(col("raw_tokens").cast("double") / col("tot_raw"), 6) + 0.0)
          .as("raw_share"),
        (round(col("eff_tokens") / col("tot_eff"), 6) + 0.0).as("eff_share"),
        (round(col("eff_tokens") / col("tot_eff") -
          col("raw_tokens").cast("double") / col("tot_raw"), 6) + 0.0)
          .as("share_shift"))
      .orderBy(col("source"))
  }

  val mixEffectiveSql: String =
    """WITH f AS (
      |  SELECT source,
      |    md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS fp,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), m AS (
      |  SELECT source, n_tokens,
      |    CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies
      |  FROM f
      |), c AS (
      |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
      |    ROUND(CAST(SUM(CAST(n_tokens / n_copies AS DECIMAL(30,15)))
      |      AS DOUBLE), 6) + 0.0 AS eff_tokens
      |  FROM m GROUP BY 1
      |), t AS (
      |  SELECT source, raw_tokens, eff_tokens,
      |    SUM(raw_tokens) OVER () AS tot_raw,
      |    CAST(SUM(CAST(eff_tokens AS DECIMAL(30,15))) OVER () AS DOUBLE)
      |      AS tot_eff
      |  FROM c
      |)
      |SELECT source, raw_tokens, eff_tokens,
      |  ROUND(CAST(raw_tokens AS DOUBLE) / tot_raw, 6) + 0.0 AS raw_share,
      |  ROUND(eff_tokens / tot_eff, 6) + 0.0 AS eff_share,
      |  ROUND(eff_tokens / tot_eff
      |    - CAST(raw_tokens AS DOUBLE) / tot_raw, 6) + 0.0 AS share_shift
      |FROM t ORDER BY source""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_shuffle" -> ((s: SparkSession, d: String) => dsShuffle(s, d)),
    "samp_softdedup" -> (sampSoftDedup _),
    "mix_effective" -> (mixEffective _),
    "mix_temp_sweep" -> (mixTempSweep _),
    "samp_stratified" -> (sampStratified _),
    "samp_fixed" -> ((s: SparkSession, d: String) => sampFixed(s, d)),
    "samp_weighted" -> ((s: SparkSession, d: String) => sampWeighted(s, d)),
    "mix_weights" -> (mixWeights _),
    "samp_temperature" -> (sampTemperature _),
    "samp_bysource" -> ((s: SparkSession, d: String) => sampBySource(s, d)),
    "samp_dsir" -> ((s: SparkSession, d: String) => sampDsir(s, d)),
    "mix_budget" -> ((s: SparkSession, d: String) => mixBudget(s, d)),
    "mix_epochs" -> ((s: SparkSession, d: String) => mixEpochs(s, d)),
    "mix_doremi" -> ((s: SparkSession, d: String) => mixDoremi(s, d)),
    "mix_anneal" -> ((s: SparkSession, d: String) => mixAnneal(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "ds_shuffle" -> dsShuffleSql,
    "samp_softdedup" -> sampSoftDedupSql,
    "mix_effective" -> mixEffectiveSql,
    "mix_temp_sweep" -> mixTempSweepSql,
    "samp_stratified" -> sampStratifiedSql,
    "samp_fixed" -> sampFixedSql,
    "samp_weighted" -> sampWeightedSql,
    "mix_weights" -> mixWeightsSql,
    "samp_temperature" -> sampTemperatureSql,
    "samp_bysource" -> sampBySourceSql,
    "samp_dsir" -> sampDsirSql,
    "mix_budget" -> mixBudgetSql,
    "mix_epochs" -> mixEpochsSql,
    "mix_doremi" -> mixDoremiSql,
    "mix_anneal" -> mixAnnealSql,
  )
}
