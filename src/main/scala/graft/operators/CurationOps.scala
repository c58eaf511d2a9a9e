package graft.operators

import graft.{GraftTuning, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs over raw text
  * before anything reaches a tokenizer: within-document repetition signals
  * (the C4/Gopher-style cheap filters), deterministic hash-based dataset
  * splits, and TF-IDF term weighting. All are one or two shuffles at any
  * scale — see each operator's scale note.
  */
object CurationOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadFan(s, dir, "documents", "doc_id")

  private val duckToks = "regexp_split_to_array(trim(text), '\\s+')"

  // ---- shared quality/split expressions (single source; every operator
  // ---- below AND pipeCurate build from these, oracles mirror them) ----
  private def meanTokLen(toks: Column, n: Column): Column =
    aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      n.cast("double")
  private def dupTokFrac(toks: Column, n: Column): Column =
    lit(1.0) - size(array_distinct(toks)).cast("double") / n.cast("double")
  private def splitCol(id: Column): Column = {
    val bucket = substring(md5(id.cast("string").cast("binary")), 1, 1)
    when(bucket < "c", "train").when(bucket < "e", "val").otherwise("test")
  }
  // funnel thresholds (mirrored verbatim in the SQL oracles)
  private val MinChars = 150
  private val MaxChars = 600
  private val MinMtl = 3.0
  private val MaxMtl = 8.0
  private val MaxDupFrac = 0.7

  // ------------------------------------------- within-doc repetition signals
  /** Per-document repetition metrics: duplicate-token fraction, duplicate-
    * bigram fraction, and mean token length — the cheap quality filters the
    * public C4/Gopher pipelines apply before any model-based scoring.
    *
    * Scale: one map-side pass per document (array ops over the token
    * array, no explode, no shuffle beyond the final ORDER BY). Documents
    * are bounded-size rows, so per-row array work is O(doc length). */
  def txtRepetition(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // materialize toks/n through a projection boundary: every metric below
    // references them, and re-inlining the split per use would re-evaluate
    // it (CollapseProject keeps multi-referenced non-cheap aliases put)
    val t = d.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
    val bigrams = zip_with(
      slice(col("toks"), lit(1), col("n") - 1),
      slice(col("toks"), lit(2), col("n") - 1),
      (a, b) => concat(a, lit(" "), b))
    t.select(
      col("doc_id"),
      col("n").cast("long").as("n_tokens"),
      round(dupTokFrac(col("toks"), col("n")), 6).as("dup_tok_frac"),
      round(when(col("n") > 1,
        lit(1.0) - size(array_distinct(bigrams)).cast("double") /
          (col("n") - 1).cast("double")).otherwise(lit(0.0)),
        6).as("dup_bigram_frac"),
      round(meanTokLen(col("toks"), col("n")), 6).as("mean_tok_len"))
      .orderBy(col("doc_id"))
  }

  val txtRepetitionSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, $duckToks AS toks, len($duckToks) AS n FROM documents
       |), b AS (
       |  SELECT doc_id, toks, n,
       |    [toks[i] || ' ' || toks[i+1] for i in generate_series(1, n - 1)] AS bigrams
       |  FROM t
       |)
       |SELECT doc_id,
       |  CAST(n AS BIGINT) AS n_tokens,
       |  ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(n AS DOUBLE), 6)
       |    AS dup_tok_frac,
       |  ROUND(CASE WHEN n > 1
       |    THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / CAST(n - 1 AS DOUBLE)
       |    ELSE 0.0 END, 6) AS dup_bigram_frac,
       |  ROUND(CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
       |    / CAST(n AS DOUBLE), 6) AS mean_tok_len
       |FROM b ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- deterministic splits
  /** Deterministic train/val/test split by content-independent hash of the
    * document id: first hex char of md5(doc_id) — '0'..'b' train (12/16),
    * 'c'..'d' val (2/16), 'e'..'f' test (2/16). Reports counts per (source,
    * split) so per-source balance is visible.
    *
    * md5 (not xxhash64) deliberately: both engines — and any other system a
    * pipeline hands the split rule to — produce the identical digest for
    * the identical string, so the assignment is portable and replayable.
    * Scale: one map-side expression per row + one map-combined count
    * shuffle on (source, split). */
  def dsSplit(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), splitCol(col("doc_id")).as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))

  /** Per-doc split assignment over any frame with a doc_id — the
    * stateless map a STREAMING ingest applies on arrival. The md5-bucket
    * hash is the point: the assignment depends only on the id, never on
    * arrival order, micro-batch boundaries, or partitioning, so batch and
    * stream agree doc-for-doc (StreamingSpec) and a re-ingest lands every
    * doc in the same split. [[dsSplit]] is its batch rollup. */
  def dsSplitAssign(d: DataFrame): DataFrame =
    d.select(col("doc_id"), splitCol(col("doc_id")).as("split"))

  val dsSplitSql: String =
    """SELECT source,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  // ------------------------------------------------- split-leakage audit
  /** Cross-split near-duplicate leakage: every near-dup pair (the exact
    * n-gram-Jaccard pair graph of [[DedupOps.ddNgramJaccard]]) whose two
    * documents landed in DIFFERENT splits of [[dsSplit]]'s deterministic
    * assignment. A random-by-id split dedupes nothing — near-identical
    * documents straddle the train/val/test boundary and inflate held-out
    * metrics (the standard argument for dedup-BEFORE-split, cf. Lee et al.
    * 2022 §6). This audit makes the leak measurable: run it after any
    * split rule, and drive it to zero by deduplicating first or by
    * splitting on the near-dup component id instead of the doc id.
    *
    * Scale: the pair graph is near-dup-sized (not corpus-sized) and each
    * join keys it against the O(1)/row split projection on doc_id — the
    * pair side is the small one, broadcastable, and Spark picks that
    * automatically. No new corpus-scale shuffle beyond the pair graph's
    * own blocking. */
  def dsSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.ngramJaccardPairs(s, dir)
    val assign = docs(s, dir)
      .select(col("doc_id"), splitCol(col("doc_id")).as("split"))
    pairs
      .join(assign.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(assign.as("sb"), col("id_b") === col("sb.doc_id"))
      .filter(col("sa.split") =!= col("sb.split"))
      .select(col("id_a"), col("id_b"),
        col("sa.split").as("split_a"), col("sb.split").as("split_b"),
        col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val dsSplitLeakageSql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
      |), sh0 AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(CASE WHEN len(t) >= 3
      |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |      ELSE [] END) AS s
      |  FROM toks
      |), rare AS (
      |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= ${GraftTuning.ShingleDfCap}
      |), sh AS (
      |  SELECT sh0.* FROM sh0 JOIN rare USING (s)
      |), cnt AS (
      |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT id_a, id_b, ROUND(n_inter / (ca.n + cb.n - n_inter), 6) AS jaccard
      |  FROM inter
      |  JOIN cnt ca ON id_a = ca.doc_id
      |  JOIN cnt cb ON id_b = cb.doc_id
      |  WHERE ROUND(n_inter / (ca.n + cb.n - n_inter), 6) >= 0.2
      |), assign AS (
      |  SELECT doc_id,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents
      |)
      |SELECT id_a, id_b, sa.split AS split_a, sb.split AS split_b, jaccard
      |FROM pairs
      |JOIN assign sa ON id_a = sa.doc_id
      |JOIN assign sb ON id_b = sb.doc_id
      |WHERE sa.split <> sb.split
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------------- TF-IDF
  /** Top-3 TF-IDF terms per document: tf(term, doc) · ln(N / df(term)),
    * ranked per doc with an alphabetic tiebreak.
    *
    * Scale: explode → (doc, term) map-combined count; the df table is
    * vocabulary-sized → broadcast join (never a corpus shuffle); the
    * corpus count crosses as a broadcast scalar, not a driver constant.
    * The per-doc window partitions on doc_id — bounded rows per partition
    * (a doc's distinct terms), no skew. */
  def txtTfidf(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val d = docs(s, dir)
    val terms = d.select(col("doc_id"),
      explode(tokens(lower(col("text")))).as("term"))
    // tf feeds TWO branches (the df aggregation and the join left side);
    // without a persist each branch re-runs the explode + count
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_raw").desc, col("term"))
    // top-k report is k rows per doc — materialize it so the (doc, term)
    // cache releases here rather than at clearCache/session end
    val report = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf_raw",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"),
        round(col("tfidf_raw"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
      .localCheckpoint()
    tf.unpersist()
    report
  }

  val txtTfidfSql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
       |), df AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
       |), n AS (
       |  SELECT COUNT(*) AS n_docs FROM documents
       |), scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
       |      AS tfidf_raw
       |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
       |)
       |SELECT doc_id, term,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf_raw DESC, term) AS rank,
       |  ROUND(tfidf_raw, 6) AS tfidf
       |FROM scored
       |QUALIFY rank <= 3
       |ORDER BY doc_id, rank""".stripMargin

  // ------------------------------------------------------ quality funnel
  /** Sequential quality-filter funnel: per-stage survivor counts for the
    * standard cheap-filter chain (char length → mean token length →
    * duplicate-token fraction → English language-ID). The funnel view is
    * what a pipeline operator watches to see which stage is eating the
    * corpus; selecting the survivors instead of counting them is the same
    * predicate chain minus the aggregate.
    *
    * Scale: every stage flag is a map-side expression over one projection
    * boundary (tokens materialized once); the count is a single
    * map-combined aggregate to one row, then a constant-size unpivot. */
  def txtFunnel(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val t = d.select(col("n_chars"), col("text"), tokens(col("text")).as("toks"))
      .select(col("n_chars"), col("text"), col("toks"), size(col("toks")).as("n"))
    // flags materialized through a projection boundary: mtl/dupf/marker
    // scores each feed several cumulative conjunctions below
    val scored = t.select(
      Seq(
        col("n_chars"),
        meanTokLen(col("toks"), col("n")).as("mtl"),
        dupTokFrac(col("toks"), col("n")).as("dupf")) ++
        LangMarkers.map { case (lang, m) =>
          markerCount(col("text"), m).as(s"s_$lang")
        }: _*)
    val c1 = col("n_chars") >= MinChars && col("n_chars") <= MaxChars
    val c2 = col("mtl") >= MinMtl && col("mtl") <= MaxMtl
    val c3 = col("dupf") <= MaxDupFrac
    val c4 = langIdFromScores(
      LangMarkers.map { case (lang, _) => lang -> col(s"s_$lang") }) === "en"
    val a = scored.agg(
      count(lit(1)).as("s0"),
      sum(when(c1, 1L).otherwise(0L)).as("s1"),
      sum(when(c1 && c2, 1L).otherwise(0L)).as("s2"),
      sum(when(c1 && c2 && c3, 1L).otherwise(0L)).as("s3"),
      sum(when(c1 && c2 && c3 && c4, 1L).otherwise(0L)).as("s4"))
    val stages = Seq(0L -> "all", 1L -> "len_chars", 2L -> "mean_tok_len",
      3L -> "dup_tok_frac", 4L -> "lang_en")
    a.select(explode(array(stages.map { case (i, name) =>
      struct(lit(i).as("stage_id"), lit(name).as("stage"),
        col(s"s$i").as("survivors"))
    }: _*)).as("x"))
      .select(col("x.stage_id"), col("x.stage"), col("x.survivors"))
      .orderBy(col("stage_id"))
  }

  val txtFunnelSql: String = {
    // derive from the marker table — a hardcoded list desyncs the GREATEST
    // argmax the moment a language is added to LangMarkers
    val langs = graft.functions.TextFunctions.LangMarkers.map(_._1)
    def stop(words: Seq[String]): String =
      s"len(list_filter(toks, t -> t IN (${words.map("'" + _ + "'").mkString(",")})))"
    val scoreCols = graft.functions.TextFunctions.LangMarkers
      .map { case (lang, m) => s"${stop(m)} AS s_$lang" }.mkString(",\n      |    ")
    val best = s"GREATEST(${langs.map("s_" + _).mkString(", ")})"
    s"""WITH t AS (
       |  SELECT n_chars, $duckToks AS toks, len($duckToks) AS n FROM documents
       |), m AS (
       |  SELECT n_chars,
       |    CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
       |      / CAST(n AS DOUBLE) AS mtl,
       |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(n AS DOUBLE) AS dupf,
       |    $scoreCols
       |  FROM t
       |), f AS (
       |  SELECT (n_chars >= 150 AND n_chars <= 600) AS c1,
       |    (mtl >= 3.0 AND mtl <= 8.0) AS c2,
       |    (dupf <= 0.7) AS c3,
       |    (s_en > 0 AND s_en = $best) AS c4
       |  FROM m
       |), a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS s0,
       |    CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(SUM(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
       |    CAST(SUM(CASE WHEN c1 AND c2 AND c3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
       |    CAST(SUM(CASE WHEN c1 AND c2 AND c3 AND c4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
       |  FROM f
       |)
       |SELECT CAST(0 AS BIGINT) AS stage_id, 'all' AS stage, s0 AS survivors FROM a
       |UNION ALL SELECT 1, 'len_chars', s1 FROM a
       |UNION ALL SELECT 2, 'mean_tok_len', s2 FROM a
       |UNION ALL SELECT 3, 'dup_tok_frac', s3 FROM a
       |UNION ALL SELECT 4, 'lang_en', s4 FROM a
       |ORDER BY stage_id""".stripMargin
  }

  // ------------------------------------------------------- document chunking
  /** Sliding-window chunking: split each document's token array into
    * max-64-token chunks with 16-token overlap (stride 48) — the
    * context-window sharding step before tokenization. Emits one row per
    * chunk with its span and a content fingerprint (chunk text itself
    * stays out of the report; the fingerprint pins it for the oracle).
    *
    * Scale: pure per-row array math + one explode — map-side at any size;
    * output is ~n_tokens/stride rows per doc, bounded by doc length. */
  def txtChunks(s: SparkSession, dir: String,
      maxTok: Int = 64, overlap: Int = 16): DataFrame = {
    val stride = maxTok - overlap
    val t = docs(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
    val nChunks = when(col("n") <= maxTok, lit(1))
      .otherwise((lit(1) + ceil((col("n") - maxTok) / lit(stride.toDouble))).cast("int"))
    t.select(col("doc_id"), col("toks"), col("n"),
        explode(transform(sequence(lit(0), nChunks - 1), i =>
          struct(i.as("idx"), (i * stride + 1).as("start"),
            least(i * stride + maxTok, col("n")).as("end")))).as("c"))
      .select(col("doc_id"),
        col("c.idx").cast("long").as("chunk_id"),
        col("c.start").cast("long").as("start_tok"),
        (col("c.end") - col("c.start") + 1).cast("long").as("n_tok"),
        md5(concat_ws(" ",
          slice(col("toks"), col("c.start"), col("c.end") - col("c.start") + 1))
          .cast("binary")).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // One definition of the oracle-side chunk grid (64-token chunks, stride
  // 48) and chunk fingerprint, interpolated by BOTH txtChunksSql and
  // ddChunkDupsSql — retuning the constants in one oracle but not the
  // other would silently give the dup scan a different grid than the
  // chunker. Declared before first use (object vals initialize in order).
  private val chunkGridCte: String =
    s"""t AS (
       |  SELECT doc_id, $duckToks AS toks, len($duckToks) AS n FROM documents
       |), c AS (
       |  SELECT doc_id, toks, n,
       |    unnest(generate_series(0,
       |      CASE WHEN n <= 64 THEN 0
       |           ELSE CAST(ceil((n - 64) / 48.0) AS INTEGER) END)) AS i
       |  FROM t
       |)""".stripMargin
  private val chunkFpExpr: String =
    "md5(array_to_string(list_slice(toks, i * 48 + 1, LEAST(i * 48 + 64, n)), ' '))"

  // ------------------------------------------------- chunk-level dup scan
  /** Cross-document repeated-span detection over the [[txtChunks]] grid —
    * the RefinedWeb-style signal that catches boilerplate and templated
    * spans exact whole-doc dedup misses: per document, how many of its
    * distinct chunks also appear (by content fingerprint) in at least one
    * OTHER document, and the resulting dup fraction.
    *
    * Scale: one (doc, fp) distinct, one fp-keyed window count (bucket =
    * docs sharing a span — boilerplate-bounded), one doc-keyed rollup —
    * all linear, no joins. */
  def ddChunkDups(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("chunk_fp"))
    txtChunks(s, dir)
      .select(col("doc_id"), col("chunk_fp")).distinct()
      .withColumn("n_docs_with", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct_chunks"),
        sum(when(col("n_docs_with") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_distinct_chunks"), col("n_dup_chunks"),
        round(col("n_dup_chunks").cast("double") /
          col("n_distinct_chunks").cast("double"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val ddChunkDupsSql: String =
    s"""WITH $chunkGridCte, fps AS (
       |  SELECT DISTINCT doc_id, $chunkFpExpr AS chunk_fp
       |  FROM c
       |), marked AS (
       |  SELECT doc_id, COUNT(*) OVER (PARTITION BY chunk_fp) AS n_docs_with
       |  FROM fps
       |)
       |SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
       |  CAST(SUM(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  ROUND(CAST(SUM(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
       |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val txtChunksSql: String =
    s"""WITH $chunkGridCte
       |SELECT doc_id,
       |  CAST(i AS BIGINT) AS chunk_id,
       |  CAST(i * 48 + 1 AS BIGINT) AS start_tok,
       |  CAST(LEAST(i * 48 + 64, n) - (i * 48 + 1) + 1 AS BIGINT) AS n_tok,
       |  $chunkFpExpr AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ------------------------------------------------------ sequence packing
  /** Concat-and-split sequence packing: documents concatenate in doc_id
    * order into one token stream that splits at fixed 1024-token
    * boundaries (the standard LLM pretraining packing). Reports each
    * document's first/last training sequence and span.
    *
    * The running offset is a TWO-PHASE distributed prefix sum — the naive
    * `Window.orderBy(doc_id)` form funnels the whole corpus through one
    * ordered partition. Phase 1: range-partition by doc_id and prefix-sum
    * WITHIN each partition (parallel across partitions). Phase 2: the
    * per-partition totals — one long per partition, model state — collect,
    * exclusive-scan on the driver, and rejoin as broadcast base offsets.
    * base(pid) + local prefix ≡ the global prefix sum exactly, regardless
    * of where the sampled range bounds fall, because range partitioning
    * preserves the global doc_id order across partitions. The partitioned
    * frame is computed once and persisted so both phases read the same
    * pid assignment (re-running repartitionByRange could re-sample
    * different bounds); report materialized, cache released. */
  def txtPack(s: SparkSession, dir: String, budget: Int = 1024,
      parts: Int = 32): DataFrame = {
    val counts = docs(s, dir)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .repartitionByRange(parts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.groupBy(col("pid")).agg(sum(col("n_tokens")).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid + 1, acc + tot)
    }.init.zip(totals).map { case ((_, base), (pid, _)) => (pid, base) }
    val baseDf = s.createDataFrame(bases.toSeq).toDF("pid", "base")
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val report = counts
      .withColumn("local_off", coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      .join(broadcast(baseDf), Seq("pid"))
      .withColumn("offset", col("local_off") + col("base"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("offset") / budget).as("start_seq"),
        floor((col("offset") + col("n_tokens") - 1) / budget).as("end_seq"))
      .orderBy(col("doc_id"))
      .localCheckpoint()
    counts.unpersist()
    report
  }

  val txtPackSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents
       |), o AS (
       |  SELECT doc_id, n_tokens,
       |    COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      AS tok_offset
       |  FROM t
       |)
       |SELECT doc_id, n_tokens,
       |  CAST(FLOOR(tok_offset / 1024) AS BIGINT) AS start_seq,
       |  CAST(FLOOR((tok_offset + n_tokens - 1) / 1024) AS BIGINT) AS end_seq
       |FROM o ORDER BY doc_id""".stripMargin

  // ----------------------------------------- content-defined chunking
  /** Content-defined chunking (CDC) + chunk-level dup marking — the
    * shift-robust alternative to [[txtChunks]]'s fixed 64/48 grid. A
    * token is a BOUNDARY iff the first hex digit of md5(token) is '0'
    * (p = 1/16 → expected chunk length 16 tokens), and a boundary token
    * ends its chunk. Because the boundary decision depends only on the
    * token — never on position — inserting or deleting a prefix re-cuts
    * at the SAME places once past the edit: all chunks after the first
    * shared boundary are byte-identical, so chunk-dedup still matches
    * (the fixed grid shifts every chunk and matches nothing — the
    * classic rsync/LBFS argument, asserted in the spec). The windowed
    * (Rabin) variant — hash of the trailing w tokens instead of one —
    * is a one-line drop-in on the boundary expression.
    *
    * Scale: the cut is a PER-ROW fold ([[cdcChunkGrain]]) — zero
    * shuffles; the only exchanges are the fp-keyed dup-count join
    * (buckets boilerplate-bounded — the dd_chunk_dups shape) and the
    * presentation sort. No corpus-scale collect. */
  /** The CDC cut itself, as per-row array expressions — no explode,
    * no window, no shuffle: each token is suffixed with a sentinel
    * (boundary -> U+0001, else a space), the marked tokens concatenate,
    * and one split on the sentinel yields the chunk list (a chunk's
    * tokens end up single-space-joined, the trailing run is the flushed
    * tail, rtrim removes the last non-boundary token's space). Stateless
    * per row, so the SAME projection is the streaming dedup-on-arrival
    * form ([[graft.streaming.StreamOps.streamingCdcChunks]]) — and the
    * batch chunker pays zero shuffle before the dup join. A document
    * that is empty after trim yields no chunks.
    *
    * This replaced an `aggregate` fold whose accumulator CARRIED the
    * growing chunk array: Catalyst copies an array-bearing accumulator
    * on every step, so a 1.2M-token document (the r15 degenerate
    * sweep's 8 MB row) cost O(tokens × chunks) array copies — one task
    * pinned a core for 30+ minutes. The sentinel form is O(tokens).
    * U+0001 in the INPUT is normalized to a token separator first (it
    * is the one byte the construction reserves; the oracle applies the
    * same replace), so hostile content cannot forge a cut. */
  private[graft] def cdcChunkGrain(d: DataFrame): DataFrame = {
    val sentinel = "\u0001"
    val toks = filter(tokens(translate(col("text"), sentinel, " ")),
      t => t =!= "")
    val marked = transform(toks, t =>
      concat(t, when(substring(md5(t.cast("binary")), 1, 1) === "0",
        lit(sentinel)).otherwise(lit(" "))))
    val chunksCol = filter(
      transform(split(array_join(marked, ""), sentinel), c => rtrim(c)),
      c => c =!= "")
    d.select(col("doc_id"), posexplode(chunksCol).as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(split(col("chunk"), " ")).cast("long").as("n_tok"),
        md5(col("chunk").cast("binary")).as("chunk_fp"))
  }

  def cdcChunksFrom(d: DataFrame): DataFrame = {
    val chunks = cdcChunkGrain(d)
    val fpDocs = chunks.select(col("doc_id"), col("chunk_fp")).distinct()
      .groupBy(col("chunk_fp")).agg(count(lit(1)).as("n_docs_with"))
    chunks.join(fpDocs, Seq("chunk_fp"))
      .select(col("doc_id"), col("chunk_id"), col("n_tok"), col("chunk_fp"),
        col("n_docs_with"),
        (col("n_docs_with") > 1).cast("int").as("shared"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  def txtCdcChunks(s: SparkSession, dir: String): DataFrame =
    cdcChunksFrom(docs(s, dir))

  val txtCdcChunksSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, $duckToks AS toks
       |  FROM (SELECT doc_id, replace(text, chr(1), ' ') AS text FROM documents)
       |), tk AS (
       |  SELECT doc_id, u.pos AS pos, u.tok AS tok,
       |    CASE WHEN substr(md5(u.tok), 1, 1) = '0' THEN 1 ELSE 0 END AS b
       |  FROM t, UNNEST(list_transform(range(1, len(toks) + 1),
       |    i -> {'pos': i, 'tok': toks[i]})) AS c(u)
       |  WHERE u.tok <> ''
       |), cid AS (
       |  SELECT doc_id, pos, tok,
       |    COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
       |  FROM tk
       |), ch AS (
       |  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_tok,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
       |  FROM cid GROUP BY doc_id, chunk_id
       |), fpd AS (
       |  SELECT chunk_fp, CAST(COUNT(*) AS BIGINT) AS n_docs_with
       |  FROM (SELECT DISTINCT doc_id, chunk_fp FROM ch) GROUP BY 1
       |)
       |SELECT ch.doc_id, ch.chunk_id, ch.n_tok, ch.chunk_fp,
       |  fpd.n_docs_with, CAST(fpd.n_docs_with > 1 AS INTEGER) AS shared
       |FROM ch JOIN fpd USING (chunk_fp)
       |ORDER BY ch.doc_id, ch.chunk_id""".stripMargin

  // --------------------------------------------------- end-to-end pipeline
  /** The full curation pipeline as ONE composed DAG — the capstone query a
    * training-data team actually ships: quality-funnel predicates → exact
    * dedup (min doc_id per content fingerprint) → deterministic split
    * assignment → per-(split, lang) counts. Every stage reuses the
    * operators above, so this also certifies they compose.
    *
    * Scale: filter/fingerprint/split are map-side; dedup is ONE shuffle
    * (min-over-fingerprint-window, then keep rows equal to the min — no
    * agg+join round trip, and no broadcast: the canonical set is
    * corpus-sized when dup rates are low); the report is one
    * |splits·langs| aggregation. Two shuffles total at any size. */
  def pipeCurate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val t = d.select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
      tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
        col("toks"), size(col("toks")).as("n"))
    val survivors = t.select(col("doc_id"), col("lang"),
      fingerprint(col("text")).as("fp"),
      meanTokLen(col("toks"), col("n")).as("mtl"),
      dupTokFrac(col("toks"), col("n")).as("dupf"),
      col("n_chars"))
      .filter(col("n_chars") >= MinChars && col("n_chars") <= MaxChars &&
        col("mtl") >= MinMtl && col("mtl") <= MaxMtl &&
        col("dupf") <= MaxDupFrac)
    // exact dedup among survivors: canonical = min doc_id per fingerprint
    survivors
      .withColumn("mn", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("mn"))
      .select(col("lang"), splitCol(col("doc_id")).as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang"))
  }

  val pipeCurateSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, n_chars, text, $duckToks AS toks,
       |    len($duckToks) AS n
       |  FROM documents
       |), survivors AS (
       |  SELECT doc_id, lang,
       |    md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\\s+'), ' ')) AS fp
       |  FROM t
       |  WHERE n_chars >= 150 AND n_chars <= 600
       |    AND CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
       |      / CAST(n AS DOUBLE) >= 3.0
       |    AND CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
       |      / CAST(n AS DOUBLE) <= 8.0
       |    AND 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(n AS DOUBLE) <= 0.7
       |), canon AS (
       |  SELECT doc_id, lang FROM survivors
       |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)
       |)
       |SELECT
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
       |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
       |       ELSE 'test' END AS split,
       |  lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM canon
       |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  // ---------------------------------------------- corpus integrity audit
  /** Docs↔embeddings key-alignment audit — the integrity gate a pipeline
    * runs before training on a joined corpus: key cardinalities on both
    * sides, matched keys, orphans in each direction, and duplicate-key
    * counts. One summary row; any nonzero orphan/dup cell is the "stop the
    * pipeline" signal.
    *
    * Scale: two distinct-ish aggregations keyed by id (map-combined
    * counts) and one full-outer join of the per-key count tables — every
    * stage shuffles on the key, per-key state is two longs. */
  def pipeIntegrity(s: SparkSession, dir: String): DataFrame = {
    val dk = docs(s, dir).groupBy(col("doc_id")).agg(count(lit(1)).as("nd"))
    val vk = Tables.load(s, dir, "embeddings")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("nv"))
    dk.join(vk, dk("doc_id") === vk("vec_id"), "full_outer")
      .agg(
        sum(when(col("nd").isNotNull, 1L).otherwise(0L)).as("n_doc_keys"),
        sum(when(col("nv").isNotNull, 1L).otherwise(0L)).as("n_vec_keys"),
        sum(when(col("nd").isNotNull && col("nv").isNotNull, 1L).otherwise(0L))
          .as("n_matched"),
        sum(when(col("nd").isNotNull && col("nv").isNull, 1L).otherwise(0L))
          .as("docs_without_vec"),
        sum(when(col("nd").isNull && col("nv").isNotNull, 1L).otherwise(0L))
          .as("vecs_without_doc"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("dup_doc_keys"),
        sum(when(col("nv") > 1, 1L).otherwise(0L)).as("dup_vec_keys"))
  }

  val pipeIntegritySql: String =
    """WITH dk AS (
      |  SELECT doc_id, COUNT(*) AS nd FROM documents GROUP BY doc_id
      |), vk AS (
      |  SELECT vec_id, COUNT(*) AS nv FROM embeddings GROUP BY vec_id
      |)
      |SELECT
      |  CAST(SUM(CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_keys,
      |  CAST(SUM(CASE WHEN nv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_vec_keys,
      |  CAST(SUM(CASE WHEN nd IS NOT NULL AND nv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      |  CAST(SUM(CASE WHEN nd IS NOT NULL AND nv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_without_vec,
      |  CAST(SUM(CASE WHEN nd IS NULL AND nv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS vecs_without_doc,
      |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_doc_keys,
      |  CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_vec_keys
      |FROM dk FULL OUTER JOIN vk ON dk.doc_id = vk.vec_id""".stripMargin

  // --------------------------------- quality-threshold calibration
  /** Per-source quality-filter calibration — the step that turns "filter
    * at quality ≥ τ" from a global guess into a per-source decision: for
    * every source, the discrete q10/q50/q90 of the stopword-ratio quality
    * signal ([[SamplingOps.mixBudget]]'s `q`), plus how many of its docs
    * survive a single GLOBAL threshold τ (the corpus-wide discrete
    * median). Sources whose q90 sits below τ are the ones a global
    * threshold would wipe out — exactly what a curator reads this table
    * to find.
    *
    * Quantiles are computed from the VALUE HISTOGRAM, not a row sort: `q`
    * is rounded to 6dp, so the distinct-value count is bounded and the
    * cumulative scan runs over model-sized (source, q, cnt) groups — the
    * discrete quantile `min q s.t. cum ≥ ⌈p·n⌉` needs no global
    * row-ordering at any corpus size (the interpolating-percentile
    * alternative would; percentile_approx is the same dial with error
    * bars). Both engines evaluate the identical discrete definition, so
    * the result hash-matches exactly — no interpolation semantics to
    * disagree over.
    *
    * Scale: doc-level q is map-side; the histogram is two map-combined
    * shuffles (|sources|·|distinct q| then |distinct q| groups); τ
    * crosses back as a broadcast scalar. Output is |sources| rows. */
  def txtQualityCal(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        round(stopwordCount(col("toks"), EnglishStops).cast("double") /
          size(col("toks")).cast("double"), 6).as("q"))
    val hist = scored.groupBy(col("source"), col("q"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wSrc = Window.partitionBy(col("source")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wSrc))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("source"))))
    def qtile(p: Double) =
      min(when(col("cum") >= ceil(lit(p) * col("n").cast("double")), col("q")))
    val perSrc = cum.groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        qtile(0.1).as("q10"), qtile(0.5).as("q50"), qtile(0.9).as("q90"))
    // global τ from the source-collapsed histogram — same machinery
    val gHist = hist.groupBy(col("q")).agg(sum(col("cnt")).as("cnt"))
    val wAll = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tau = gHist
      .withColumn("cum", sum(col("cnt")).over(wAll))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .agg(min(when(col("cum") >= ceil(lit(0.5) * col("n").cast("double")),
        col("q"))).as("tau"))
    val kept = scored.crossJoin(broadcast(tau))
      .groupBy(col("source"))
      .agg((max(col("tau")) + 0.0).as("tau"),
        sum(when(col("q") >= col("tau"), 1L).otherwise(0L)).as("n_keep"))
    val out = perSrc.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("q10"), col("q50"),
        col("q90"), col("tau"), col("n_keep"))
      .orderBy(col("source"))
      .localCheckpoint()
    hist.unpersist()
    out
  }

  val txtQualityCalSql: String = {
    val stops = graft.functions.TextFunctions.EnglishStops
      .map("'" + _ + "'").mkString(",")
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    ROUND(CAST(len(list_filter($duckToks, t -> t IN ($stops))) AS DOUBLE)
       |      / CAST(len($duckToks) AS DOUBLE), 6) AS q
       |  FROM documents
       |), hist AS (
       |  SELECT source, q, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM scored GROUP BY source, q
       |), cum AS (
       |  SELECT source, q, cnt,
       |    SUM(cnt) OVER (PARTITION BY source ORDER BY q
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(cnt) OVER (PARTITION BY source) AS n
       |  FROM hist
       |), per_src AS (
       |  SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       |    MIN(CASE WHEN cum >= CEIL(0.1 * CAST(n AS DOUBLE)) THEN q END) AS q10,
       |    MIN(CASE WHEN cum >= CEIL(0.5 * CAST(n AS DOUBLE)) THEN q END) AS q50,
       |    MIN(CASE WHEN cum >= CEIL(0.9 * CAST(n AS DOUBLE)) THEN q END) AS q90
       |  FROM cum GROUP BY source
       |), gcum AS (
       |  SELECT q,
       |    SUM(cnt) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(cnt) OVER () AS n
       |  FROM (SELECT q, SUM(cnt) AS cnt FROM hist GROUP BY q)
       |), gtau AS (
       |  SELECT MIN(CASE WHEN cum >= CEIL(0.5 * CAST(n AS DOUBLE)) THEN q END)
       |    AS tau
       |  FROM gcum
       |), kept AS (
       |  SELECT source, MAX(tau) + 0.0 AS tau,
       |    CAST(SUM(CASE WHEN q >= tau THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
       |  FROM scored CROSS JOIN gtau GROUP BY source
       |)
       |SELECT per_src.source, n_docs, q10, q50, q90, tau, n_keep
       |FROM per_src JOIN kept ON per_src.source = kept.source
       |ORDER BY per_src.source""".stripMargin
  }

  // ------------------------------------------- BPE merge learning
  /** Byte-pair-encoding merge learning — the tokenizer-training step of
    * an LLM data pipeline (Sennrich et al. 2016): iteratively find the
    * most frequent adjacent symbol pair across the corpus and fuse it
    * into a new symbol. Trains on the WORD-FREQUENCY table (the classic
    * trick): the corpus is scanned once to count words, and every round
    * after that touches only vocabulary-sized state — at 100 TB the
    * rounds cost the same as at 1 GB, because a language's word vocab is
    * bounded. Emits the learned merge table (rnd, left_sym, right_sym,
    * cnt) — the artifact a tokenizer ships.
    *
    * Symbols are kept boundary-marked ('·a·g·g·') so multi-char symbols
    * can never merge through a fragment of a neighbor ('x a' must not
    * match inside 'x ab'). Merge application is exact-substring
    * `replace` of '·a·b·' → '·ab·', applied 3× to convergence: one pass
    * resolves runs ≤ 2 of the pair (consecutive occurrences share the
    * boundary dot, so a single left-to-right scan takes every other
    * one), three passes cover runs ≤ 8 — beyond any word in a natural
    * vocab, and the ORACLE applies the identical 3 passes, so the
    * engines agree by construction even on adversarial runs.
    *
    * The per-round top pair is collected to the driver (1 row — model
    * state, the eigensolve discipline) so the next round's merge embeds
    * as a plan literal; ties break on (count desc, pair asc) in both
    * engines. Single-symbol words stay in the vocab but generate no
    * pairs (BPE semantics).
    *
    * Scale: one corpus scan (word count, map-combined); each round is a
    * vocab-sized explode + |pairs|-group aggregation + a driver top-1.
    * Nothing corpus-sized ever moves after the first shuffle. */
  def txtBpeTrain(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val words = docs(s, dir)
      .select(explode(tokens(lower(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit("·"),
        array_join(regexp_extract_all(col("w"), lit("."), lit(0)), "·"),
        lit("·")).as("sym"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var vocab: DataFrame = words
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (r <- 1 to rounds) {
      val syms = filter(split(col("sym"), "·"), x => x =!= "")
      val top = vocab.select(syms.as("ss"), col("cnt"))
        .filter(size(col("ss")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("ss")) - 1), i =>
          struct(element_at(col("ss"), i).as("a"),
            element_at(col("ss"), i + 1).as("b")))).as("pr"), col("cnt"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("cnt")).as("pcnt"))
        .orderBy(col("pcnt").desc, col("a"), col("b")).limit(1)
        .collect()(0)
      val (a, b, c) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r.toLong, a, b, c))
      def rp(e: String) = s"replace($e, '·${a}·${b}·', '·${a}${b}·')"
      vocab = vocab.select(expr(rp(rp(rp("sym")))).as("sym"), col("cnt"))
    }
    words.unpersist()
    s.createDataFrame(merges.toSeq)
      .toDF("rnd", "left_sym", "right_sym", "cnt")
      .orderBy(col("rnd"))
  }

  val txtBpeTrainSql: String = {
    val symsOf = "list_filter(string_split(sym, '·'), x -> x <> '')"
    def pairCte(v: String) =
      s"""SELECT pr.a AS a, pr.b AS b, CAST(SUM(cnt) AS BIGINT) AS pcnt FROM (
         |    SELECT unnest(list_transform(range(1, len($symsOf)), i ->
         |      struct_pack(a := ($symsOf)[i], b := ($symsOf)[i+1]))) AS pr, cnt
         |    FROM $v) GROUP BY 1, 2""".stripMargin
    def mergeCte(v: String, t: String) = {
      val r1 = s"replace(sym, '·'||a||'·'||b||'·', '·'||a||b||'·')"
      val r2 = s"replace($r1, '·'||a||'·'||b||'·', '·'||a||b||'·')"
      val r3 = s"replace($r2, '·'||a||'·'||b||'·', '·'||a||b||'·')"
      s"SELECT $r3 AS sym, cnt FROM $v CROSS JOIN $t"
    }
    s"""WITH wc AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
       |    FROM documents) GROUP BY w
       |), v0 AS (
       |  SELECT '·' || array_to_string(regexp_extract_all(w, '.'), '·') || '·'
       |    AS sym, cnt FROM wc
       |), p1 AS (${pairCte("v0")}
       |), t1 AS (SELECT a, b, pcnt FROM p1 ORDER BY pcnt DESC, a, b LIMIT 1
       |), v1 AS (${mergeCte("v0", "t1")}
       |), p2 AS (${pairCte("v1")}
       |), t2 AS (SELECT a, b, pcnt FROM p2 ORDER BY pcnt DESC, a, b LIMIT 1
       |), v2 AS (${mergeCte("v1", "t2")}
       |), p3 AS (${pairCte("v2")}
       |), t3 AS (SELECT a, b, pcnt FROM p3 ORDER BY pcnt DESC, a, b LIMIT 1
       |)
       |SELECT CAST(1 AS BIGINT) AS rnd, a AS left_sym, b AS right_sym,
       |  pcnt AS cnt FROM t1
       |UNION ALL SELECT CAST(2 AS BIGINT), a, b, pcnt FROM t2
       |UNION ALL SELECT CAST(3 AS BIGINT), a, b, pcnt FROM t3
       |ORDER BY rnd""".stripMargin
  }

  /** Tokenize the corpus with the learned BPE merge table — the consumer
    * half of [[txtBpeTrain]]: per document, the token count, the
    * pre-merge symbol count (= characters), the post-merge symbol count
    * under the 3 learned merges applied in training order, and the
    * symbols saved. This is the number a tokenizer change is judged by
    * (bytes-per-token compression), computed with the exact same
    * boundary-marked replace chain as training.
    *
    * Scale: training's merge table collects to the driver (3 rows) and
    * re-enters the plan as literals; the application pass is one
    * map-side explode + doc-keyed map-combined aggregation — no new
    * shuffle shape beyond txt_tokens. */
  def txtBpeApply(s: SparkSession, dir: String): DataFrame = {
    val merges = txtBpeTrain(s, dir).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1).replace("'", "''"),
        r.getString(2).replace("'", "''")))
    val chain = merges.foldLeft("sym") { case (e, (a, b)) =>
      val one = (x: String) => s"replace($x, '·${a}·${b}·', '·${a}${b}·')"
      one(one(one(e)))
    }
    docs(s, dir)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("w"))
      .select(col("doc_id"), length(col("w")).cast("long").as("n_chars"),
        concat(lit("·"),
          array_join(regexp_extract_all(col("w"), lit("."), lit(0)), "·"),
          lit("·")).as("sym"))
      .select(col("doc_id"), col("n_chars"),
        size(filter(split(expr(chain), "·"), x => x =!= ""))
          .cast("long").as("n_sym"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("n_chars")).as("n_sym0"),
        sum(col("n_sym")).as("n_bpe"),
        (sum(col("n_chars")) - sum(col("n_sym"))).as("saved"))
      .orderBy(col("doc_id"))
  }

  val txtBpeApplySql: String = {
    val trainPrefix = txtBpeTrainSql
      .substring(txtBpeTrainSql.indexOf("WITH "), txtBpeTrainSql.indexOf("\nSELECT CAST(1"))
    def applyCte(v: String, t: String) = {
      val r1 = s"replace(sym, '·'||a||'·'||b||'·', '·'||a||b||'·')"
      val r2 = s"replace($r1, '·'||a||'·'||b||'·', '·'||a||b||'·')"
      val r3 = s"replace($r2, '·'||a||'·'||b||'·', '·'||a||b||'·')"
      s"SELECT doc_id, n_chars, $r3 AS sym FROM $v CROSS JOIN $t"
    }
    s"""$trainPrefix, tok AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
       |  FROM documents
       |), sym0 AS (
       |  SELECT doc_id, CAST(length(w) AS BIGINT) AS n_chars,
       |    '·' || array_to_string(regexp_extract_all(w, '.'), '·') || '·' AS sym
       |  FROM tok
       |), a1 AS (${applyCte("sym0", "t1")}
       |), a2 AS (${applyCte("a1", "t2")}
       |), a3 AS (${applyCte("a2", "t3")}
       |)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_sym0,
       |  CAST(SUM(len(list_filter(string_split(sym, '·'), x -> x <> '')))
       |    AS BIGINT) AS n_bpe,
       |  CAST(SUM(n_chars) - SUM(len(list_filter(string_split(sym, '·'),
       |    x -> x <> ''))) AS BIGINT) AS saved
       |FROM a3 GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------ behavioral sequence build
  /** Event-stream → training-sequence assembly: per user, the first
    * `maxLen` events in (ts, event_id) order joined into one
    * space-separated event-type string — the sequence-model data-prep
    * step (next-event prediction / behavioral LM) that turns the raw
    * event log into examples. Emits (user_id, n_events, seq_len, seq).
    *
    * Scale: the per-user rank filter sits directly on row_number so
    * WindowGroupLimit caps each user at maxLen rows PER MAP TASK before
    * the shuffle; the collect_list then aggregates BOUNDED (≤ maxLen)
    * state per user — never a whole activity history. One user-keyed
    * shuffle shared by the rank and the count. */
  def evtSequences(s: SparkSession, dir: String, maxLen: Int = 32): DataFrame = {
    val e = Tables.load(s, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    e.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxLen)
      .groupBy(col("user_id"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        x => x.getField("event_type"))).as("seq"),
        count(lit(1)).as("seq_len"))
      .join(counts, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("seq_len"), col("seq"))
      .orderBy(col("user_id"))
  }

  val evtSequencesSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(LEAST(COUNT(*), 32) AS BIGINT) AS seq_len,
      |  array_to_string((list(event_type ORDER BY ts, event_id))[1:32], ' ') AS seq
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------- behavioral transition matrix
  /** First-order Markov transition matrix over per-user event sequences:
    * order each user's events by (ts, event_id), pair each event with its
    * predecessor, and report per (prev_type, next_type) the transition
    * count and conditional probability p(next|prev). The behavioral-data
    * complement of [[evtSequences]] — the sequence assembly makes training
    * examples, this makes the sanity report you read BEFORE training on
    * them (degenerate corpora show near-diagonal or near-uniform rows).
    *
    * Scale: one user-keyed shuffle for the lag window (the same
    * partitioning [[evtSequences]] uses — co-scheduled if both run); the
    * pair counts map-combine to a |types|² frame, and the conditional
    * normalization windows over THAT model-sized frame, not the event
    * log. Nothing downstream of the first agg is corpus-sized. */
  def evtTransitions(s: SparkSession, dir: String): DataFrame = {
    // TIME-BANDED two-phase form (r16 verdict #1): the one-window form
    // (kept as [[evtTransitionsDirect]], the spec cross-check twin) sorts
    // each user's full history on one reducer — a hot user holding 30% of
    // the stream concentrates the sort on one task. Banding event time
    // into the lag window's key splits that into per-(user, band) sort
    // units; the only pairs the in-band lag misses are the ONE pair per
    // consecutive non-empty band (last event of band b, first of band
    // b+1), recovered from a per-user pass over the model-sized band
    // frame. Adjacency is total: in-band lag pairs + boundary pairs =
    // exactly the (n−1) consecutive pairs of the unbanded order, so the
    // transition counts (and the oracle hash) are unchanged.
    val bandUs = 6L * 3600 * 1000000L
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("band", floor(col("us") / bandUs))
    val wb = Window.partitionBy(col("user_id"), col("band"))
      .orderBy(col("us"), col("event_id"))
    val inBand = e
      .withColumn("prev_type", lag(col("event_type"), 1).over(wb))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    // boundary pairs: (us, event_id) is the lag's sort key, so the band's
    // first/last EVENT is the struct-min/max over that key with the type
    // riding as payload — map-combined, never a second full sort
    val perBand = e.groupBy(col("user_id"), col("band"))
      .agg(min(struct(col("us"), col("event_id"), col("event_type"))).as("f"),
        max(struct(col("us"), col("event_id"), col("event_type"))).as("l"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("band"))
    val boundary = perBand
      .withColumn("prev_type", lag(col("l.event_type"), 1).over(wu))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("f.event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    val byPrev = Window.partitionBy(col("prev_type"))
    inBand.unionByName(boundary)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(sum(col("n_trans")).as("n_trans"))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        (round(col("n_trans").cast("double") /
          sum(col("n_trans")).over(byPrev).cast("double"), 6) + 0.0).as("p"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** The single-window form evtTransitions replaced for scale — the
    * banded form's spec cross-check twin. */
  def evtTransitionsDirect(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byPrev = Window.partitionBy(col("prev_type"))
    e.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        (round(col("n_trans").cast("double") /
          sum(col("n_trans")).over(byPrev).cast("double"), 6) + 0.0).as("p"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  val evtTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events
      |), pairs AS (
      |  SELECT prev_type, event_type AS next_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_trans
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT prev_type, next_type, n_trans,
      |  ROUND(CAST(n_trans AS DOUBLE)
      |    / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
      |    + 0.0 AS p
      |FROM pairs ORDER BY prev_type, next_type""".stripMargin

  // ------------------------------------------- event-value outlier scan
  /** Per-event-type z-score outliers over the `value` stream: events whose
    * value sits more than `zThr` sample standard deviations from their
    * type's mean — the instrumentation-bug / bot-burst screen run before
    * behavioral sequences ([[evtSequences]]) are trusted as training data.
    * Moments use the [[EmbeddingOps]] DECIMAL(30,15) discipline (exact,
    * order-free) with the same degenerate guards (n=1 → sd=0 → no
    * outliers; clamp the variance numerator at 0).
    *
    * Scale: ONE event-type-keyed shuffle; |types| is tiny so the windowed
    * moments are effectively a broadcast model — at extreme per-type
    * volume the same moments come from a map-combined groupBy + broadcast
    * join, verdict arithmetic unchanged. */
  def evtOutliers(s: SparkSession, dir: String, zThr: Double = 3.0): DataFrame = {
    // TWO-PASS form (r10): per-type moments as a map-combined |types|-row
    // aggregation ([[evtValueMoments]] — the exact frame the streaming
    // twin freezes), broadcast back, z computed map-side. The r9 one-pass
    // type-keyed WINDOW carried every event through a per-type sort and
    // was the heaviest evt_* shape at the 100× rung (14.2 s); the exact
    // DECIMAL sums are order-free, so groupBy ≡ window value-for-value
    // and the oracle hash is unchanged.
    // null-safe join: the SQL oracle's PARTITION BY keeps a NULL-type
    // partition, and evtValueMoments' groupBy emits a NULL-key moment
    // row — a plain equi-join would silently drop null-typed events
    val moments = evtValueMoments(s, dir).withColumnRenamed("event_type", "mt")
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(moments), col("event_type") <=> col("mt"))
      .drop("mt")
      .filter(col("sd") > 0.0 &&
        abs((col("value") - col("m")) / col("sd")) > zThr)
      .select(col("event_id"), col("event_type"), col("value"),
        (round((col("value") - col("m")) / col("sd"), 6) + 0.0).as("z"))
      .orderBy(col("event_id"))
  }

  /** Frozen per-type (mean, sd) model for [[evtOutliers]]' streaming twin:
    * the same DECIMAL-exact moments as the batch window, computed as a
    * map-combined groupBy so the result is a broadcastable |types|-row
    * frame (exact sums are order-free, so groupBy ≡ window value-wise). */
  private[graft] def evtValueMoments(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(30,15)"
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(sum(col("value").cast(dec)).cast("double").as("s1"),
        sum((col("value") * col("value")).cast(dec)).cast("double").as("s2"),
        count(lit(1)).cast("double").as("n"))
      .select(col("event_type"), (col("s1") / col("n")).as("m"),
        when(col("n") > 1.0,
          sqrt(greatest((col("s2") - col("s1") * col("s1") / col("n")) /
            (col("n") - 1.0), lit(0.0)))).otherwise(lit(0.0)).as("sd"))
  }

  val evtOutliersSql: String =
    """WITH m AS (
      |  SELECT event_id, event_type, value,
      |    CAST(SUM(CAST(value AS DECIMAL(30,15)))
      |      OVER (PARTITION BY event_type) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(value * value AS DECIMAL(30,15)))
      |      OVER (PARTITION BY event_type) AS DOUBLE) AS s2,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n
      |  FROM events
      |), z AS (
      |  SELECT event_id, event_type, value, s1 / n AS mn,
      |    CASE WHEN n > 1.0 THEN
      |      sqrt(GREATEST((s2 - s1 * s1 / n) / (n - 1.0), 0.0))
      |    ELSE 0.0 END AS sd
      |  FROM m
      |)
      |SELECT event_id, event_type, value,
      |  ROUND((value - mn) / sd, 6) + 0.0 AS z
      |FROM z
      |WHERE sd > 0.0 AND ABS((value - mn) / sd) > 3.0
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------- hourly activity profile
  /** Hour-of-day activity profile per event type: event counts and
    * within-type share for each UTC hour — the bot/batch-job screen on
    * behavioral data (organic traffic has a diurnal curve; a near-uniform
    * or single-spike hourly profile flags machine traffic whose sequences
    * [[evtSequences]] should not treat as human examples). Sessions run
    * in UTC so `hour(ts)` is engine-portable.
    *
    * Scale: one map pass + a (type, hour)-keyed map-combined count; the
    * share normalizes over the ≤ 24·|types| model frame. */
  def evtHourlyProfile(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    Tables.load(s, dir, "events")
      .select(col("event_type"), hour(col("ts")).cast("long").as("hh"))
      .groupBy(col("event_type"), col("hh"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("hh"), col("n_events"),
        (round(col("n_events").cast("double") /
          sum(col("n_events")).over(byType).cast("double"), 6) + 0.0)
          .as("share"))
      .orderBy(col("event_type"), col("hh"))
  }

  val evtHourlyProfileSql: String =
    """WITH c AS (
      |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hh,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, hh, n_events,
      |  ROUND(CAST(n_events AS DOUBLE)
      |    / CAST(SUM(n_events) OVER (PARTITION BY event_type) AS DOUBLE), 6)
      |    + 0.0 AS share
      |FROM c ORDER BY event_type, hh""".stripMargin

  // ------------------------------------------ engagement distribution
  /** User-activity histogram: users bucketed by floor(log2(n_events)) —
    * the engagement power-law read (how heavy is the heavy tail) that
    * decides whether [[evtSequences]]' per-user cap and the per-user
    * shuffle need skew handling. Integer-exact buckets via bit length.
    *
    * Scale: one user-keyed map-combined count, then a log-bucket rollup
    * over the |users| frame. */
  def evtActivityHist(s: SparkSession, dir: String): DataFrame = {
    // floor(log2(n)) spelled as integer arithmetic: length of the binary
    // representation minus 1 — no floating log whose boundary could
    // diverge between engines
    val lg = (length(conv(col("n_events").cast("string"), 10, 2)) - 1)
      .cast("long")
    Tables.load(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .select(lg.as("log2_bucket"), col("n_events"))
      .groupBy(col("log2_bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"))
      .orderBy(col("log2_bucket"))
  }

  val evtActivityHistSql: String =
    """WITH c AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1
      |)
      |SELECT CAST(length(bin(n_events)) - 1 AS BIGINT) AS log2_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------- cadence regularity
  /** Per-user inter-arrival cadence: mean gap and coefficient of
    * variation (std/mean) over consecutive event gaps in (ts, event_id)
    * order — the metronome detector (organic users are bursty, cv ≳ 1;
    * schedulers and bots tick, cv ≈ 0), read next to
    * [[evtHourlyProfile]] before trusting a user's sequences as human
    * examples. Gap moments use the DECIMAL discipline with the
    * [[evtOutliers]] degenerate guards; users need ≥ 2 gaps to emit.
    *
    * Scale: ONE user-keyed shuffle shared by the lag window and the
    * moment aggregation. */
  def evtCadence(s: SparkSession, dir: String): DataFrame = {
    // TIME-BANDED two-phase form (r16 verdict #1, same discipline as
    // [[evtTransitions]]): per-(user, band) lag gaps + one boundary gap
    // per consecutive non-empty band, combined by a per-user pass over the
    // model-sized band frame. The gap multiset equals the unbanded form's
    // exactly, and the DECIMAL(30,15) element casts + exact decimal sums
    // are order-free, so s1/s2 (and the oracle hash) are bit-identical.
    val bandUs = 6L * 3600 * 1000000L
    val dec = "decimal(30,15)"
    val dec38 = "decimal(38,15)" // sum(decimal(30,15)) widens to 38,15
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("band", floor(col("us") / bandUs))
    val wb = Window.partitionBy(col("user_id"), col("band"))
      .orderBy(col("us"), col("event_id"))
    // moments in SECONDS: a µs gap squared overflows DECIMAL(30,15)'s
    // 15 integer digits (day-scale gaps → 1e20); cv is scale-invariant
    val perBand = e
      .withColumn("gap",
        (col("us") - lag(col("us"), 1).over(wb)).cast("double") / 1000000.0)
      .groupBy(col("user_id"), col("band"))
      .agg(count(col("gap")).as("n"),
        sum(col("gap").cast(dec)).as("s1"),
        sum((col("gap") * col("gap")).cast(dec)).as("s2"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("band"))
    val boundary = perBand
      .withColumn("prev_last", lag(col("last_us"), 1).over(wu))
      .filter(col("prev_last").isNotNull)
      .withColumn("gap",
        (col("first_us") - col("prev_last")).cast("double") / 1000000.0)
      .select(col("user_id"), lit(1L).as("n"),
        col("gap").cast(dec).cast(dec38).as("s1"),
        (col("gap") * col("gap")).cast(dec).cast(dec38).as("s2"))
    perBand.select(col("user_id"), col("n"), col("s1"), col("s2"))
      .unionByName(boundary)
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_gaps"),
        sum(col("s1")).cast("double").as("s1"),
        sum(col("s2")).cast("double").as("s2"))
      .filter(col("n_gaps") >= 2)
      .select(col("user_id"), col("n_gaps"),
        (col("s1") / col("n_gaps")).as("m"),
        sqrt(greatest((col("s2") - col("s1") * col("s1") / col("n_gaps")) /
          (col("n_gaps") - 1).cast("double"), lit(0.0))).as("sd"))
      .select(col("user_id"), col("n_gaps"),
        (round(col("m"), 6) + 0.0).as("mean_gap_s"),
        (round(when(col("m") > 0.0, col("sd") / col("m")).otherwise(0.0), 6)
          + 0.0).as("cv"))
      .orderBy(col("user_id"))
  }

  /** The single-window form evtCadence replaced for scale — the banded
    * form's spec cross-check twin. */
  def evtCadenceDirect(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dec = "decimal(30,15)"
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap",
        (col("us") - lag(col("us"), 1).over(w)).cast("double") / 1000000.0)
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap").cast(dec)).cast("double").as("s1"),
        sum((col("gap") * col("gap")).cast(dec)).cast("double").as("s2"))
      .filter(col("n_gaps") >= 2)
      .select(col("user_id"), col("n_gaps"),
        (col("s1") / col("n_gaps")).as("m"),
        sqrt(greatest((col("s2") - col("s1") * col("s1") / col("n_gaps")) /
          (col("n_gaps") - 1).cast("double"), lit(0.0))).as("sd"))
      .select(col("user_id"), col("n_gaps"),
        (round(col("m"), 6) + 0.0).as("mean_gap_s"),
        (round(when(col("m") > 0.0, col("sd") / col("m")).otherwise(0.0), 6)
          + 0.0).as("cv"))
      .orderBy(col("user_id"))
  }

  val evtCadenceSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    CAST(epoch_us(ts) - lag(epoch_us(ts))
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
      |      / 1000000.0 AS gap
      |  FROM events
      |), m AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |    CAST(SUM(CAST(gap AS DECIMAL(30,15))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(gap * gap AS DECIMAL(30,15))) AS DOUBLE) AS s2
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1
      |), z AS (
      |  SELECT user_id, n_gaps, s1 / n_gaps AS mn,
      |    sqrt(GREATEST((s2 - s1 * s1 / n_gaps)
      |      / CAST(n_gaps - 1 AS DOUBLE), 0.0)) AS sd
      |  FROM m WHERE n_gaps >= 2
      |)
      |SELECT user_id, n_gaps,
      |  ROUND(mn, 6) + 0.0 AS mean_gap_s,
      |  ROUND(CASE WHEN mn > 0.0 THEN sd / mn ELSE 0.0 END, 6) + 0.0 AS cv
      |FROM z ORDER BY user_id""".stripMargin

  // ---------------------------------------------- value profile table
  /** Per-type value profile: n / mean / sd / min / max of the `value`
    * stream per event type — the compact report [[evtOutliers]] derives
    * its thresholds from, emitted as a table so dashboards and drift
    * checks read the SAME moments the outlier screen uses (identical
    * DECIMAL spelling and degenerate guards). */
  def evtValueProfile(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(30,15)"
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("s1"),
        sum((col("value") * col("value")).cast(dec)).cast("double").as("s2"),
        (round(min(col("value")), 6) + 0.0).as("min_value"),
        (round(max(col("value")), 6) + 0.0).as("max_value"))
      .select(col("event_type"), col("n_events"),
        (round(col("s1") / col("n_events"), 6) + 0.0).as("mean_value"),
        (round(when(col("n_events") > 1,
          sqrt(greatest((col("s2") - col("s1") * col("s1") / col("n_events")) /
            (col("n_events") - 1).cast("double"), lit(0.0))))
          .otherwise(0.0), 6) + 0.0).as("sd_value"),
        col("min_value"), col("max_value"))
      .orderBy(col("event_type"))
  }

  val evtValueProfileSql: String =
    """WITH m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(30,15))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(value * value AS DECIMAL(30,15))) AS DOUBLE) AS s2,
      |    ROUND(MIN(value), 6) + 0.0 AS min_value,
      |    ROUND(MAX(value), 6) + 0.0 AS max_value
      |  FROM events GROUP BY 1
      |)
      |SELECT event_type, n_events,
      |  ROUND(s1 / n_events, 6) + 0.0 AS mean_value,
      |  ROUND(CASE WHEN n_events > 1 THEN
      |    sqrt(GREATEST((s2 - s1 * s1 / n_events)
      |      / CAST(n_events - 1 AS DOUBLE), 0.0)) ELSE 0.0 END, 6) + 0.0
      |    AS sd_value,
      |  min_value, max_value
      |FROM m ORDER BY event_type""".stripMargin

  // -------------------------------------------- sessionization sweep
  /** Session-gap threshold sweep: total session count and mean
    * events-per-session at a ladder of inactivity gaps (15 m / 30 m /
    * 60 m) — how you PICK the [[graft.operators.RelationalQueries
    * .q38Sessionize]] gap: the knee where halving the threshold stops
    * splitting sessions. One lag pass computes every per-user gap; each
    * ladder rung is a conditional count over the same frame (sessions =
    * users + gaps-exceeding-threshold — the textbook identity).
    *
    * Scale: ONE user-keyed lag shuffle; the sweep is three conditional
    * sums in one map-combined aggregation. */
  def evtGapSweep(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val thrs = Seq(900L, 1800L, 3600L)
    val g = Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
    val aggs = countDistinct(col("user_id")).as("nu") +:
      count(lit(1)).as("ne") +:
      thrs.map(t => sum(when(col("gap") > t * 1000000L, 1L).otherwise(0L))
        .as(s"c$t"))
    val a = g.agg(aggs.head, aggs.tail: _*)
    val entries = thrs.map { t =>
      struct(lit(t).as("gap_s"), (col("nu") + col(s"c$t")).as("n_sessions"),
        col("ne").as("ne"))
    }
    a.select(explode(array(entries: _*)).as("e"))
      .select(col("e.gap_s").as("gap_s"), col("e.n_sessions").as("n_sessions"),
        (round(col("e.ne").cast("double") / col("e.n_sessions"), 6) + 0.0)
          .as("events_per_session"))
      .orderBy(col("gap_s"))
  }

  val evtGapSweepSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts))
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      |  FROM events
      |), m AS (
      |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu,
      |    CAST(COUNT(*) AS BIGINT) AS ne,
      |    CAST(SUM(CASE WHEN gap > 900000000 THEN 1 ELSE 0 END) AS BIGINT) AS c900,
      |    CAST(SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS c1800,
      |    CAST(SUM(CASE WHEN gap > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS c3600
      |  FROM g
      |)
      |SELECT CAST(t.gap_s AS BIGINT) AS gap_s,
      |  CAST(nu + CASE t.gap_s WHEN 900 THEN c900 WHEN 1800 THEN c1800
      |    ELSE c3600 END AS BIGINT) AS n_sessions,
      |  ROUND(CAST(ne AS DOUBLE) / (nu + CASE t.gap_s WHEN 900 THEN c900
      |    WHEN 1800 THEN c1800 ELSE c3600 END), 6) + 0.0
      |    AS events_per_session
      |FROM m CROSS JOIN (SELECT unnest([900, 1800, 3600]) AS gap_s) t
      |ORDER BY gap_s""".stripMargin

  // -------------------------------------------- behavioral drift audit
  /** Early-vs-late behavioral drift: split the event log at the midpoint
    * of its time range and report each event type's within-half share on
    * both sides plus the delta — the distribution-shift screen run before
    * treating months of behavioral data as one stationary corpus (a type
    * whose share moved says the product, the users, or the
    * instrumentation changed mid-window). Midpoint and half-assignment
    * are integer epoch-µs arithmetic, engine-exact.
    *
    * Scale: one map pass + a |types|-row map-combined agg; the global
    * min/max crosses as a broadcast scalar. */
  def evtDrift(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val range = e.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val wAll = Window.partitionBy()
    e.crossJoin(broadcast(range))
      .select(col("event_type"),
        when(col("us") <= (col("lo") + col("hi")) / 2, 1L).otherwise(0L)
          .as("early"))
      .groupBy(col("event_type"))
      .agg(sum(col("early")).as("n_early"),
        sum(lit(1L) - col("early")).as("n_late"))
      .withColumn("tot_early", sum(col("n_early")).over(wAll))
      .withColumn("tot_late", sum(col("n_late")).over(wAll))
      .select(col("event_type"), col("n_early"), col("n_late"),
        (round(col("n_early").cast("double") / col("tot_early"), 6) + 0.0)
          .as("share_early"),
        (round(col("n_late").cast("double") / col("tot_late"), 6) + 0.0)
          .as("share_late"),
        (round(col("n_late").cast("double") / col("tot_late") -
          col("n_early").cast("double") / col("tot_early"), 6) + 0.0)
          .as("drift"))
      .orderBy(col("event_type"))
  }

  val evtDriftSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS us FROM events
      |), r AS (
      |  SELECT MIN(us) AS lo, MAX(us) AS hi FROM e
      |), flagged AS (
      |  SELECT event_type,
      |    CASE WHEN us <= (lo + hi) // 2 THEN 1 ELSE 0 END AS early
      |  FROM e CROSS JOIN r
      |), c AS (
      |  SELECT event_type, CAST(SUM(early) AS BIGINT) AS n_early,
      |    CAST(SUM(1 - early) AS BIGINT) AS n_late
      |  FROM flagged GROUP BY 1
      |), t AS (
      |  SELECT event_type, n_early, n_late,
      |    SUM(n_early) OVER () AS tot_early, SUM(n_late) OVER () AS tot_late
      |  FROM c
      |)
      |SELECT event_type, n_early, n_late,
      |  ROUND(CAST(n_early AS DOUBLE) / tot_early, 6) + 0.0 AS share_early,
      |  ROUND(CAST(n_late AS DOUBLE) / tot_late, 6) + 0.0 AS share_late,
      |  ROUND(CAST(n_late AS DOUBLE) / tot_late
      |    - CAST(n_early AS DOUBLE) / tot_early, 6) + 0.0 AS drift
      |FROM t ORDER BY event_type""".stripMargin

  // ------------------------------------------------- corpus summary row
  /** One-row corpus dashboard header: doc/token/source/language counts,
    * the exact-duplicate share, and mean doc length — the numbers every
    * pipeline report leads with, computed in two passes (one over docs,
    * one fingerprint-keyed window for the dup share) so the row is cheap
    * enough to run on every ingest.
    *
    * Scale: the profile agg is map-combined; the dup share reuses the
    * [[graft.operators.SamplingOps.sampSoftDedup]] window shape. */
  def pipeSummary(s: SparkSession, dir: String): DataFrame = {
    val wfp = Window.partitionBy(col("fp"))
    val base = docs(s, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        tokenCount(col("text")).as("n_tokens"),
        fingerprint(col("text")).as("fp"))
      .withColumn("n_copies", count(lit(1)).over(wfp))
    base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
      (round(avg(col("n_tokens").cast("double")), 6) + 0.0)
        .as("mean_tokens"))
  }

  val pipeSummarySql: String =
    """WITH f AS (
      |  SELECT doc_id, source, lang,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS fp
      |  FROM documents
      |), m AS (
      |  SELECT *, COUNT(*) OVER (PARTITION BY fp) AS n_copies FROM f
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_docs,
      |  ROUND(AVG(CAST(n_tokens AS DOUBLE)), 6) + 0.0 AS mean_tokens
      |FROM m""".stripMargin

  // ------------------------------------------------- user feature table
  /** Per-user behavioral feature vector from the event log: activity
    * volume, type diversity, active-span days, and value moments — the
    * feature-engineering table a behavioral model trains on (and the join
    * key side for [[evtSequences]]' examples). Value mean routes through
    * a DECIMAL sum; span uses integer epoch-day arithmetic so both
    * engines agree exactly.
    *
    * Scale: ONE user-keyed map-combined aggregation; every output is a
    * scalar per user. */
  def evtUserProfiles(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(30,15)"
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        (unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        (max(col("day")) - min(col("day")) + 1).as("span_days"),
        (round(sum(col("value").cast(dec)).cast("double") /
          count(lit(1)), 6) + 0.0).as("mean_value"),
        (round(max(col("value")), 6) + 0.0).as("max_value"))
      .orderBy(col("user_id"))
  }

  val evtUserProfilesSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(MAX(epoch_us(ts) // 86400000000) -
      |       MIN(epoch_us(ts) // 86400000000) + 1 AS BIGINT) AS span_days,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(30,15))) AS DOUBLE)
      |    / COUNT(*), 6) + 0.0 AS mean_value,
      |  ROUND(MAX(value), 6) + 0.0 AS max_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- k-fold splits
  /** Deterministic k-fold assignment for cross-validation: fold =
    * md5-derived uniform bucket of doc_id (the [[dsSplit]] entropy
    * discipline — replayable on any engine, no rand()), with per-fold
    * size and token accounting. Emits one row per (fold) with counts —
    * the fold-balance report; the assignment itself is the deterministic
    * expression any consumer re-derives inline.
    *
    * Scale: one map pass + a k-row map-combined agg. */
  def dsKfold(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val fold = pmod(conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 8), 16, 10).cast("long"), lit(k.toLong))
    docs(s, dir)
      .select(fold.as("fold"), tokenCount(col("text")).as("n_tokens"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("fold"))
  }

  val dsKfoldSql: String =
    s"""SELECT CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |    AS BIGINT) % 5 AS BIGINT) AS fold,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
       |    AS n_tokens
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------- collocation mining
  /** Adjacent-pair collocations by pointwise mutual information:
    * `pmi = ln(n_ab · N / (n_a · n_b))` over lowercased adjacent token
    * pairs with support ≥ `minCount`, top-`top` by (pmi desc, pair) — the
    * classic collocation/multi-word-expression miner (phrase vocab for a
    * tokenizer, or template detection when pmi is implausibly high).
    *
    * Scale: pair counts and unigram counts both map-combine; the PMI join
    * is vocabulary-keyed twice; the global top-k is a TakeOrdered head
    * over the SURVIVOR frame (support-filtered, vocabulary-bounded) —
    * per-partition heaps, no global sort — and only the ≤`top`-row head
    * is ever ranked. */
  def txtCollocations(s: SparkSession, dir: String, minCount: Int = 5,
      top: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toked = docs(s, dir)
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
    val pairs = toked
      .select(col("toks"), posexplode(col("toks")).as(Seq("p", "w1")))
      .filter(col("p") < size(col("toks")) - 1)
      .select(col("w1"), element_at(col("toks"), col("p") + 2).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val uni = toked.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = uni.agg(sum(col("n")).as("nn"))
    // top-k FIRST (orderBy+limit → TakeOrderedAndProject: per-partition
    // heads merged, never a global sort), THEN rank the ≤`top`-row head —
    // the txt_vocab idiom; the two-phase rank keeps even the head ranking
    // off the unpartitioned-window path
    val scored = pairs
      .join(uni.select(col("w").as("w1"), col("n").as("n_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n_ab"),
        (round(log(col("n_ab").cast("double") * col("nn").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))), 6) + 0.0)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(top)
    val report = Ranking
      .twoPhaseRank(scored, "rank", 1, col("pmi").desc, col("w1"), col("w2"))
      .select(col("rank"), col("w1"), col("w2"), col("n_ab"), col("pmi"))
      .orderBy(col("rank"))
      .localCheckpoint()
    uni.unpersist()
    report
  }

  val txtCollocationsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |), prs AS (
      |  SELECT t[i] AS w1, t[i+1] AS w2
      |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2)
      |), pc AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM prs GROUP BY 1, 2 HAVING COUNT(*) >= 5
      |), uni AS (
      |  SELECT unnest(t) AS w FROM toks
      |), uc AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM uni GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS nn FROM uc
      |), scored AS (
      |  SELECT w1, w2, n_ab,
      |    ROUND(ln(CAST(n_ab AS DOUBLE) * CAST(nn AS DOUBLE)
      |      / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE))), 6) + 0.0 AS pmi
      |  FROM pc JOIN uc a ON pc.w1 = a.w JOIN uc b ON pc.w2 = b.w
      |  CROSS JOIN tot
      |)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT)
      |    AS rank,
      |  w1, w2, n_ab, pmi
      |FROM scored
      |QUALIFY rank <= 20
      |ORDER BY rank""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_sequences" -> ((s: SparkSession, d: String) => evtSequences(s, d)),
    "pipe_summary" -> (pipeSummary _),
    "evt_user_profiles" -> (evtUserProfiles _),
    "ds_kfold" -> ((s: SparkSession, d: String) => dsKfold(s, d)),
    "txt_collocations" -> ((s: SparkSession, d: String) => txtCollocations(s, d)),
    "evt_drift" -> (evtDrift _),
    "evt_activity_hist" -> (evtActivityHist _),
    "evt_cadence" -> (evtCadence _),
    "evt_gap_sweep" -> (evtGapSweep _),
    "evt_value_profile" -> (evtValueProfile _),
    "evt_transitions" -> (evtTransitions _),
    "evt_outliers" -> ((s: SparkSession, d: String) => evtOutliers(s, d)),
    "evt_hourly_profile" -> (evtHourlyProfile _),
    "txt_bpe_apply" -> ((s: SparkSession, d: String) => txtBpeApply(s, d)),
    "txt_bpe_train" -> ((s: SparkSession, d: String) => txtBpeTrain(s, d)),
    "txt_quality_cal" -> (txtQualityCal _),
    "pipe_curate" -> (pipeCurate _),
    "pipe_integrity" -> (pipeIntegrity _),
    "txt_repetition" -> (txtRepetition _),
    "ds_split" -> (dsSplit _),
    "ds_split_leakage" -> (dsSplitLeakage _),
    "txt_tfidf" -> ((s: SparkSession, d: String) => txtTfidf(s, d)),
    "txt_funnel" -> (txtFunnel _),
    "txt_chunks" -> ((s: SparkSession, d: String) => txtChunks(s, d)),
    "dd_chunk_dups" -> (ddChunkDups _),
    "txt_pack" -> ((s: SparkSession, d: String) => txtPack(s, d)),
    "txt_cdc_chunks" -> (txtCdcChunks _),
  )

  val oracles: Map[String, String] = Map(
    "evt_sequences" -> evtSequencesSql,
    "evt_transitions" -> evtTransitionsSql,
    "evt_outliers" -> evtOutliersSql,
    "evt_hourly_profile" -> evtHourlyProfileSql,
    "pipe_summary" -> pipeSummarySql,
    "evt_user_profiles" -> evtUserProfilesSql,
    "ds_kfold" -> dsKfoldSql,
    "txt_collocations" -> txtCollocationsSql,
    "evt_drift" -> evtDriftSql,
    "evt_activity_hist" -> evtActivityHistSql,
    "evt_cadence" -> evtCadenceSql,
    "evt_gap_sweep" -> evtGapSweepSql,
    "evt_value_profile" -> evtValueProfileSql,
    "txt_bpe_apply" -> txtBpeApplySql,
    "txt_bpe_train" -> txtBpeTrainSql,
    "txt_quality_cal" -> txtQualityCalSql,
    "pipe_curate" -> pipeCurateSql,
    "pipe_integrity" -> pipeIntegritySql,
    "txt_repetition" -> txtRepetitionSql,
    "ds_split" -> dsSplitSql,
    "ds_split_leakage" -> dsSplitLeakageSql,
    "txt_tfidf" -> txtTfidfSql,
    "txt_funnel" -> txtFunnelSql,
    "txt_chunks" -> txtChunksSql,
    "dd_chunk_dups" -> ddChunkDupsSql,
    "txt_pack" -> txtPackSql,
    "txt_cdc_chunks" -> txtCdcChunksSql,
  )
}
