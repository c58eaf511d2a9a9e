package graft.operators

import graft.Tables
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-column analytics for data curation: per-label centroids and
  * nearest-centroid assignment (the E-step of k-means / the "cluster, then
  * sample per cluster" curation recipe).
  *
  * Float sums are order-dependent; every mean here routes through an exact
  * DECIMAL sum (float → double cast is exact, double → DECIMAL(30,15) is
  * one deterministic rounding) so Spark's partial-aggregation order and the
  * oracle's sequential order produce the identical value — then ONE cast
  * back to double. Never emit DECIMAL output columns (driver-hasher
  * canonicalization differs between pyarrow and duckdb-pandas).
  */
object EmbeddingOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.loadFan(s, dir, "embeddings", "vec_id")

  /** (label, dim, value) centroid components, exact-sum mean. */
  private def centroidRows(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("x").cast("double").cast("decimal(30,15)")).cast("double") /
        count(lit(1)).cast("double")).as("c_raw"))

  /** Assemble per-key centroid VECTORS from rounded components — the
    * determinism-critical sort/round/norm sequence, shared by every
    * consumer (assignment, k-means, outliers) so a rounding-discipline
    * change can't silently diverge between them. Emits (keyCol, cv, cnrm). */
  private def centroidVectors(comp: DataFrame, key: String): DataFrame =
    comp
      .select(col(key), col("dim"), round(col("c_raw"), 6).as("c"))
      .groupBy(col(key))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cv"))
      .withColumn("cnrm", VF.norm(col("cv")))

  // ------------------------------------------------------- label centroids
  /** Element-wise mean embedding per label.
    *
    * Scale: posexplode emits n·d rows but the (label, dim) aggregation is
    * map-side combined — the shuffle carries labels·d partial sums per map
    * task, not the corpus. Output is model-sized (labels·d rows). */
  def embCentroids(s: SparkSession, dir: String): DataFrame =
    centroidRows(emb(s, dir))
      .select(col("label"), col("dim"), round(col("c_raw"), 6).as("centroid"))
      .orderBy(col("label"), col("dim"))

  val embCentroidsSql: String =
    """WITH x AS (
      |  SELECT label,
      |    unnest(generate_series(1, len(embedding))) - 1 AS dim,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(30,15)) AS xd
      |  FROM embeddings
      |)
      |SELECT label, dim,
      |  ROUND(CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS centroid
      |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin

  // ------------------------------------------- nearest-centroid assignment
  /** Assign every vector to its nearest label centroid by cosine (k-means
    * E-step) and report the (true label, assigned label) confusion counts.
    *
    * Centroid components are rounded to 6 decimals BEFORE assignment on
    * both engines, so the cosine inputs are bit-identical and the argmax
    * decision can't diverge on a final-ulp difference; ties (none at
    * double precision here) break by centroid label.
    *
    * Scale: centroids are model state (labels·d doubles, a few KB) —
    * assembled per label and broadcast; assignment is a map-side
    * broadcast-join + codegen'd dot products; the confusion count is one
    * map-combined shuffle of labels² partials. No corpus shuffle at all. */
  def embAssign(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = centroidVectors(
      centroidRows(e).withColumnRenamed("label", "c_label"), "c_label")
    val vecs = e.select(col("vec_id"), col("label"),
        VF.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", VF.norm(col("ve")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_raw").desc, col("c_label"))
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("c_label"),
        (VF.dot(col("ve"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos_raw"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("label"), col("c_label").as("assigned"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("assigned"))
  }

  val embAssignSql: String =
    """WITH x AS (
      |  SELECT label,
      |    unnest(generate_series(1, len(embedding))) - 1 AS dim,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(30,15)) AS xd
      |  FROM embeddings
      |), comp AS (
      |  SELECT label AS c_label, dim,
      |    ROUND(CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS c
      |  FROM x GROUP BY label, dim
      |), cents AS (
      |  SELECT c_label, list(c ORDER BY dim) AS cv FROM comp GROUP BY c_label
      |), scored AS (
      |  SELECT e.vec_id, e.label, cents.c_label,
      |    list_dot_product(list_transform(e.embedding, v -> CAST(v AS DOUBLE)), cv)
      |      / (sqrt(list_dot_product(list_transform(e.embedding, v -> CAST(v AS DOUBLE)),
      |               list_transform(e.embedding, v -> CAST(v AS DOUBLE))))
      |         * sqrt(list_dot_product(cv, cv))) AS cos_raw
      |  FROM embeddings e CROSS JOIN cents
      |), best AS (
      |  SELECT vec_id, label, c_label,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_raw DESC, c_label) AS rn
      |  FROM scored
      |)
      |SELECT label, c_label AS assigned, COUNT(*) AS n_vecs
      |FROM best WHERE rn = 1
      |GROUP BY label, c_label ORDER BY label, assigned""".stripMargin

  // ----------------------------------------------------- outlier detection
  /** Embedding-space outlier report: each vector's cosine to its OWN label
    * centroid, z-scored against the label's cosine distribution; a vector
    * with z < −2 is flagged (mislabeled / out-of-distribution — the
    * embedding-side data-cleaning filter). Emits per-label moments and the
    * outlier count.
    *
    * Determinism: the z-score needs the label mean/std — both derived from
    * DECIMAL(30,15)-exact windowed sums of cos and cos², so every engine
    * computes the identical doubles regardless of aggregation order.
    *
    * Scale: centroids broadcast (model state); cos is a map-side codegen'd
    * dot; the moments are one label-keyed window shuffle; the report is
    * one |labels| aggregation. */
  def embOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = centroidVectors(centroidRows(e), "label")
    val scored = e.select(col("label"),
        VF.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", VF.norm(col("ve")))
      .join(broadcast(cents), Seq("label"))
      .select(col("label"),
        (VF.dot(col("ve"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos"))
    val wl = Window.partitionBy(col("label"))
    val dec = "decimal(30,15)"
    scored
      .withColumn("s1", sum(col("cos").cast(dec)).over(wl).cast("double"))
      .withColumn("s2", sum((col("cos") * col("cos")).cast(dec)).over(wl).cast("double"))
      .withColumn("n", count(lit(1)).over(wl).cast("double"))
      .withColumn("m", col("s1") / col("n"))
      // degenerate guards: a 1-vector label has no sample std (0/0), and a
      // zero-variance label's s2 - s1^2/n can round to a TINY NEGATIVE via
      // the DECIMAL casts (Spark sqrt -> NaN, the oracle engine ERRORS) -
      // clamp at 0 and define both degenerate cases as sd = 0, no outliers
      .withColumn("sd", when(col("n") > 1.0,
        sqrt(greatest((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n") - 1.0), lit(0.0)))).otherwise(lit(0.0)))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (round(min(col("m")), 6) + 0.0).as("mean_cos"),
        (round(min(col("sd")), 6) + 0.0).as("std_cos"),
        sum(when(col("sd") > 0.0 &&
          (col("cos") - col("m")) / col("sd") < -2.0, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("label"))
  }

  val embOutliersSql: String =
    """WITH x AS (
      |  SELECT label,
      |    unnest(generate_series(1, len(embedding))) - 1 AS dim,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(30,15)) AS xd
      |  FROM embeddings
      |), comp AS (
      |  SELECT label, dim,
      |    ROUND(CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS c
      |  FROM x GROUP BY label, dim
      |), cents AS (
      |  SELECT label, list(c ORDER BY dim) AS cv,
      |    sqrt(list_dot_product(list(c ORDER BY dim), list(c ORDER BY dim))) AS cnrm
      |  FROM comp GROUP BY label
      |), scored AS (
      |  SELECT e.label,
      |    list_dot_product(list_transform(e.embedding, v -> CAST(v AS DOUBLE)), cv)
      |      / (sqrt(list_dot_product(list_transform(e.embedding, v -> CAST(v AS DOUBLE)),
      |               list_transform(e.embedding, v -> CAST(v AS DOUBLE)))) * cnrm) AS cos
      |  FROM embeddings e JOIN cents ON e.label = cents.label
      |), m AS (
      |  SELECT label, cos,
      |    CAST(SUM(CAST(cos AS DECIMAL(30,15))) OVER (PARTITION BY label) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(cos * cos AS DECIMAL(30,15))) OVER (PARTITION BY label) AS DOUBLE) AS s2,
      |    CAST(COUNT(*) OVER (PARTITION BY label) AS DOUBLE) AS n
      |  FROM scored
      |), z AS (
      |  SELECT label, cos, s1 / n AS mean_c,
      |    CASE WHEN n > 1.0
      |      THEN sqrt(GREATEST((s2 - s1 * s1 / n) / (n - 1.0), 0.0))
      |      ELSE 0.0 END AS sd
      |  FROM m
      |)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(MIN(mean_c), 6) + 0.0 AS mean_cos,
      |  ROUND(MIN(sd), 6) + 0.0 AS std_cos,
      |  CAST(SUM(CASE WHEN sd > 0.0 AND (cos - mean_c) / sd < -2.0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM z GROUP BY label ORDER BY label""".stripMargin

  // --------------------------------------------------- k-means iterations
  /** Spherical k-means (cosine) with deterministic seeding: centroids start
    * at the `k` lowest vec_ids, then `iters` Lloyd steps (assign → exact-sum
    * recompute). Emits per-cluster size and mean cosine-to-centroid — the
    * cluster-then-sample curation recipe's model state.
    *
    * Determinism contract (so an unrolled SQL oracle can replay it):
    * centroid components are rounded to 6 decimals after every recompute,
    * assignment ties break by cluster id, and every mean routes through the
    * DECIMAL(30,15) exact-sum path — no step depends on float addition
    * order, so Spark's partial aggregation and the oracle's sequential scan
    * agree bit-for-bit.
    *
    * Scale: the corpus-sized `vecs` relation is persisted once and scanned
    * once per iteration; centroids are model state (k·d doubles) assembled
    * per cluster and broadcast — assignment is a map-side broadcast join +
    * codegen'd dot products, and each recompute is one map-combined
    * (cluster, dim) shuffle of k·d partials per task. k iterations = k
    * corpus scans, zero corpus shuffles. */
  def embKmeans(s: SparkSession, dir: String, k: Int = 8, iters: Int = 2): DataFrame = {
    val vecs = emb(s, dir)
      .select(col("vec_id"), VF.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", VF.norm(col("ve")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_raw").desc, col("cluster"))
    def assign(cs: DataFrame): DataFrame =
      vecs.crossJoin(broadcast(cs))
        .select(col("vec_id"), col("ve"), col("cluster"),
          (VF.dot(col("ve"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos_raw"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    def withNorm(cs: DataFrame): DataFrame = cs.withColumn("cnrm", VF.norm(col("cv")))
    // seeds = the k lowest vec_ids PRESENT (TakeOrderedAndProject, k rows)
    // — `vec_id < k` would silently under-seed on sparse/non-zero-based ids
    var cents = withNorm(vecs.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cluster"),
        transform(col("ve"), x => round(x, 6)).as("cv")))
    for (_ <- 1 until iters)
      cents = withNorm(assign(cents)
        .select(col("cluster"), posexplode(col("ve")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg((sum(col("x").cast("decimal(30,15)")).cast("double") /
          count(lit(1)).cast("double")).as("c_raw"))
        .select(col("cluster"), col("dim"), round(col("c_raw"), 6).as("c"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          x => x.getField("c")).as("cv")))
    // the report is k rows — materialize it (localCheckpoint cuts the
    // lineage) so the corpus-sized cache can be released here instead of
    // leaking until clearCache/session end
    val out = assign(cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("cos_raw").cast("decimal(30,15)")).cast("double") /
          count(lit(1)).cast("double")).as("mc"))
      .select(col("cluster"), col("n_vecs"), round(col("mc"), 6).as("mean_cos"))
      .orderBy(col("cluster"))
      .localCheckpoint()
    vecs.unpersist()
    out
  }

  /** The oracle unrolls the two Lloyd steps as CTE stages — identical
    * seeding, rounding, and tiebreaks. */
  val embKmeansSql: String =
    """WITH vn AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
      |    sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |), c0 AS (
      |  SELECT vec_id AS cluster, list_transform(ve, x -> ROUND(x, 6)) AS cv
      |  FROM vn ORDER BY vec_id LIMIT 8
      |), c0n AS (
      |  SELECT cluster, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c0
      |), a1 AS (
      |  SELECT vec_id, ve, cluster,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
      |      list_dot_product(ve, cv) / (nrm * cnrm) DESC, cluster) AS rn
      |  FROM vn CROSS JOIN c0n
      |), x1 AS (
      |  SELECT cluster, unnest(generate_series(1, len(ve))) - 1 AS dim,
      |    CAST(unnest(ve) AS DECIMAL(30,15)) AS xd
      |  FROM a1 WHERE rn = 1
      |), comp1 AS (
      |  SELECT cluster, dim,
      |    ROUND(CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS c
      |  FROM x1 GROUP BY cluster, dim
      |), c1n AS (
      |  SELECT cluster, cv, sqrt(list_dot_product(cv, cv)) AS cnrm
      |  FROM (SELECT cluster, list(c ORDER BY dim) AS cv FROM comp1 GROUP BY cluster)
      |), a2 AS (
      |  SELECT vn.vec_id, c1n.cluster,
      |    list_dot_product(vn.ve, c1n.cv) / (vn.nrm * c1n.cnrm) AS cos_raw,
      |    ROW_NUMBER() OVER (PARTITION BY vn.vec_id ORDER BY
      |      list_dot_product(vn.ve, c1n.cv) / (vn.nrm * c1n.cnrm) DESC,
      |      c1n.cluster) AS rn
      |  FROM vn CROSS JOIN c1n
      |)
      |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(CAST(SUM(CAST(cos_raw AS DECIMAL(30,15))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_cos
      |FROM a2 WHERE rn = 1 GROUP BY cluster ORDER BY cluster""".stripMargin

  // --------------------------------------------------- int8 quantization
  /** Symmetric per-vector int8 quantization — the storage/serving
    * compression step of an embedding pipeline: `scale = max|x| / 127`,
    * `q_i = clamp(halfup(x_i / scale), ±127)`. Every arithmetic step is a
    * single IEEE op with an identical spelling in the oracle (`FLOOR(x +
    * 0.5)` HALF_UP, not `round()` — engine rounding rules diverge on .5
    * boundaries), so the int arrays match bit-for-bit with no rounding
    * slack. Zero vectors quantize to zeros (scale 0 guard).
    *
    * Scale: pure map-side projection — no shuffle at any corpus size; the
    * two-projection split keeps `scale` out of the per-element lambda
    * (an inlined aggregate re-evaluates per element). The result is the
    * LONG form `(vec_id, scale, dim, q_val)` — one row per quantized
    * element — because the verification gate hashes scalar cells; an
    * `ARRAY<INT>` column is unhashable downstream, and long form also
    * gives a strictly stronger oracle (every element compared, not just
    * the row count). A production consumer would keep the packed wide
    * array; `posexplode` here is a map-side Generate, still shuffle-free. */
  def embQuantize(s: SparkSession, dir: String): DataFrame = {
    val scaled = emb(s, dir)
      .select(col("vec_id"), VF.asDouble(col("embedding")).as("ve"))
      .select(col("vec_id"), col("ve"),
        (array_max(transform(col("ve"), x => abs(x))) / 127.0).as("scale"))
    scaled.select(
      col("vec_id"), col("scale"),
      when(col("scale") === 0.0, transform(col("ve"), _ => lit(0)))
        .otherwise(transform(col("ve"), x =>
          greatest(lit(-127.0), least(lit(127.0), floor(x / col("scale") + 0.5)))
            .cast("int"))).as("q"))
      .select(col("vec_id"), col("scale"), posexplode(col("q")).as(Seq("pos", "q_val")))
      .select(col("vec_id"), col("scale"), col("pos").cast("long").as("dim"), col("q_val"))
      .orderBy(col("vec_id"), col("dim"))
  }

  val embQuantizeSql: String =
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      |  FROM embeddings
      |), m AS (
      |  SELECT vec_id, ve,
      |    list_aggregate(list_transform(ve, x -> abs(x)), 'max') / 127.0 AS scale
      |  FROM v
      |), q AS (
      |  SELECT vec_id, scale,
      |    CASE WHEN scale = 0 THEN list_transform(ve, x -> CAST(0 AS INT))
      |      ELSE list_transform(ve, x ->
      |        CAST(GREATEST(-127.0, LEAST(127.0, FLOOR(x / scale + 0.5))) AS INT))
      |    END AS q
      |  FROM m
      |)
      |SELECT vec_id, scale, generate_subscripts(q, 1) - 1 AS dim,
      |  unnest(q) AS q_val
      |FROM q ORDER BY vec_id, dim""".stripMargin

  // ------------------------------------------------- per-dimension stats
  /** Per-dimension corpus statistics — the embedding-QA numbers (dead
    * dimensions, scale drift, outlier ranges) read before trusting a
    * similarity index: mean, population std, min, max per dim. Sums and
    * sums-of-squares route through DECIMAL(30,15) (exact, order-free);
    * variance is the identically-spelled `sxx/n − mean²` with a GREATEST
    * 0 clamp for constant dims where float cancellation could dip
    * epsilon-negative.
    *
    * Scale: posexplode emits n·d rows, but the (dim) aggregation is
    * map-combined — each task ships d partials, and the output is d rows. */
  def embDimStats(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("pos").cast("long").as("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(30,15)")).as("sx"),
        sum((col("x") * col("x")).cast("decimal(30,15)")).as("sxx"),
        min(col("x")).as("mn"), max(col("x")).as("mx"))
      .select(col("dim"), col("n"),
        (round(col("sx").cast("double") / col("n").cast("double"), 6) + 0.0).as("mean"),
        (round(sqrt(greatest(
          col("sxx").cast("double") / col("n").cast("double") -
            (col("sx").cast("double") / col("n").cast("double")) *
            (col("sx").cast("double") / col("n").cast("double")),
          lit(0.0))), 6) + 0.0).as("std"),
        (round(col("mn"), 6) + 0.0).as("min_x"),
        (round(col("mx"), 6) + 0.0).as("max_x"))
      .orderBy(col("dim"))

  val embDimStatsSql: String =
    """WITH x AS (
      |  SELECT unnest(generate_series(1, len(embedding))) - 1 AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), a AS (
      |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(30,15))) AS sx,
      |    SUM(CAST(x * x AS DECIMAL(30,15))) AS sxx,
      |    MIN(x) AS mn, MAX(x) AS mx
      |  FROM x GROUP BY dim
      |)
      |SELECT dim, n,
      |  ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS mean,
      |  ROUND(sqrt(GREATEST(
      |    CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)),
      |    0.0)), 6) + 0.0 AS std,
      |  ROUND(mn, 6) + 0.0 AS min_x,
      |  ROUND(mx, 6) + 0.0 AS max_x
      |FROM a ORDER BY dim""".stripMargin

  // ------------------------------------------ quantization error audit
  /** Int8 reconstruction-error audit for [[embQuantize]]: per label, the
    * max and mean |x − q·scale| over every element — the "is int8 safe
    * for this embedding space" number a serving/index team signs off on
    * before shipping the compressed form (symmetric per-vector int8
    * bounds the error by scale/2 = max|x|/254; a label whose max error
    * breaks that bound means the quantizer is mis-specified, not just
    * lossy). Every arithmetic step is spelled identically to
    * [[embQuantize]] (same FLOOR(x/scale + 0.5) HALF_UP, same clamp), so
    * the audit measures the SHIPPED quantizer, not a lookalike.
    *
    * Scale: pure map-side per-element arithmetic into a |labels|-group
    * map-combined aggregation — model-sized output, no joins. */
  def embQuantError(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(30,15)"
    val err = emb(s, dir)
      .select(col("label"), VF.asDouble(col("embedding")).as("ve"))
      .select(col("label"), col("ve"),
        (array_max(transform(col("ve"), x => abs(x))) / 127.0).as("scale"))
      .select(col("label"), col("scale"), posexplode(col("ve")).as(Seq("dim", "x")))
      .select(col("label"),
        when(col("scale") === 0.0, abs(col("x")))
          .otherwise(abs(col("x") -
            greatest(lit(-127.0), least(lit(127.0),
              floor(col("x") / col("scale") + 0.5))) * col("scale"))).as("e"),
        (col("scale") / 2.0).as("bound"))
    err.groupBy(col("label"))
      .agg(count(lit(1)).as("n_elems"),
        max(col("e")).as("mx"),
        (sum(col("e").cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("me"),
        sum(when(col("e") > col("bound"), 1L).otherwise(0L)).as("n_violations"))
      .select(col("label"), col("n_elems"),
        (round(col("mx"), 6) + 0.0).as("max_abs_err"),
        (round(col("me"), 6) + 0.0).as("mean_abs_err"),
        col("n_violations"))
      .orderBy(col("label"))
  }

  val embQuantErrorSql: String =
    """WITH v AS (
      |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      |  FROM embeddings
      |), s AS (
      |  SELECT label, ve,
      |    list_max(list_transform(ve, x -> abs(x))) / 127.0 AS scale
      |  FROM v
      |), e AS (
      |  SELECT label,
      |    CASE WHEN scale = 0.0 THEN abs(x)
      |      ELSE abs(x - GREATEST(-127.0, LEAST(127.0, FLOOR(x / scale + 0.5))) * scale)
      |      END AS e,
      |    scale / 2.0 AS bound
      |  FROM (SELECT label, scale, unnest(ve) AS x FROM s)
      |)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_elems,
      |  ROUND(MAX(e), 6) + 0.0 AS max_abs_err,
      |  ROUND(CAST(SUM(CAST(e AS DECIMAL(30,15))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS mean_abs_err,
      |  CAST(SUM(CASE WHEN e > bound THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |FROM e GROUP BY label ORDER BY label""".stripMargin

  // -------------------------------------------------- covariance (Gramian)
  /** Full per-dimension covariance matrix (upper triangle, d·(d+1)/2 rows)
    * — the Gramian step under PCA / whitening / Mahalanobis outlier
    * scoring. `cov(i,j) = E[x_i x_j] − E[x_i]E[x_j]`, population form,
    * with every moment summed through DECIMAL(30,15) (exact, order-free —
    * the [[embDimStats]] discipline; dimstats IS this matrix's diagonal).
    *
    * Scale: the chained posexplode GENERATES exactly the n·d·(d+1)/2
    * upper-triangle pair rows (the inner generator runs on the j ≥ i
    * SLICE, not the full vector), and they stream straight into a
    * map-side-combined hash aggregate of d·(d+1)/2 groups — each task
    * ships ~2k partial sums, the same shape
    * `RowMatrix.computeGramianMatrix`'s treeAggregate produces, spelled
    * declaratively. The per-task d²/2-products-per-vector work is the
    * irreducible FLOP count of any Gramian; the only exact-DECIMAL sum on
    * the pair grain is the cross moment — the first moments come from a
    * d-group side aggregate over n·d rows (the [[embDimStats]] shape) and
    * join back broadcast, which measured 2.4× faster end-to-end (12.9 s → 5.5 s at sf0.1)
    * than summing all three moments at the pair grain. Output is model-sized. */
  def embCov(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // materialized once: the d-row moment frame broadcasts into TWO joins
    // below, and without the checkpoint each broadcast would re-run the
    // n·d-row aggregation it wraps (the annCosinePairs shared-subtree
    // discipline)
    val firstMoments = e
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("double").cast("decimal(30,15)")).as("s"))
      .localCheckpoint()
    e.select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
      .select(col("i"), col("xi").cast("double").as("xi"),
        posexplode(slice(col("embedding"), col("i") + 1,
          size(col("embedding")) - col("i"))).as(Seq("dj", "xj")))
      .select(col("i"), (col("i") + col("dj")).as("j"),
        col("xi"), col("xj").cast("double").as("xj"))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("xi") * col("xj")).cast("decimal(30,15)")).as("sij"))
      .join(broadcast(firstMoments.select(col("d").as("i"), col("n"),
        col("s").as("si"))), Seq("i"))
      .join(broadcast(firstMoments.select(col("d").as("j"),
        col("s").as("sj"))), Seq("j"))
      .select(col("i"), col("j"),
        (round(col("sij").cast("double") / col("n").cast("double")
          - (col("si").cast("double") / col("n").cast("double"))
            * (col("sj").cast("double") / col("n").cast("double")), 6) + 0.0)
          .as("cov"))
      .orderBy(col("i"), col("j"))
  }

  val embCovSql: String =
    """WITH xs AS (
      |  SELECT unnest(generate_series(1, len(embedding))) - 1 AS d,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), fm AS (
      |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(30,15))) AS s
      |  FROM xs GROUP BY d
      |), xi AS (
      |  SELECT vec_id, embedding,
      |    unnest(generate_series(1, len(embedding))) - 1 AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS xi
      |  FROM embeddings
      |), pairs AS (
      |  SELECT i, xi,
      |    unnest(generate_series(1, len(embedding))) - 1 AS j,
      |    CAST(unnest(embedding) AS DOUBLE) AS xj
      |  FROM xi
      |), sij AS (
      |  SELECT i, j, SUM(CAST(xi * xj AS DECIMAL(30,15))) AS sij
      |  FROM pairs WHERE j >= i GROUP BY i, j
      |)
      |SELECT i, j,
      |  ROUND(CAST(sij AS DOUBLE) / CAST(fi.n AS DOUBLE)
      |    - (CAST(fi.s AS DOUBLE) / CAST(fi.n AS DOUBLE))
      |      * (CAST(fj.s AS DOUBLE) / CAST(fi.n AS DOUBLE)),
      |    6) + 0.0 AS cov
      |FROM sij JOIN fm fi ON sij.i = fi.d JOIN fm fj ON sij.j = fj.d
      |ORDER BY i, j""".stripMargin

  // ------------------------------------------------ PCA eigenpair check
  /** Top-principal-component certification, violation-check shaped (the
    * [[graft.operators.SimilarityOps]] recall-check pattern): power-iterate
    * the [[embCov]] matrix to its dominant eigenpair (v, λ) and emit every
    * dimension where the eigen-residual `|Cv − λv|_i` exceeds
    * `tol·max(1, λ)` — provably empty when the iteration converged, so the
    * oracle is the empty relation and a non-converged or wrong eigenpair
    * fails the driver gate with named dims. The iteration itself is
    * deterministic: it starts from the axis of largest variance (ties →
    * lowest dim) and runs a fixed 300 steps on the rounded covariance
    * model, so both engines would see bit-identical inputs.
    *
    * Scale: the distributed work is [[embCov]]; the eigensolve touches
    * only the d×d model (collect of d·(d+1)/2 rows — model state, the
    * centroid-collect precedent). tol = 1e-3 sits ~3.5 orders above the
    * measured residual (2e-7 at sf0.01) AND above the worst case under
    * slow convergence: this corpus's top eigenvalues are near-degenerate
    * (λ₂/λ₁ ≈ 0.987), which throttles power iteration, but by the same
    * token ANY unit mixture of the top eigenvectors has residual ≤ λ₁−λ₂
    * (≈3.5e-4 here) — the law holds whether the iteration resolves the
    * degeneracy or not, so corpus regeneration can't flip it spuriously. */
  def embPcaCheck(s: SparkSession, dir: String, iters: Int = 300,
      tol: Double = 1e-3): DataFrame = {
    val rows = embCov(s, dir).collect()
    val d = rows.map(_.getInt(1)).max + 1
    val c = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    var v = Array.tabulate(d)(i => if (i == (0 until d).maxBy(k => c(k)(k))) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val w = matVec(v)
      val nw = norm(w)
      if (nw > 0) v = w.map(_ / nw)
    }
    val cv = matVec(v)
    val lambda = (0 until d).map(i => v(i) * cv(i)).sum
    val bound = tol * math.max(1.0, math.abs(lambda))
    val viol = (0 until d).flatMap { i =>
      val resid = math.abs(cv(i) - lambda * v(i))
      if (resid > bound) Some((i, resid)) else None
    }
    import s.implicits._
    viol.toDF("dim", "resid")
  }

  val embPcaCheckSql: String =
    """SELECT CAST(NULL AS INTEGER) AS dim, CAST(NULL AS DOUBLE) AS resid
      |WHERE FALSE""".stripMargin

  // ---------------------------------------- cluster-balanced sampling
  /** Cluster-CAP sampling — the diversity-balancing step of the "embed →
    * cluster → sample per cluster" curation recipe: assign every vector to
    * its nearest label centroid by cosine (the [[embAssign]] E-step,
    * identical rounding discipline) and keep at most `cap` vectors per
    * cluster, chosen by the hash order (md5(vec_id), vec_id) every sampler
    * here uses — deterministic, replayable, batching-invariant. Dominant
    * clusters (boilerplate, head topics) are truncated to the cap while
    * tail clusters survive whole, flattening the topic distribution
    * without dropping rare content — the embedding-space counterpart of
    * [[SamplingOps.sampBySource]]'s per-source cap.
    *
    * Scale: centroids are broadcast model state and assignment is
    * map-side; the per-cluster rank is ONE cluster-keyed shuffle, and the
    * `rk <= cap` filter sits directly on row_number so Spark's
    * WindowGroupLimit keeps only `cap` rows per cluster PER MAP TASK
    * before the shuffle — reducer input is tasks·cap rows per cluster,
    * never the corpus, which is what makes a low-cardinality partition
    * key (8 clusters here) safe at any corpus size. */
  def sampClusterCap(s: SparkSession, dir: String, cap: Int = 32): DataFrame = {
    val e = emb(s, dir)
    val cents = centroidVectors(
      centroidRows(e).withColumnRenamed("label", "c_label"), "c_label")
    val vecs = e.select(col("vec_id"), VF.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", VF.norm(col("ve")))
    val wBest = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_raw").desc, col("c_label"))
    val assigned = vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("c_label"),
        (VF.dot(col("ve"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos_raw"))
      .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("vec_id"), col("c_label").as("assigned"))
    val wCap = Window.partitionBy(col("assigned"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    assigned
      .withColumn("rk", row_number().over(wCap))
      .filter(col("rk") <= cap)
      .select(col("vec_id"), col("assigned"), col("rk").cast("long").as("rk"))
      .orderBy(col("assigned"), col("rk"))
  }

  val sampClusterCapSql: String =
    """WITH x AS (
      |  SELECT label,
      |    unnest(generate_series(1, len(embedding))) - 1 AS dim,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(30,15)) AS xd
      |  FROM embeddings
      |), comp AS (
      |  SELECT label AS c_label, dim,
      |    ROUND(CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS c
      |  FROM x GROUP BY label, dim
      |), cents AS (
      |  SELECT c_label, list(c ORDER BY dim) AS cv FROM comp GROUP BY c_label
      |), scored AS (
      |  SELECT e.vec_id, cents.c_label,
      |    list_dot_product(list_transform(e.embedding, v -> CAST(v AS DOUBLE)), cv)
      |      / (sqrt(list_dot_product(list_transform(e.embedding, v -> CAST(v AS DOUBLE)),
      |               list_transform(e.embedding, v -> CAST(v AS DOUBLE))))
      |         * sqrt(list_dot_product(cv, cv))) AS cos_raw
      |  FROM embeddings e CROSS JOIN cents
      |), best AS (
      |  SELECT vec_id, c_label,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_raw DESC, c_label) AS rn
      |  FROM scored
      |), assigned AS (
      |  SELECT vec_id, c_label AS assigned FROM best WHERE rn = 1
      |), capped AS (
      |  SELECT vec_id, assigned,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY assigned
      |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk
      |  FROM assigned
      |)
      |SELECT vec_id, assigned, rk FROM capped WHERE rk <= 32
      |ORDER BY assigned, rk""".stripMargin

  // --------------------------------- JL random projection (dim reduce)
  /** Johnson–Lindenstrauss random projection d → k with a Rademacher (±1)
    * matrix — the classic cheap dimensionality reduction an embedding
    * pipeline runs before ANN indexing or clustering at scale (Achlioptas
    * 2001: ±1 entries preserve pairwise distances in expectation with the
    * same JL guarantee as Gaussian matrices, and cost only sign flips).
    * Output is the long scalar form (vec_id, rdim, proj), never an array
    * column (driver-hasher contract).
    *
    * The sign matrix is DERIVED, not stored: sgn(dim, rdim) = parity of
    * the first md5 nibble of "rp:dim_rdim" — both engines materialize the
    * identical d×k matrix from the identical string hash, the same
    * portable-entropy discipline as [[SamplingOps]]' salted digests. The
    * matrix frame is built from the data's own distinct dims (no
    * hardcoded d) and broadcast; each ±x term is DECIMAL(30,15)-negated
    * (never multiplied — decimal×decimal precision overflow would round),
    * summed exactly, then scaled by 1/√k in identical double arithmetic.
    *
    * Scale: posexplode emits n·d rows, map-combined into n·k groups keyed
    * by (vec_id, rdim) — one shuffle whose width is the OUTPUT size; the
    * d×k sign matrix crosses as a broadcast. At 100 TB the same plan
    * holds: the matrix is KB-sized model state and the projection is one
    * pass. */
  /** Scala-side replica of the portable sign derivation — the literal
    * d×k matrix consumers embed in a map-side plan
    * ([[SimilarityOps.rpRecallCheck]]); CurationSamplingSpec pins it
    * equal to the Spark-md5 derivation below. Row layout: result(j)(i) =
    * sgn(dim = i, rdim = j). */
  private[graft] def rpSignMatrix(d: Int, k: Int): IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sgn(dim: Int, rdim: Int): Int = {
      val hex = md.digest(s"rp:${dim}_$rdim".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1 else -1
    }
    (0 until k).map(j => (0 until d).map(i => sgn(i, j)))
  }

  def embRp(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val x = emb(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        col("xf").cast("double").cast("decimal(30,15)").as("xd"))
    val signs = x.select(col("dim")).distinct()
      .crossJoin(s.range(k.toLong).toDF("rdim"))
      .select(col("dim"), col("rdim"),
        when(conv(substring(md5(concat(lit("rp:"),
          col("dim").cast("string"), lit("_"),
          col("rdim").cast("string")).cast("binary")), 1, 1), 16, 10)
          .cast("long") % 2 === 0, lit(1)).otherwise(lit(-1)).as("sgn"))
    x.join(broadcast(signs), Seq("dim"))
      .groupBy(col("vec_id"), col("rdim"))
      .agg(sum(when(col("sgn") === 1, col("xd")).otherwise(-col("xd")))
        .cast("double").as("s"))
      .select(col("vec_id"), col("rdim"),
        round(col("s") / lit(math.sqrt(k.toDouble)), 6).as("proj"))
      .orderBy(col("vec_id"), col("rdim"))
  }

  val embRpSql: String =
    """WITH x AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(30,15)) AS xd
      |  FROM embeddings
      |), signs AS (
      |  SELECT d.dim, j.rdim,
      |    CASE WHEN CAST('0x' || substr(md5('rp:' || CAST(d.dim AS VARCHAR)
      |        || '_' || CAST(j.rdim AS VARCHAR)), 1, 1) AS BIGINT) % 2 = 0
      |      THEN 1 ELSE -1 END AS sgn
      |  FROM (SELECT DISTINCT dim FROM x) d CROSS JOIN range(16) j(rdim)
      |)
      |SELECT x.vec_id, signs.rdim,
      |  ROUND(CAST(SUM(CASE WHEN sgn = 1 THEN xd ELSE -xd END) AS DOUBLE)
      |    / sqrt(16.0), 6) AS proj
      |FROM x JOIN signs ON x.dim = signs.dim
      |GROUP BY x.vec_id, signs.rdim
      |ORDER BY vec_id, rdim""".stripMargin

  // ----------------------- shared seed-centroid assignment (k clusters)
  /** One-shot cluster assignment against k deterministic seed centroids
    * (the k lowest vec_ids, components rounded to 6 decimals — the
    * [[embKmeans]] seeding contract without the Lloyd refinement, so an
    * oracle can replay it as a single CROSS JOIN + ROW_NUMBER stage).
    * Emits (vec_id, label, ve, nrm, cluster). Shared by
    * [[embClusterPurity]] and [[DedupOps.ddSemDedupCluster]] so the two
    * consumers can never diverge on seeding/rounding/tiebreak discipline.
    *
    * Scale: seeds are k·d doubles of broadcast model state
    * (TakeOrderedAndProject on vec_id, k rows); assignment is a map-side
    * broadcast join + codegen'd dot products — zero corpus shuffles. */
  private[graft] def seedAssignment(s: SparkSession, dir: String,
      k: Int): DataFrame = {
    val vecs = emb(s, dir)
      .select(col("vec_id"), col("label"), VF.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", VF.norm(col("ve")))
    val cents = vecs.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cluster"),
        transform(col("ve"), x => round(x, 6)).as("cv"))
      .withColumn("cnrm", VF.norm(col("cv")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_raw").desc, col("cluster"))
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("ve"), col("nrm"), col("cluster"),
        (VF.dot(col("ve"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos_raw"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("ve"), col("nrm"), col("cluster"))
  }

  /** DuckDB CTE block replaying [[seedAssignment]] — ends with an `asg`
    * relation (vec_id, label, ve, nrm, cluster). Callers prepend `WITH `
    * and append their own stages. */
  private[operators] def seedAssignCtes(k: Int): String =
    seedAssignCtesWith(
      s"""c0 AS (
         |  SELECT vec_id AS cluster, list_transform(ve, x -> ROUND(x, 6)) AS cv
         |  FROM vn ORDER BY vec_id LIMIT $k
         |)""".stripMargin)

  /** Shared vn/c0n/asg scaffolding around a caller-supplied `c0` seed CTE
    * — [[seedAssignCtes]] (fixed k) and [[seedAssignCtesAuto]] (corpus-
    * derived k) differ ONLY in seed selection, and sharing the rest makes
    * a seeding/rounding/tiebreak change impossible to apply to one oracle
    * and not the other (the same single-source discipline the Scala
    * [[seedAssignment]] provides its consumers). */
  private def seedAssignCtesWith(c0Cte: String): String =
    s"""vn AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
       |    sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings
       |), $c0Cte, c0n AS (
       |  SELECT cluster, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c0
       |), asg AS (
       |  SELECT vec_id, label, ve, nrm, cluster FROM (
       |    SELECT vn.vec_id, vn.label, vn.ve, vn.nrm, c0n.cluster,
       |      ROW_NUMBER() OVER (PARTITION BY vn.vec_id ORDER BY
       |        list_dot_product(vn.ve, c0n.cv) / (vn.nrm * c0n.cnrm) DESC,
       |        c0n.cluster) AS rn
       |    FROM vn CROSS JOIN c0n)
       |  WHERE rn = 1
       |)""".stripMargin

  /** [[seedAssignCtes]] with the CORPUS-DERIVED k:
    * max(`floorK`, ⌈n/`target`⌉) — the SemDeDup "grow k ∝ n" dial in the
    * oracle's own arithmetic (ROW_NUMBER + windowed COUNT instead of
    * LIMIT, so k is data-dependent yet fully portable). Must stay
    * arithmetic-identical to [[DedupOps.ddSemDedupCluster]]'s Scala rule. */
  private[operators] def seedAssignCtesAuto(floorK: Int, target: Int): String =
    seedAssignCtesWith(
      s"""c0 AS (
         |  SELECT cluster, cv FROM (
         |    SELECT vec_id AS cluster, list_transform(ve, x -> ROUND(x, 6)) AS cv,
         |      ROW_NUMBER() OVER (ORDER BY vec_id) AS rn,
         |      COUNT(*) OVER () AS n
         |    FROM vn)
         |  WHERE rn <= GREATEST($floorK, CAST(CEIL(n / $target.0) AS BIGINT))
         |)""".stripMargin)

  // ------------------------------------------------ cluster label purity
  /** Per-cluster label-purity report after seed-centroid assignment: how
    * well the embedding geometry separates the ground-truth labels — the
    * "is this clustering good enough to curate with" gate a team runs
    * BEFORE trusting cluster-balanced sampling ([[sampClusterCap]]) or
    * cluster-scoped dedup ([[DedupOps.ddSemDedupCluster]]). Emits
    * (cluster, n_vecs, n_labels, top_share, label_entropy); pure clusters
    * → top_share 1.0 / entropy 0, mixed clusters → entropy toward
    * ln(labels). Per-term −p·ln p contributions are DECIMAL(30,15)-cast
    * before summing (exact, order-free — the txtEntropy discipline).
    *
    * Scale: assignment is map-side (broadcast seeds); the (cluster, label)
    * count matrix is ONE map-combined shuffle of clusters·labels partials
    * per task; everything after operates on that model-sized frame. */
  def embClusterPurity(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val asg = seedAssignment(s, dir, k)
      .select(col("vec_id"), col("label"), col("cluster"))
    val w = Window.partitionBy(col("cluster"))
    asg.groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum(col("cnt")).over(w))
      .withColumn("p", col("cnt").cast("double") / col("n").cast("double"))
      .groupBy(col("cluster"), col("n"))
      .agg(count(lit(1)).as("n_labels"),
        (max(col("cnt")).cast("double") / col("n").cast("double")).as("ts"),
        sum((-col("p") * log(col("p"))).cast("decimal(30,15)")).as("ent"))
      .select(col("cluster"), col("n").as("n_vecs"), col("n_labels"),
        (round(col("ts"), 6) + 0.0).as("top_share"),
        (round(col("ent").cast("double"), 6) + 0.0).as("label_entropy"))
      .orderBy(col("cluster"))
  }

  val embClusterPuritySql: String =
    s"""WITH ${seedAssignCtes(16)}, cnt AS (
       |  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM asg GROUP BY cluster, label
       |), withn AS (
       |  SELECT cluster, label, cnt,
       |    SUM(cnt) OVER (PARTITION BY cluster) AS n
       |  FROM cnt
       |)
       |SELECT cluster, CAST(MIN(n) AS BIGINT) AS n_vecs,
       |  CAST(COUNT(*) AS BIGINT) AS n_labels,
       |  ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(MIN(n) AS DOUBLE), 6) + 0.0 AS top_share,
       |  ROUND(CAST(SUM(CAST(-(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
       |      * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(30,15)))
       |    AS DOUBLE), 6) + 0.0 AS label_entropy
       |FROM withn GROUP BY cluster ORDER BY cluster""".stripMargin

  // ------------------------------------------- centroid stability audit
  /** Centroid drift between two deterministic halves of the corpus (md5
    * first hex digit < '8' vs ≥ '8'): per label, how far the half-corpus
    * centroids sit apart — the split-half stability check a team runs
    * before trusting centroid-based curation (assignment, caps,
    * cluster-scoped dedup). A label whose two halves disagree is
    * under-sampled or multi-modal; its cluster decisions are noise.
    * Emits (label, n_dims, max_drift, mean_drift).
    *
    * Scale: same posexplode map-combined (half, label, dim) aggregation
    * as [[embCentroids]] (2× the groups), then the drift join and report
    * operate on model-sized frames. */
  def embCentroidDrift(s: SparkSession, dir: String): DataFrame = {
    val halves = emb(s, dir)
      .withColumn("h",
        when(substring(md5(col("vec_id").cast("string")), 1, 1) < "8", 0)
          .otherwise(1))
      .select(col("h"), col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("h"), col("label"), col("dim"))
      .agg((sum(col("x").cast("double").cast("decimal(30,15)")).cast("double") /
        count(lit(1)).cast("double")).as("c_raw"))
      .select(col("h"), col("label"), col("dim"), round(col("c_raw"), 6).as("c"))
    val h0 = halves.filter(col("h") === 0).select(col("label"), col("dim"), col("c").as("c0"))
    val h1 = halves.filter(col("h") === 1).select(col("label"), col("dim"), col("c").as("c1"))
    h0.join(h1, Seq("label", "dim"))
      .select(col("label"), abs(col("c0") - col("c1")).as("drift"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_dims"),
        max(col("drift")).as("mx"),
        (sum(col("drift").cast("decimal(30,15)")).cast("double") /
          count(lit(1)).cast("double")).as("mn"))
      .select(col("label"), col("n_dims"),
        (round(col("mx"), 6) + 0.0).as("max_drift"),
        (round(col("mn"), 6) + 0.0).as("mean_drift"))
      .orderBy(col("label"))
  }

  val embCentroidDriftSql: String =
    """WITH x AS (
      |  SELECT CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8'
      |      THEN 0 ELSE 1 END AS h,
      |    label,
      |    unnest(generate_series(1, len(embedding))) - 1 AS dim,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(30,15)) AS xd
      |  FROM embeddings
      |), comp AS (
      |  SELECT h, label, dim,
      |    ROUND(CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS c
      |  FROM x GROUP BY h, label, dim
      |), drift AS (
      |  SELECT a.label, ABS(a.c - b.c) AS drift
      |  FROM comp a JOIN comp b
      |    ON a.label = b.label AND a.dim = b.dim AND a.h = 0 AND b.h = 1
      |)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_dims,
      |  ROUND(MAX(drift), 6) + 0.0 AS max_drift,
      |  ROUND(CAST(SUM(CAST(drift AS DECIMAL(30,15))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS mean_drift
      |FROM drift GROUP BY label ORDER BY label""".stripMargin

  // --------------------------------- greedy k-center coreset sampling
  /** Farthest-point (greedy k-center) coreset selection: start from the
    * lowest vec_id, then repeatedly pick the vector FARTHEST (max
    * min-cosine-distance) from everything already chosen — the classic
    * 2-approximation to the k-center cover and the diversity-sampling
    * complement of [[sampClusterCap]] (that flattens the topic
    * distribution; this finds the corpus's extreme points, the seeds a
    * labeling/eval budget buys the most coverage with). Emits
    * (rank, vec_id, sel_dist) where sel_dist is the selection-time
    * min-distance — a decreasing sequence that IS the k-center radius
    * curve.
    *
    * Determinism: distances are raw IEEE doubles computed by the same
    * sequential fold on both engines (the [[embAssign]] argmax
    * discipline); ties break by vec_id; rounding touches only the
    * emitted column.
    *
    * Scale: k sequential passes, each a broadcast join of ≤ k chosen
    * vectors against the corpus plus a TakeOrdered(1) — driver state is
    * k·d doubles of model state, never corpus rows. At 100 TB one runs
    * this over [[embKmeans]] centroids or an [[embRp]] sketch rather
    * than raw vectors — same operator, coarser input. */
  def sampCoreset(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val vecs = emb(s, dir)
      .select(col("vec_id"), VF.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", VF.norm(col("ve")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = vecs.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id")).collect()(0).getLong(0)
    var chosen = Vector((first, 0.0))
    for (_ <- 2 to k) {
      val ids = chosen.map(_._1)
      val chDf = broadcast(vecs.filter(col("vec_id").isin(ids: _*))
        .select(col("ve").as("cv"), col("nrm").as("cnrm")))
      val pick = vecs.filter(!col("vec_id").isin(ids: _*))
        .crossJoin(chDf)
        .select(col("vec_id"),
          (lit(1.0) - VF.dot(col("ve"), col("cv")) / (col("nrm") * col("cnrm")))
            .as("dist"))
        .groupBy(col("vec_id")).agg(min(col("dist")).as("md"))
        .orderBy(col("md").desc, col("vec_id")).limit(1).collect()(0)
      chosen = chosen :+ ((pick.getLong(0), pick.getDouble(1)))
    }
    vecs.unpersist()
    import s.implicits._
    chosen.zipWithIndex.map { case ((id, md), i) =>
      (i + 1L, id,
        BigDecimal(md).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }.toDF("rank", "vec_id", "sel_dist").orderBy(col("rank"))
  }

  /** Oracle: the greedy loop unrolled as a generated CTE chain — each
    * round is (min-dist over chosen so far) → (argmax pick) → (chosen
    * grows by one), exactly the Spark loop's three steps. */
  val sampCoresetSql: String = {
    val k = 8
    val sb = new StringBuilder
    sb ++= """WITH vn AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
      |    sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |), ch1 AS (
      |  SELECT vec_id, ve, nrm, CAST(1 AS BIGINT) AS rank, 0.0 AS md
      |  FROM vn ORDER BY vec_id LIMIT 1
      |)""".stripMargin
    for (i <- 2 to k) {
      sb ++= s""", d$i AS (
        |  SELECT v.vec_id,
        |    MIN(1.0 - list_dot_product(v.ve, c.ve) / (v.nrm * c.nrm)) AS md
        |  FROM vn v CROSS JOIN ch${i - 1} c
        |  WHERE v.vec_id NOT IN (SELECT vec_id FROM ch${i - 1})
        |  GROUP BY v.vec_id
        |), p$i AS (
        |  SELECT vec_id, md FROM d$i ORDER BY md DESC, vec_id LIMIT 1
        |), ch$i AS (
        |  SELECT vec_id, ve, nrm, rank, md FROM ch${i - 1}
        |  UNION ALL
        |  SELECT vn.vec_id, vn.ve, vn.nrm, CAST($i AS BIGINT) AS rank, p$i.md
        |  FROM vn JOIN p$i USING (vec_id)
        |)""".stripMargin
    }
    sb ++= s"""
      |SELECT rank, vec_id, ROUND(md, 6) + 0.0 AS sel_dist
      |FROM ch$k ORDER BY rank""".stripMargin
    sb.toString
  }

  // ------------------------------------------------ norm-health histogram
  /** Vector-norm histogram per label (0.25-wide buckets): the embedding-
    * space health check read before any cosine-based curation — norm
    * collapse (all mass in one bucket near 0) or a bimodal norm split
    * within a label flags an encoder defect that cosine normalization
    * would silently hide. Bucket = `floor(‖v‖·4)/4`, identical arithmetic
    * both engines. Emits (label, nrm_bucket, n_vecs).
    *
    * Scale: one map pass + a (label, bucket)-keyed map-combined count —
    * model-sized output, no joins. */
  def embNormHist(s: SparkSession, dir: String): DataFrame = {
    val bucket = floor(VF.norm(VF.asDouble(col("embedding"))) * 4) / 4
    Tables.load(s, dir, "embeddings")
      .select(col("label"), bucket.as("nrm_bucket"))
      .groupBy(col("label"), col("nrm_bucket"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("nrm_bucket"))
  }

  val embNormHistSql: String =
    """SELECT label,
      |  floor(sqrt(list_dot_product(
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)))) * 4) / 4
      |    AS nrm_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_vecs
      |FROM embeddings GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------- label-margin audit
  /** Per-label separation margin: for every vector, cosine to its OWN
    * label centroid minus the best cosine to any OTHER centroid, rolled
    * up per label as (mean margin, confused-vector count). The
    * metric-space quality gate read before trusting labels for
    * cluster-balanced sampling or cluster-scoped dedup — a label whose
    * mean margin hugs 0 (or with many margin<0 vectors) isn't separable
    * in this embedding space and its per-label curation decisions are
    * noise. Margins use the same rounded-centroid broadcast discipline as
    * [[embAssign]], so the per-vector scores are bit-identical across
    * engines; the rollup mean routes through a DECIMAL sum.
    *
    * Scale: centroids are broadcast model state; scoring is a map-side
    * cross of corpus × |labels|; ONE vec-keyed map-combined agg then a
    * label-keyed model-sized rollup. */
  def embLabelMargin(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = centroidVectors(
      centroidRows(e).withColumnRenamed("label", "c_label"), "c_label")
    val vecs = e.select(col("vec_id"), col("label"),
        VF.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", VF.norm(col("ve")))
    val per = vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("c_label"),
        (VF.dot(col("ve"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos_raw"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("label") === col("c_label"), col("cos_raw"))).as("own"),
        max(when(col("label") =!= col("c_label"), col("cos_raw"))).as("other"))
      .select(col("label"), (col("own") - col("other")).as("margin"))
    per.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (round(sum(col("margin").cast("decimal(30,15)")).cast("double") /
          count(lit(1)), 6) + 0.0).as("mean_margin"),
        sum(when(col("margin") < 0, 1L).otherwise(0L)).as("n_confused"))
      .orderBy(col("label"))
  }

  val embLabelMarginSql: String =
    """WITH x AS (
      |  SELECT label,
      |    unnest(generate_series(1, len(embedding))) - 1 AS dim,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(30,15)) AS xd
      |  FROM embeddings
      |), comp AS (
      |  SELECT label AS c_label, dim,
      |    ROUND(CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS c
      |  FROM x GROUP BY 1, 2
      |), cents AS (
      |  SELECT c_label, list(c ORDER BY dim) AS cv,
      |    sqrt(list_dot_product(list(c ORDER BY dim), list(c ORDER BY dim)))
      |      AS cnrm
      |  FROM comp GROUP BY c_label
      |), scored AS (
      |  SELECT e.vec_id, e.label, c.c_label,
      |    list_dot_product(list_transform(e.embedding, v -> CAST(v AS DOUBLE)), cv)
      |      / (sqrt(list_dot_product(
      |           list_transform(e.embedding, v -> CAST(v AS DOUBLE)),
      |           list_transform(e.embedding, v -> CAST(v AS DOUBLE)))) * cnrm)
      |      AS cos_raw
      |  FROM embeddings e CROSS JOIN cents c
      |), per AS (
      |  SELECT vec_id, label,
      |    MAX(CASE WHEN label = c_label THEN cos_raw END)
      |      - MAX(CASE WHEN label <> c_label THEN cos_raw END) AS margin
      |  FROM scored GROUP BY 1, 2
      |)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(CAST(SUM(CAST(margin AS DECIMAL(30,15))) AS DOUBLE)
      |    / COUNT(*), 6) + 0.0 AS mean_margin,
      |  CAST(SUM(CASE WHEN margin < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_confused
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------ inter-centroid similarity
  /** Inter-centroid cosine matrix: pairwise similarity of the label
    * centroids (upper triangle) — WHICH labels are confusable, the
    * pair-grain companion to [[embLabelMargin]]'s per-label rollup (a
    * high-cosine centroid pair explains exactly where that audit's
    * confused vectors go). Rounded-centroid discipline shared with
    * [[embAssign]] so the cosines are bit-identical across engines.
    *
    * Scale: the matrix is |labels|²/2 rows of model state — the pair join
    * runs on the broadcastable centroid frame, never the corpus. */
  def embCentroidSim(s: SparkSession, dir: String): DataFrame = {
    val cents = centroidVectors(
      centroidRows(emb(s, dir)).withColumnRenamed("label", "c_label"), "c_label")
    cents.as("a").join(cents.as("b"), col("a.c_label") < col("b.c_label"))
      .select(col("a.c_label").as("label_a"), col("b.c_label").as("label_b"),
        (round(VF.dot(col("a.cv"), col("b.cv")) /
          (col("a.cnrm") * col("b.cnrm")), 6) + 0.0).as("cos"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val embCentroidSimSql: String =
    """WITH x AS (
      |  SELECT label,
      |    unnest(generate_series(1, len(embedding))) - 1 AS dim,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(30,15)) AS xd
      |  FROM embeddings
      |), comp AS (
      |  SELECT label, dim,
      |    ROUND(CAST(SUM(xd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS c
      |  FROM x GROUP BY 1, 2
      |), cents AS (
      |  SELECT label, list(c ORDER BY dim) AS cv,
      |    sqrt(list_dot_product(list(c ORDER BY dim), list(c ORDER BY dim)))
      |      AS cnrm
      |  FROM comp GROUP BY label
      |)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  ROUND(list_dot_product(a.cv, b.cv) / (a.cnrm * b.cnrm), 6) + 0.0
      |    AS cos
      |FROM cents a JOIN cents b ON a.label < b.label
      |ORDER BY 1, 2""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_norm_hist" -> (embNormHist _),
    "emb_label_margin" -> (embLabelMargin _),
    "emb_centroid_sim" -> (embCentroidSim _),
    "samp_coreset" -> ((s: SparkSession, d: String) => sampCoreset(s, d)),
    "emb_centroid_drift" -> (embCentroidDrift _),
    "emb_quant_error" -> (embQuantError _),
    "emb_cluster_purity" -> ((s: SparkSession, d: String) => embClusterPurity(s, d)),
    "emb_rp" -> ((s: SparkSession, d: String) => embRp(s, d)),
    "emb_centroids" -> (embCentroids _),
    "emb_assign" -> (embAssign _),
    "emb_kmeans" -> ((s: SparkSession, d: String) => embKmeans(s, d)),
    "emb_outliers" -> (embOutliers _),
    "emb_quantize" -> (embQuantize _),
    "emb_dimstats" -> (embDimStats _),
    "emb_cov" -> (embCov _),
    "emb_pca_check" -> ((s: SparkSession, d: String) => embPcaCheck(s, d)),
    "samp_cluster_cap" -> ((s: SparkSession, d: String) => sampClusterCap(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "emb_norm_hist" -> embNormHistSql,
    "emb_label_margin" -> embLabelMarginSql,
    "emb_centroid_sim" -> embCentroidSimSql,
    "samp_coreset" -> sampCoresetSql,
    "emb_centroid_drift" -> embCentroidDriftSql,
    "emb_quant_error" -> embQuantErrorSql,
    "emb_cluster_purity" -> embClusterPuritySql,
    "emb_rp" -> embRpSql,
    "emb_quantize" -> embQuantizeSql,
    "emb_dimstats" -> embDimStatsSql,
    "emb_centroids" -> embCentroidsSql,
    "emb_assign" -> embAssignSql,
    "emb_kmeans" -> embKmeansSql,
    "emb_outliers" -> embOutliersSql,
    "emb_cov" -> embCovSql,
    "emb_pca_check" -> embPcaCheckSql,
    "samp_cluster_cap" -> sampClusterCapSql,
  )
}
