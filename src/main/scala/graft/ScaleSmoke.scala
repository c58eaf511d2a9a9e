package graft

import org.apache.spark.sql.functions._

/** Scale-up smoke: derive a `factor`× corpus from sf0.1 and time the heavy
  * operators on it — direct evidence for the linear-scaling claims in the
  * operator scaladocs (a shape that is secretly quadratic in corpus size
  * shows up immediately at 10×).
  *
  * Derivation: each copy k prefixes every document's text with a
  * copy-unique token and offsets doc_id/vec_id by k·10⁹. The prefix kills
  * cross-copy EXACT duplication but only shifts ~2 of ~300 shingles, so
  * cross-copy jaccard stays ≈0.95 and every doc lands in a factor-sized
  * near-dup clique — i.e. the derived corpus is a strictly HARDER problem
  * than the original (×10 data AND a much denser pair graph: 515k pairs
  * vs 25 at sf0.1). That's the point: the pair cores must survive both
  * axes. Embeddings clone as-is (centroid/k-means math is
  * duplicate-tolerant). Events clone with event_id AND user_id offset per
  * copy (r10): the user population grows ×factor while each clone user
  * replays the identical sequence, so per-user state stays constant —
  * the axis the user-keyed evt_* plans actually scale on.
  *
  * Measured (local[32], 2026-08, 50k docs vs 5k): dd_exact 0.62 s (1.7×),
  * dd_ngram_jaccard 3.75 s (~1.5×), dd_minhash_lsh 3.89 s (~1.3×),
  * dd_source_overlap 2.61 s, dd_decontaminate 2.35 s, txt_tfidf 1.67 s,
  * txt_entropy 1.97 s, emb_kmeans 1.32 s, txt_pack 0.79 s, dd_bloom
  * 1.69 s, txt_unigram_ppl 2.30 s, dd_chunk_dups 0.37 s (all ~1×) —
  * ten times the data for at most 1.7× the time; fixed per-job overhead
  * still dominates, no shape blows up. dd_dedup_groups: 13.6 s vs 3.4 —
  * 4× time for 10× data on a 20,000×-denser pair graph (515k edges in
  * 10-cliques vs 25): the clique-seeded min-label CC converges in its
  * designed 1-2 rounds even when every doc is in a clique.
  *
  * Second point at 30× (150k docs): dd_exact 0.61 s (flat),
  * dd_ngram_jaccard 3.66 s (flat — the df≤50 cap now prunes cross-copy
  * shingles, exactly its job), dd_minhash_lsh 4.92 s (1.6×), txt_tfidf
  * 2.79 s, txt_entropy 3.61 s, txt_pack 1.40 s, emb_kmeans 2.09 s (all
  * ≤2× the sf0.1 time for 30× the data — local[32]'s parallel slack
  * absorbs the growth; the per-row work is what a 1000-executor cluster
  * distributes).
  *
  * Round-8 additions at 10× (50k docs / 50k vectors): dd_substring_spans
  * 2.25 s (1.7× its 1.33 s sf0.1 time — the window-hash shuffle carries
  * 10× sites; every cloned doc gains a full-doc duplicated span, so the
  * output is 50k spans, 1000× the 1× row count, and the span merge still
  * holds at 1.7×), dd_substring_rate 0.43 s, dd_substring_cut 0.36 s,
  * txt_bigram_ppl 3.60 s (FLAT vs 3.55 — the bigram/context model joins
  * are vocabulary-shaped, and the corpus clone adds data without adding
  * vocabulary), emb_pca_check 6.04 s (1.1× for 10× vectors — the pair-
  * grain DECIMAL sum is the cost and local[32]'s slack absorbs it; the
  * d-group model collect is size-invariant). Second point at 30× (150k
  * docs / 150k vectors): dd_substring_spans 4.49 s (3.4× for 30× data
  * and a 150k-span output), dd_substring_rate 0.56 s, dd_substring_cut
  * 0.36 s (flat), txt_bigram_ppl 5.59 s (1.6×), txt_ppl_buckets 3.64 s
  * (2.0× — the per-source NTILE sort carries 30× rows; the approx-
  * threshold twin is the form that dodges this), emb_pca_check 7.59 s
  * (1.3× for 30× vectors). All sublinear in data.
  *
  * Round-8 curation additions at 10× / 30× (50k / 150k docs):
  * txt_boilerplate 2.61 s / 4.64 s (1.2× / 2.0× its ~2.2 s sf0.1 time —
  * phase 1's 16-byte hash shuffle carries the gram growth; the candidate
  * string recovery stays report-sized at every factor), samp_dsir 2.66 s /
  * 3.16 s (flat / 1.3× — the two unigram models are vocabulary-shaped and
  * the clone adds data without vocabulary, the txt_bigram_ppl story),
  * ds_split_leakage 3.86 s / 8.01 s with a 210k-row leaked-pair report
  * (1.3× / 2.6× for a pair graph ~8,400× denser than sf0.1's — the
  * clique-derived corpus puts nearly half of all 515k cross-copy pairs
  * across split boundaries, and the audit's cost tracks the pair graph it
  * inherits, not the corpus). dd_canonical 16.2 s / 14.1 s (vs 4.4 s at
  * 1× — the cost IS its dd_dedup_groups CC subtree, 13.6 s at 10× on the
  * 20,000×-denser clique graph; the election window adds ~2 s at 826
  * groups and the 30× point goes FLAT for the same reason ngram_jaccard
  * does: the df≤50 cap prunes cross-copy shingles), mix_budget 0.71 s /
  * 1.68 s (flat / 1.9× — map-side scoring plus a source-partitioned
  * cumsum; 20 sources at every factor). All sublinear in data.
  *
  * Semantic-dedup point at 3× (6k vectors; embeddings clone as-is, so
  * every vector gains factor−1 exact duplicates and the cos-pair graph
  * grows ~factor² ≈ 9×): dd_semdedup 5.9 s (1.4× its 4.3 s sf0.1 time —
  * the exact block join absorbs 9× pairs nearly free in-core) vs
  * dd_semdedup_ann 19.9 s (2.9× its 6.9 s — the candidate SHUFFLE carries
  * the 9× pair multiset explicitly, so the ANN path scales with OUTPUT
  * size, its designed behavior; its win is corpora where n² candidate
  * GENERATION can't run, not corpora where the output itself is dense).
  *
  * PQ points at 10× (20k vectors): sim_pq_codes 0.54 s — FLAT vs 0.57 s
  * at 1× (map-side encode; the cost is plan constants, not data);
  * sim_pq_recall 4.8 s vs 4.1 s isolated at 1×, with ONE violation row
  * (query 2 recall 0.5, others 1.0): the cloned corpus puts 10
  * bit-identical copies of every vector in one sub-cluster, hundreds of
  * members collapse to the same ADC codeword, and candidate selection
  * among exact-tie adists (deterministic by vec_id) excludes the
  * large-offset clones. That is the designed resolution limit of a
  * quantized index — members of one codeword are indistinguishable until
  * re-rank, and no tie-break can know which tied code-sharer is the true
  * neighbor. The production posture for clone-saturated corpora is dedup
  * BEFORE indexing (dd_semdedup exists for exactly this), or more
  * bits/overfetch; the driver-corpus certification is unaffected (margins
  * resolve, recall 1.0 at every SF — PqProbe).
  *
  * Round-9 points at 10× (50k docs): dd_incremental 4.65 s vs 3.56 s
  * isolated at 1× — 1.3× time for 10× data, the sub-linear signature of
  * the delta-probe asymmetry (the corpus side is index-build only, never
  * self-joined; all pair work is delta-driven and df-capped).
  * dd_substring_spans 2.15 s (1.27 s at 1×) and dd_substring_contam
  * 2.51 s (1.29 s at 1×) — the k-gram window-site scan's candidate work
  * is bounded by the window-hash buckets, so the heaviest r8 shape also
  * scales sub-linearly. txt_cdc_chunks 2.78 s (1.74 s at 1× — map-side
  * chunk fold, chunk_fp-keyed dup join).
  *
  * Round-9 new-operator points at 10×: txt_pii 0.27 s (0.30 s at 1× —
  * flat, shuffle-free projection), mix_epochs 0.34 s (0.47 s at 1×),
  * txt_quality_cal 1.59 s (1.42 s at 1× — flat, the value histogram is
  * distinct-value-bounded, not row-bounded), emb_rp 0.71 s at 320k
  * output rows (0.73 s at 1× — cost tracks the output), sim_rp_recall
  * 2.73 s (2.16 s at 1× — sub-linear; note the 10× corpus puts exact
  * clones in each query's sub-group, so the recall there certifies the
  * clone-saturated easy case; the honest resolution-limit cert is the
  * gate-SF run).
  *
  * Round-9 fourth-batch points at 10×: dd_contam_fraction 2.10 s (2.44 s
  * at 1× — FLAT: the eval shingle set is fixed-size broadcast state and
  * the train side probes it map-side), emb_cluster_purity 0.68 s (1.10 s
  * at 1× — flat, broadcast-seed assignment + model-sized count matrix),
  * mix_doremi 6.54 s (3.25 s at 1× — 2× for 10× data, the (doc,term) tf
  * shuffle; the unigram join stays vocabulary-shaped on the cloned
  * corpus), dd_semdedup_cluster 3.08 s (1.34 s at 1× — the cloned
  * embeddings put factor-sized exact-dup cliques inside clusters, so the
  * intra-cluster pair OUTPUT grows ~factor²; cost tracks pairs, the
  * quantity the cluster count k dials down at production scale).
  *
  * Fifth batch at 10×: txt_kn_ppl 3.23 s (2.05 s at 1× — sub-linear;
  * the KN model tables are vocabulary-shaped like txt_bigram_ppl's),
  * txt_curriculum 1.13 s (0.98 s at 1× — flat; the two-phase global
  * rank never concentrates the corpus on one reducer). Sixth batch:
  * samp_coreset 1.68 s (1.25 s at 1× — 7 corpus scans against ≤8 model
  * vectors each, sub-linear), dd_size_hist 0.46 s (0.52 s at 1× — flat,
  * the histogram re-aggregates the group-sized relation).
  *
  * Round-11 contraction rungs: emb_knn_mutual 30×: 2.73 s / 100×:
  * 6.32 s at 200k vectors (balanced chunking) (the bounded-block default — the exact twin's
  * measured 30× wall was 92 s); dd_semdedup_ann 30×: 6.32 s / 100×:
  * 5.85 s (exact-dup contraction + in-code bits rule; before it the 100×
  * clone corpus filled 78 GB of candidate shuffle and died);
  * mm_dedup_groups 10×/30×/100×: 1.74 / 2.03 / 3.78 s (driver union-find
  * over the ≤2¹⁶ code universe — was 10.08 s at 10× with the distributed
  * loop); sim_rp_recall 100×: 7.38 s; sim_ivf_recall 30×/100×: 1.26 /
  * 1.41 s (flat — after fixing the triple-evaluated cell-assignment
  * argmin the probe join had inlined; see the BASELINE row); emb_pca_check 10×: 6.31 s (~flat — the
  * Gramian FLOPs distribute, the d²-row eigensolve is size-invariant).
  *
  * Round-12 rungs. dd_signal_agreement after the sampled-audit default
  * (cap 1500): 10×: 5.14 s / 30×: 6.03 s / 100×: 9.21 s (was 17.2 s at
  * 30× riding the exact n²/2 semantic scan; residual growth is the
  * df-capped lexical detector's clone-pair output). ds_group_split 20×:
  * 7.45 s — the owed intermediate point; 9.7/7.45/5.8 at 10×/20×/30× is
  * monotone decreasing past 10× (clone-shingle df crossing the 50 cap).
  * sim_pq_recall clone-100×: 30.0 s (6.7× time for 100× vectors,
  * exponent ≈ 0.41). PERTURB rungs (distinct clones — n_distinct grows):
  * sim_pq_recall 10×: 8.4 s / 30×: 19.2 s / 100×: 29.8 s — zero recall
  * violations at 10×/30×, three at 100× (the quantized index's designed
  * resolution limit on 200k distinct points; see the BASELINE row).
  * dd_semdedup_ann perturb found TWO
  * structural fixes: (1) the r11 bits rule (density ≤ 512 alone) let
  * per-vector candidate work grow as probes(bits)·density — 30× OOMed on
  * ~6.5e9 candidate rows; sizing bits against probes·density ≤ 512
  * bounds candidates at ≤ 512·tables·n. (2) AnnProbe then isolated the
  * exact-verify two-join shape at 114 s of the remaining 181 s wall
  * (arrays attached per candidate row, re-shuffled by the second join);
  * the block-replicated group verify (vectors ride 2B small rows,
  * candidates route as bare id pairs) cut it to: 10×: 17.9 s /
  * 30×: 45.9 s / 100×: 155 s — exponent ≈ 0.94 across the decade,
  * linear in the candidate count by construction.
  *
  * r12 closed the last unmeasured clone decades: dd_dedup_groups 100×:
  * 10.6 s and dd_canonical 100×: 11.6 s (both FLAT vs their 10× points —
  * at high clone factors every shingle's df crosses the 50 cap and the
  * pair graph degenerates, the same mechanism as ds_group_split's
  * decline); emb_pca_check 100×: 27.6 s (4.4× time for 10× vectors —
  * sublinear wall on the irreducible n·d²/2 DECIMAL Gramian, which
  * distributes; the d²-row eigensolve stays size-invariant).
  *
  * The r12 perturb-30× sweep across the remaining embedding-heavy ops
  * measured FLAT curves for sim_ivf_recall 1.03 s, emb_kmeans 1.45 s,
  * dd_incremental_sem 0.65 s, emb_knn_mutual 2.42 s, sim_rp_recall
  * 2.69 s, emb_pca_check 6.76 s (all ≤ ~1.5× their clone-rung values on
  * genuinely distinct growth) — and caught dd_semdedup_cluster at 12.9 s
  * with the fixed-k=16 n²/16 curve attached; the auto-k rule
  * (max(16, ⌈n/512⌉), oracle-mirrored) brought it to 2.9 s at 30× /
  * 9.7 s at 100×, near-linear.
  *
  * Usage: runMain graft.ScaleSmoke [factor] [query ...] [perturb] [skew]
  *        [degenerate] [dim=N] [reuse] [once] [json=<path>]
  * (`reuse` skips re-deriving an already-materialized rung corpus when its
  * recorded derivation signature matches — src dir, factor, and every axis
  * token are part of the signature, so a changed SPARK_GRAFT_SF_DIR or mode
  * re-derives instead of silently measuring a stale corpus).
  * Not part of the driver gate — a builder-side measurement tool. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    // first arg is the factor ONLY if numeric — `ScaleSmoke dd_exact`
    // (factor defaulted) must not throw NumberFormatException
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val rest0 = if (args.headOption.flatMap(_.toIntOption).isDefined)
      args.drop(1).toSeq else args.toSeq
    // `perturb` token: clone embeddings with a tiny per-copy deterministic
    // offset instead of byte-identically — every clone becomes a DISTINCT
    // vector (cos vs its original ≈ 0.9999, still a near-dup pair), so the
    // exact-dup contraction can't absorb the growth and the SRP candidate
    // layer itself carries factor× distinct vectors. The measurement the
    // bits ≈ log₂(n_distinct/B) rule deserves, vs the byte-clone corpus
    // where n_distinct is constant by construction.
    val perturb = rest0.contains("perturb")
    // `skew` token: the third adversarial axis — clone and perturb both grow
    // corpora near-uniformly, so no rung had ever planted a hot key. skew
    // zipf-reassigns AFTER derivation: one source holds ~50% of docs (the
    // samp_bysource/mix_* group axis), one user emits ~30% of events (every
    // evt_* user-keyed window), exactly ShingleDfCap docs share one planted
    // trigram (the largest shingle bucket the df cap admits), and ~50% of
    // vectors collapse into one dominant cluster (pairwise cos ≈ 0.8 — one
    // giant k-means cell WITHOUT pushing the pairs above near-dup
    // thresholds). All reassignment is deterministic (xxhash64 on the row
    // key), and the derived parquet is what both Spark and the drift gate
    // read, so no oracle-portability concern arises at derivation time.
    val skew = rest0.contains("skew")
    // `degenerate` token: append ~20 pathological document rows (empty,
    // single-token, all-whitespace, 4-byte unicode, one ~8 MB doc, one
    // 1 MB single token, punctuation-only) — the hostile-content sweep.
    // Row count is constant regardless of factor; doc_ids are negative so
    // they can never collide with clone offsets.
    val degenerate = rest0.contains("degenerate")
    // `dim=N` token: tile the 64-dim embeddings to N dims (N must be a
    // multiple of 64; tiling preserves every pairwise cosine exactly, so
    // near-dup structure carries over) — the high-dim rung that exercises
    // the BroadcastVerifyMaxDoubles tier boundary with real geometry.
    val dim = rest0.collectFirst { case t if t.startsWith("dim=") =>
      t.stripPrefix("dim=").toInt }.getOrElse(64)
    require(dim >= 64 && dim % 64 == 0, s"dim must be a multiple of 64, got $dim")
    // `reuse` token: skip the corpus derivation when the output dir is
    // already materialized (same factor + same mode ⇒ byte-identical
    // derivation — everything in it is deterministic), so successive
    // query batches against one rung don't re-pay the 100× write
    val reuse = rest0.contains("reuse")
    // `once` token: single timed run per op, no warm pass — the sweep-gate
    // mode (3x cheaper than warm+min-of-2; the recorded p30 baseline is
    // measured the same way, so the drift check compares like with like)
    val once = rest0.contains("once")
    // `json=<path>` token: dump {op: wall_sec} after the sweep — the
    // machine-readable row the perturb drift gate (doctor step 5 /
    // scripts/perturb_check.py) diffs against scripts/perturb_p30_baseline.json
    val jsonOut = rest0.collectFirst { case t if t.startsWith("json=") =>
      t.stripPrefix("json=") }
    val rest = rest0.filterNot(t =>
      t == "perturb" || t == "reuse" || t == "once" || t == "skew" ||
        t == "degenerate" || t.startsWith("dim=") || t.startsWith("json="))
    // `all` token: sweep the ENTIRE registry — the exhaustive audit pass
    // (sorted for a stable, resumable order)
    val names = if (rest == Seq("all")) SparkEntry.queries.keys.toSeq.sorted
      else if (rest.nonEmpty) rest
      else Seq("dd_exact", "dd_ngram_jaccard", "dd_minhash_lsh",
        "dd_source_overlap", "dd_decontaminate", "txt_tfidf", "txt_entropy",
        "emb_kmeans", "txt_pack")
    // fail fast on typo'd names BEFORE paying session startup + the corpus
    // derivation write (same guard discipline as Verify's --only filter)
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — valid: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val spark = GraftSession.local()
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale_${if (perturb) "p" else "x"}$factor" +
      (if (skew) "s" else "") + (if (degenerate) "g" else "") +
      (if (dim != 64) s"_d$dim" else "")

    val derived = Seq("documents", "embeddings", "events")
      .forall(t => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/$t.parquet")))
    // the derivation SIGNATURE is part of reuse: a rung dir left by a
    // different src dir (or a pre-signature build) re-derives instead of
    // silently measuring a stale corpus mixed with fresh dim symlinks
    val sig = s"src=$src factor=$factor perturb=$perturb skew=$skew " +
      s"degenerate=$degenerate dim=$dim"
    val marker = java.nio.file.Paths.get(s"$out/derivation.marker")
    val sigOk = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == sig
    if (reuse && derived && sigOk)
      println(s"[scale] reusing derived corpus at $out")
    else {
      deriveCorpus(spark, src, out, factor, perturb, skew, degenerate, dim)
      java.nio.file.Files.write(marker, sig.getBytes("UTF-8"))
    }
    // the non-derived tables (TPC-H side) symlink to the source SF so the
    // FULL registry can run against a rung corpus — relational queries
    // simply re-measure at 1×, the derived-table families at factor×
    Tables.names.filterNot(Set("documents", "embeddings", "events"))
      .foreach { t =>
        val link = java.nio.file.Paths.get(s"$out/$t.parquet")
        val target = java.nio.file.Paths.get(s"$src/$t.parquet")
        // NOFOLLOW: a stale/broken link must read as present-but-wrong,
        // not absent (Files.exists follows links, so a broken one both
        // dodged re-pointing AND made createSymbolicLink throw); re-point
        // whenever the recorded target differs from the current src so a
        // changed SPARK_GRAFT_SF_DIR can't silently measure the old corpus
        if (java.nio.file.Files.exists(link,
            java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          if (java.nio.file.Files.isSymbolicLink(link) &&
              java.nio.file.Files.readSymbolicLink(link) != target) {
            java.nio.file.Files.delete(link)
            java.nio.file.Files.createSymbolicLink(link, target)
          }
        } else java.nio.file.Files.createSymbolicLink(link, target)
      }

    println(s"[scale] corpus ready: ${factor}x at $out")
    val walls = scala.collection.mutable.LinkedHashMap[String, Double]()
    var crashed = 0
    names.foreach { name =>
      spark.catalog.clearCache()
      val fn = SparkEntry.queries(name)
      // per-op isolation: a crash (the degenerate sweep's whole point is
      // finding them) must not abort the remaining registry — the op is
      // OMITTED from the walls json, which the drift gate flags as
      // missing-from-run, so a crash can never read as a pass
      try {
        if (!once) fn(spark, out).count() // warm (codegen, file listing)
        val times = (1 to (if (once) 1 else 2)).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val rows = fn(spark, out).count()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        walls(name) = times.map(_._1).min
        println(f"[scale] $name%-20s min=${times.map(_._1).min}%8.3f s  rows=${times.head._2}")
      } catch {
        // NonFatal only (r15 advice): after an OutOfMemoryError or
        // LinkageError the shared JVM/SparkSession may be degraded, so
        // every wall measured after it would be baseline-poisoned —
        // fatal errors ABORT the sweep (no walls json is written past
        // this point, so a partial run can never be recorded).
        case scala.util.control.NonFatal(e) =>
          crashed += 1
          println(s"[scale] $name FAILED: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
        case e: Throwable =>
          println(s"[scale] $name FATAL ${e.getClass.getSimpleName} — " +
            "aborting sweep (post-fatal walls are not baseline-valid)")
          throw e
      }
    }
    if (crashed > 0) println(s"[scale] $crashed op(s) FAILED this sweep")
    jsonOut.foreach { path =>
      // Locale.ROOT: a comma-decimal default locale (de_DE) would emit
      // "1,234" — invalid JSON — and crash the drift gate's parser
      val body = walls.map { case (k, v) =>
        "\"" + k + "\": " + "%.3f".formatLocal(java.util.Locale.ROOT, v)
      }.mkString(",\n  ")
      val head = "{\n  \"_factor\": " + factor + ", \"_perturb\": " + perturb +
        ", \"_skew\": " + skew + ", \"_degenerate\": " + degenerate +
        ", \"_dim\": " + dim + ", \"_once\": " + once + ",\n  "
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (head + body + "\n}\n").getBytes("UTF-8"))
      println(s"[scale] walls written to $path")
    }
    spark.stop()
  }

  private def deriveCorpus(spark: org.apache.spark.sql.SparkSession,
      src: String, out: String, factor: Int, perturb: Boolean,
      skew: Boolean = false, degenerate: Boolean = false,
      dim: Int = 64): Unit = {
    val docs = Tables.load(spark, src, "documents")
    // dim tiling FIRST: flatten(array_repeat) multiplies every vector's
    // coordinates verbatim, preserving all pairwise cosines, so the
    // high-dim rung measures the verify-tier boundary on the same
    // neighborhood structure the 64-dim rungs certified. The perturb
    // offset then runs over all `dim` positions (its d-indexed pattern
    // keeps every clone distinct at any width).
    val emb0 = Tables.load(spark, src, "embeddings")
    val emb = if (dim == 64) emb0 else emb0.withColumn("embedding",
      flatten(array_repeat(col("embedding"), dim / 64)))
    val copies = (0 until factor).map { k =>
      // clone mode: a copy-unique PREFIX token — kills cross-copy exact
      // duplication but leaves ~298 of ~300 shingles shared, so every doc
      // sits in a factor-sized near-dup clique AND every shingle's df
      // grows ×factor (crossing the df≤50 cap at high factors, which
      // degenerates the pair graph — the flatness the clone rungs show).
      // perturb mode: SUFFIX every token with the copy id instead — each
      // clone's shingle set becomes disjoint from every other copy's, so
      // the shingle UNIVERSE grows ×factor while per-shingle df stays at
      // its 1× value (the cap never trips) and the pair graph is factor×
      // the original — the n_distinct-grows axis for the lexical family
      // (dd_minhash_lsh / dd_ngram_jaccard / dd_pair_evidence /
      // pipe_dedup_cascade) and the vocabulary-grows axis for the
      // "vocabulary-shaped" claims (mix_doremi, txt_*_ppl).
      val textCol =
        if (perturb && k > 0)
          regexp_replace(col("text"), "(\\S+)", s"$$1c$k").as("text")
        else concat(lit(s"cp$k "), col("text")).as("text")
      val cols = (col("doc_id") + lit(k.toLong * 1000000000L)).as("doc_id") +:
        (docs.columns.filter(c => c != "doc_id" && c != "text").map(col).toSeq :+
          textCol)
      docs.select(cols: _*)
    }
    var docsAll = copies.reduce(_ unionByName _)
    if (skew) {
      // hot source: ~50% of docs collapse into one NEW source value, the
      // remaining 20 sources keep ~2.5% each — the zipf head that makes
      // every source-keyed groupBy/shuffle (samp_bysource, mix_*,
      // src_scorecard) route half the corpus through one key
      docsAll = docsAll.withColumn("source",
        when(pmod(xxhash64(col("doc_id")), lit(2)) === 0, lit("src_hot"))
          .otherwise(col("source")))
      // hot shingle bucket: exactly ShingleDfCap docs (TakeOrdered by doc
      // hash — deterministic, no global window) gain one shared trigram,
      // planting the LARGEST bucket the df cap admits (cap·(cap−1)/2
      // pairs from a single shingle) without tripping the prune
      val hotIds = docsAll.select(col("doc_id"))
        .orderBy(xxhash64(col("doc_id")), col("doc_id"))
        .limit(GraftTuning.ShingleDfCap).withColumn("hot_sh", lit(true))
      docsAll = docsAll.join(broadcast(hotIds), Seq("doc_id"), "left")
        .withColumn("text", when(col("hot_sh"),
          concat(col("text"), lit(" hotshqa hotshqb hotshqc")))
          .otherwise(col("text")))
        .drop("hot_sh")
    }
    if (degenerate) {
      import spark.implicits._
      // pathological rows the text/dedup families never see in the driver
      // corpora: ids negative (clone offsets are ≥0), constant count at
      // every factor. The 8 MB doc stresses per-doc explode paths (~1.2M
      // tokens in ONE document); the 1 MB single token stresses every
      // tokenizer's no-whitespace branch.
      val huge = (0 until 1200000).map(i => "w" + (i % 9973)).mkString(" ")
      val giantTok = "a" * 1000000
      val rows = Seq(
        (-1L, "", "en"), (-2L, "", "xx"),
        (-3L, "solo", "en"), (-4L, "x", "en"), (-5L, "é", "fr"),
        (-6L, "   \t   \n   ", "en"), (-7L, " ", "en"),
        (-8L, "😀 🚀🚀 𝔘𝔫𝔦 你好 مرحبا", "zh"),
        (-9L, "𝓗𝓮𝓵𝓵𝓸 🌍", "en"),
        (-10L, huge, "en"), (-11L, giantTok, "en"),
        (-12L, "!!! ??? ... ;;; ::: ,,,", "en"),
        (-13L, "same same same same same same same same", "en"))
        .toDF("doc_id", "text", "lang")
        .withColumn("source", lit("src_degen"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      docsAll = docsAll.unionByName(
        rows.select(docsAll.columns.toIndexedSeq.map(col): _*))
    }
    docsAll.write.mode("overwrite").parquet(s"$out/documents.parquet")
    var embAll = (0 until factor).map { k =>
      // offset modulus 251 > any rung factor (the r11 form's mod-13 made
      // clones k and k+13 byte-identical, so the 100x corpus carried only
      // ~14 distinct variants per original); k*1009 steps the offset
      // pattern non-degenerately for every k in range, so EVERY clone is
      // a distinct vector and n_distinct genuinely grows factor-fold
      val embCol =
        if (perturb && k > 0)
          transform(col("embedding"), (x, d) =>
            (x.cast("double") +
              (pmod(lit(k) * 1009 + d * 17, lit(251)) - 125).cast("double") * 5e-5)
              .cast("float")).as("embedding")
        else col("embedding")
      val cols = (col("vec_id") + lit(k.toLong * 1000000000L)).as("vec_id") +:
        embCol +: emb.columns.filterNot(Set("vec_id", "embedding")).map(col).toSeq
      emb.select(cols: _*)
    }.reduce(_ unionByName _)
    if (skew) {
      // dominant cluster: ~50% of vectors (hash-selected) are REPLACED by
      // one fixed direction (|b|² ≈ 20.5) plus per-vector uniform jitter
      // (±1.7/dim ⇒ |j|² ≈ 62). Geometry this buys, measured against the
      // unit-norm originals: the blob sits at distance ~4.5 from the
      // original cloud and its points are closer to the blob centroid
      // (d² = |j|² ≈ 62) than to any original-region centroid (≈ 83), so
      // k-means holds it as ONE ~50% cell — the hot-partition stress —
      // while pairwise cos among blob points is |b|²/(|b|²+|j|²) ≈ 0.25
      // (σ ≈ 0.08), BELOW every pair-emitting operator's threshold
      // (dd_embed_cosine 0.4, dd_semdedup 0.9): the corpus skews the
      // PARTITIONING, not the answer's own size. The first sweep used
      // ±0.5 jitter (cos ≈ 0.79) and legitimately quadrupled the ≥0.2
      // pair graph to ~450M rows — which found dd_cos_thresholds
      // materializing it (fixed to stream; see its scaladoc), but also
      // made every pair-emitting op's OUTPUT quadratic by construction,
      // which measures output size, not skew handling.
      embAll = embAll.withColumn("embedding",
        when(pmod(xxhash64(col("vec_id")), lit(2)) === 0,
          transform(col("embedding"), (_, d) =>
            // pmod the hash into a small domain BEFORE arithmetic: ANSI
            // mode makes a raw xxhash64 * 31 a runtime overflow error
            (sin(d.cast("double") * 0.37) * 0.8 +
              (pmod(pmod(xxhash64(col("vec_id")), lit(100003L)) * 31 +
                d.cast("long") * 17, lit(997L)).cast("double") / 997.0 - 0.5)
                * 3.4)
              .cast("float")))
          .otherwise(col("embedding")))
    }
    embAll.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // events clone: offset event_id AND user_id per copy, keep ts/type/
    // value/props — every clone user replays the identical sequence, so
    // the user population grows ×factor while per-user state stays
    // constant. That is the axis the evt_* family scales on (user-keyed
    // windows / per-user sequence caps); ts is already TimestampType
    // after Tables.load normalization, so the re-written parquet takes
    // Tables.load's passthrough branch on reload.
    val events = Tables.load(spark, src, "events")
    var evAll = (0 until factor).map { k =>
      events.select(
        (col("event_id") + lit(k.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k.toLong * 1000000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
    if (skew)
      // hot user: ~30% of ALL events (hash on event_id, so the selection
      // cuts across every clone) re-key to one user — the single-reducer
      // stress for every user-keyed evt_* window/sessionize plan
      evAll = evAll.withColumn("user_id",
        when(pmod(xxhash64(col("event_id")), lit(10)) < 3, lit(424242L))
          .otherwise(col("user_id")))
    evAll.write.mode("overwrite").parquet(s"$out/events.parquet")
  }
}
