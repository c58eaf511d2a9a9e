package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators (SURVEY.md §2.4): the streaming forms of
  * the window/dedup operators, plus stateful ops Structured Streaming's SQL
  * surface lacks (streaming top-N via flatMapGroupsWithState — SURVEY §7.3
  * "custom if pursued").
  *
  * Batch/stream unification: these transforms take any DataFrame — the same
  * plan runs on `spark.read` and `spark.readStream` inputs. StreamingSpec
  * drives them from a file stream and asserts equality with the batch
  * result (which is itself DuckDB-oracle-checked via WindowQueries).
  */
object StreamOps {

  /** Open a streaming view of a parquet table directory. `maxFilesPerTrigger`
    * throttles micro-batches so multi-batch state paths actually exercise. */
  def readParquetStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling event-time count/sum with watermark (reference flagship:
    * examples/01-datagen-streaming.flinknb:47 — 10s tumble + 5s watermark). */
  def tumbleAgg(events: DataFrame, watermark: String = "5 minutes",
      windowDur: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6)))
          .cast(DecimalType(28, 6)).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows with watermark — state closes `gap` after silence. */
  def sessionAgg(events: DataFrame, watermark: String = "5 minutes",
      gap: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("session_window.start")).as("sess_start"),
        col("user_id"), col("n_events"))

  /** Streaming deduplication with bounded state (Spark 3.5+
    * dropDuplicatesWithinWatermark; SURVEY §2.3 "Dedup" tier-V). */
  def dedupWithinWatermark(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join (purchase ← clicks within `windowUs`
    * before it, same user) with the time band IN THE JOIN KEY — the r15
    * batch w_interval_join banding applied to the STREAMING join (found
    * by the r17 decade soak: Spark's symmetric hash join keys state by
    * the equality columns only and applies the range predicate
    * POST-PROBE, so a hot user's every probe row scanned that user's
    * whole watermark-horizon buffer — ~100 s/batch at p100-skew, ~10 s
    * at p30-skew, quadratic in the hot key's rate). Banding event time
    * into the equality key (band width = the window, probe explodes into
    * its own and the predecessor band — a click in (p_ts − W, p_ts]
    * lives in exactly one of those two) bounds every probe to ~2W of the
    * key's rows regardless of watermark horizon, while watermark-driven
    * state eviction still derives from the untouched event-time range
    * condition. A click pairs with a given purchase through exactly one
    * band, so no duplicate pairs arise. */
  def streamingIntervalJoin(events: DataFrame,
      windowUs: Long = 600L * 1000000L,
      watermark: String = "2 hours"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"),
        floor(unix_micros(col("ts")) / windowUs).as("p_bkt"))
      .withColumn("bkt", explode(array(col("p_bkt"), col("p_bkt") - 1)))
    val c = events.filter(col("event_type") === "click")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        floor(unix_micros(col("ts")) / windowUs).as("c_bkt"))
    p.join(c, col("user_id") === col("c_user") && col("bkt") === col("c_bkt") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr(s"INTERVAL $windowUs MICROSECONDS"))
      .select(col("p_id"), col("user_id"), col("p_ts"), col("c_ts"))
  }

  // ------------------------------------------------------ streaming top-N
  /** Per-group running top-N — the operator Structured Streaming SQL can't
    * express (rank-over-update-stream). State per key: value→count map;
    * each micro-batch folds new rows in and emits the current top-N.
    *
    * State is bounded by the domain of `valueOf` per key (here: users per
    * event type), NOT by stream length — the count map never grows past
    * distinct values. At 100 TB/day the same pattern holds if the value
    * domain is bounded (e.g. top pages, top SKUs); unbounded domains need
    * a sketch (space-saving) drop-in at the same call site.
    */
  case class TopNState(counts: Map[Long, Long])
  case class TopNRow(group: String, value: Long, cnt: Long, rank: Int)

  def streamingTopN(events: Dataset[Row], n: Int = 3)(
      implicit spark: SparkSession): Dataset[TopNRow] = {
    import spark.implicits._
    events
      .select(col("event_type").as("group"), col("user_id").as("value"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TopNState, TopNRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[(String, Long)], state: GroupState[TopNState]) =>
          val prev = state.getOption.getOrElse(TopNState(Map.empty)).counts
          val updated = rows.foldLeft(prev) { case (m, (_, v)) =>
            m.updated(v, m.getOrElse(v, 0L) + 1L)
          }
          state.update(TopNState(updated))
          updated.toSeq
            .sortBy { case (v, c) => (-c, v) }
            .take(n)
            .zipWithIndex
            .map { case ((v, c), i) => TopNRow(group, v, c, i + 1) }
            .iterator
      }
  }

  /** Batch reference for streamingTopN's final answer. */
  def batchTopN(events: DataFrame, n: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("cnt").desc, col("value"))
    events
      .groupBy(col("event_type").as("group"), col("user_id").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  // ------------------------------------------- streaming near-dup detection
  /** Dedup-on-arrival: streaming near-duplicate detection by SimHash
    * blocking. Each document's 64-bit signature splits into `blocks`
    * equal-width blocks; the stream is keyed by (block index, block value)
    * and per-bucket state holds the signatures seen so far. By pigeonhole,
    * two signatures within Hamming ≤ blocks−1 agree on at least one whole
    * block, so every true near-dup pair meets in some bucket — and it is
    * EMITTED only in the pair's first agreeing block (computable locally
    * from the two signatures, no cross-bucket coordination), so a pair
    * colliding in several buckets still reaches the sink exactly once.
    *
    * State: per-bucket signature list — memory is corpus-bounded like any
    * exact dedup-on-arrival. [[streamingNearDupTtl]] is the bounded-state
    * form: a watermark-derived event-time TTL evicts bucket entries as the
    * watermark passes them, trading recall against window age exactly like
    * the reference's interval-scoped dedup. Per-arrival work is |bucket|,
    * the same candidate-bounded cost as the batch operator's block-pair
    * groups. */
  case class SigBlock(block: Int, key: Long, docId: Long, sig: Long)
  case class NearDupPair(id_a: Long, id_b: Long, ham: Int)
  case class BucketState(seen: List[(Long, Long)])

  /** One signature's (block index, block value) keys — the single place
    * the block-split arithmetic lives, shared by both streaming forms. */
  private def blockKeys(sig: Long, blocks: Int): Seq[(Int, Long)] = {
    val width = 64 / blocks
    (0 until blocks).map(b => b -> ((sig >>> (b * width)) & ((1L << width) - 1)))
  }

  /** Explode (doc_id, sig) rows into per-block keys. */
  def sigBlocks(sigs: Dataset[(Long, Long)], blocks: Int)(
      implicit spark: SparkSession): Dataset[SigBlock] = {
    import spark.implicits._
    sigs.flatMap { case (id, sig) =>
      blockKeys(sig, blocks).map { case (b, k) => SigBlock(b, k, id, sig) }
    }
  }

  private def firstAgreeingBlock(a: Long, b: Long, blocks: Int): Int = {
    val width = 64 / blocks
    val mask = (1L << width) - 1
    (0 until blocks).indexWhere(i => ((a ^ b) >>> (i * width) & mask) == 0L)
  }

  /** The pair-emission rule, shared by both streaming forms so the
    * exactly-once contract can't drift between them: an arriving (id, sig)
    * pairs with every in-state signature within maxHam, emitted only when
    * THIS bucket's block index is the pair's first agreeing block. */
  private def pairsAgainst(seen: Iterator[(Long, Long)], id: Long, sig: Long,
      blockIdx: Int, blocks: Int, maxHam: Int): Iterator[NearDupPair] =
    seen.flatMap { case (oid, osig) =>
      val ham = java.lang.Long.bitCount(osig ^ sig)
      if (ham <= maxHam && firstAgreeingBlock(osig, sig, blocks) == blockIdx)
        Some(NearDupPair(math.min(oid, id), math.max(oid, id), ham))
      else None
    }

  def streamingNearDup(sigs: Dataset[(Long, Long)], blocks: Int = 4,
      maxHam: Int = 3)(implicit spark: SparkSession): Dataset[NearDupPair] = {
    import spark.implicits._
    require(maxHam < blocks, "pigeonhole recall needs maxHam < blocks")
    sigBlocks(sigs, blocks)
      .groupByKey(r => (r.block, r.key))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[SigBlock], state: GroupState[BucketState]) =>
          var seen = state.getOption.getOrElse(BucketState(Nil)).seen
          val out = List.newBuilder[NearDupPair]
          rows.foreach { r =>
            // at-least-once upstreams can re-deliver a document; a second
            // copy must neither re-emit its pairs nor grow state, or the
            // exactly-once pair contract breaks
            if (!seen.exists(_._1 == r.docId)) {
              out ++= pairsAgainst(seen.iterator, r.docId, r.sig,
                key._1, blocks, maxHam)
              seen = (r.docId, r.sig) :: seen
            }
          }
          state.update(BucketState(seen))
          out.result().iterator
      }
  }

  // ------------------------------------- streaming near-dup, bounded state
  /** [[streamingNearDup]] with BOUNDED state: entries carry their event
    * time, and each invocation evicts entries the watermark has passed, so
    * a bucket holds only the docs from the trailing watermark window —
    * state is O(arrival rate × window), independent of stream length.
    *
    * Semantics on the in-window set are IDENTICAL to the unbounded form
    * (same pigeonhole blocking, same first-agreeing-block exactly-once
    * emission, same at-least-once re-delivery guard); the trade is recall
    * across time — a pair whose two docs arrive more than the watermark
    * delay apart is not reported, the same contract as the engine's
    * interval-scoped dedup (`dropDuplicatesWithinWatermark`).
    *
    * Mechanics: the watermark is declared HERE, on the exploded per-block
    * frame — event-time tags don't survive a caller-side object transform,
    * and EventTimeTimeout requires one upstream of the stateful operator.
    * Eviction uses `state.getCurrentWatermarkMs()`; each update arms an
    * event-time timeout just past the NEWEST surviving entry, so a bucket
    * that goes quiet is woken exactly once after its last entry expires
    * and its state is REMOVED — idle buckets don't linger in the store. */
  case class SigBlockTs(block: Int, key: Long, docId: Long, sig: Long,
      ts: java.sql.Timestamp)
  case class BucketStateTs(seen: List[(Long, Long, Long)])

  def streamingNearDupTtl(sigs: Dataset[(Long, Long, java.sql.Timestamp)],
      blocks: Int = 4, maxHam: Int = 3, ttl: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[NearDupPair] = {
    import spark.implicits._
    require(maxHam < blocks, "pigeonhole recall needs maxHam < blocks")
    sigs.flatMap { case (id, sig, ts) =>
      blockKeys(sig, blocks).map { case (b, k) => SigBlockTs(b, k, id, sig, ts) }
    }
      .withWatermark("ts", ttl)
      .groupByKey(r => (r.block, r.key))
      .flatMapGroupsWithState[BucketStateTs, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), rows: Iterator[SigBlockTs],
            state: GroupState[BucketStateTs]) =>
          val wm = state.getCurrentWatermarkMs()
          val live = state.getOption.getOrElse(BucketStateTs(Nil)).seen
            .filter(_._3 >= wm)
          var seen = live
          val out = List.newBuilder[NearDupPair]
          rows.foreach { r =>
            // drop late arrivals past the watermark (same contract as the
            // engine's windowed aggregations) and re-deliveries of a doc
            // already in state — see streamingNearDup
            if (r.ts.getTime >= wm && !seen.exists(_._1 == r.docId)) {
              out ++= pairsAgainst(seen.iterator.map(e => (e._1, e._2)),
                r.docId, r.sig, key._1, blocks, maxHam)
              seen = (r.docId, r.sig, r.ts.getTime) :: seen
            }
          }
          if (seen.isEmpty) state.remove()
          else {
            state.update(BucketStateTs(seen))
            // wake this bucket once, just past its newest entry's expiry,
            // so a quiet bucket is purged instead of lingering forever
            // (surviving entries have ts >= wm, so this is > watermark —
            // the precondition setTimeoutTimestamp enforces)
            state.setTimeoutTimestamp(seen.map(_._3).max + 1L)
          }
          out.result().iterator
      }
  }

  /** Batch reference: all near-dup pairs at Hamming ≤ maxHam. */
  def batchNearDup(sigs: Dataset[(Long, Long)], maxHam: Int = 3)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val df = sigs.toDF("doc_id", "sig")
    df.as("a").join(df.as("b"), col("a.doc_id") < col("b.doc_id") &&
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxHam)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("ham"))
  }

  // --------------------------------------- streaming funnel (q36's twin)
  /** Funnel-on-arrival: per-user first-touch conversion stage, maintained
    * incrementally ([[graft.operators.RelationalQueries.q36EventFunnel]]'s
    * streaming twin). Each update emits the user's CURRENT stage (0-3);
    * in update mode the sink's last row per user is the converged answer,
    * which StreamingSpec asserts equals the batch funnel's stage counts.
    *
    * Anchors are RECOMPUTED from retained per-user history on every
    * arrival, so arrival order cannot change the answer — a late-arriving
    * earlier view re-anchors t1 and the downstream stages follow. The
    * retention is deduplicated every update (at-least-once re-deliveries
    * never grow it) and pruned by the funnel's own geometry once a view
    * exists: t1 = min(view) only ever DECREASES, so clicks past t1+win and
    * purchases past t1+2·win can never re-qualify and are dropped; what
    * stays is one anchor plus the events inside a 2-window horizon. Two
    * shapes the geometry can't bound — a user with no view yet (any click
    * could qualify against a future earlier view) and events before t1 —
    * are the watermark's job in production (the [[streamingNearDupTtl]]
    * pattern): below the watermark no re-anchoring view can arrive, so
    * both sets become prunable there. */
  case class FunnelState(minView: Long, clicks: List[Long],
      purchases: List[Long])
  case class FunnelProgress(user_id: Long, stage: Int)

  private def funnelStage(st: FunnelState, winMs: Long): Int = {
    if (st.minView == Long.MaxValue) 0
    else {
      val t1 = st.minView
      val clicksIn = st.clicks.filter(c => c > t1 && c <= t1 + winMs)
      if (clicksIn.isEmpty) 1
      else {
        val t2 = clicksIn.min
        if (st.purchases.exists(p => p > t2 && p <= t2 + winMs)) 3 else 2
      }
    }
  }

  def streamingFunnel(events: DataFrame, winMs: Long = 24L * 3600 * 1000)(
      implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    events
      .filter(col("event_type").isin("view", "click", "purchase") &&
        col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelProgress](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
            state: GroupState[FunnelState]) =>
          var st = state.getOption
            .getOrElse(FunnelState(Long.MaxValue, Nil, Nil))
          rows.foreach { case (_, tpe, ts) =>
            val t = ts.getTime
            st = tpe match {
              case "view"  => st.copy(minView = math.min(st.minView, t))
              case "click" => st.copy(clicks = t :: st.clicks)
              case _       => st.copy(purchases = t :: st.purchases)
            }
          }
          // dedup UNCONDITIONALLY (re-deliveries must not grow state even
          // before the first view); the geometry prune needs an anchor
          st =
            if (st.minView == Long.MaxValue)
              st.copy(clicks = st.clicks.distinct,
                purchases = st.purchases.distinct)
            else
              st.copy(
                clicks = st.clicks.filter(_ <= st.minView + winMs).distinct,
                purchases =
                  st.purchases.filter(_ <= st.minView + 2 * winMs).distinct)
          state.update(st)
          FunnelProgress(uid, funnelStage(st, winMs))
      }
  }

  // ------------------------------------- streaming retention (q37's twin)
  /** Retention-on-arrival: per-user cohort day + active-day offsets,
    * maintained incrementally ([[graft.operators.RelationalQueries
    * .q37Retention]]'s streaming twin). Each update emits the user's full
    * corrected snapshot — cohort re-anchors if an EARLIER day arrives late,
    * and every offset shifts with it, which is why the emission is the
    * whole per-user row rather than per-cell deltas (a late cohort shift
    * would strand already-emitted cells). The cohort matrix is a plain
    * aggregation over the latest snapshot per user (spec-asserted equal to
    * the batch matrix, cell for cell).
    *
    * State per user: the distinct active-day set — bounded by the corpus
    * day span, and in production by the watermark horizon (days below the
    * watermark are final: aggregate them out and drop them). */
  case class RetentionState(days: List[Long])
  case class RetentionSnapshot(user_id: Long, cohort: Long,
      day_offsets: Seq[Long])

  def streamingRetention(events: DataFrame)(
      implicit spark: SparkSession): Dataset[RetentionSnapshot] = {
    import spark.implicits._
    events.filter(col("ts").isNotNull)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[RetentionState, RetentionSnapshot](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)],
            state: GroupState[RetentionState]) =>
          val days = (state.getOption.map(_.days).getOrElse(Nil) ++
            rows.map(_._2)).distinct
          state.update(RetentionState(days))
          val cohort = days.min
          RetentionSnapshot(uid, cohort, days.map(_ - cohort).sorted)
      }
  }

  /** Decontamination-on-arrival: flag each arriving document whose distinct
    * word-3-gram shingles hit a PRE-BUILT eval-set bloom sketch at least
    * `minHits` times ([[graft.operators.DedupOps.ddBloomFlag]]'s streaming
    * twin). The sketch ships as a binary literal
    * ([[graft.functions.BloomSketch.mightContainLit]]) and the whole
    * operator is ONE stateless projection — the per-doc hit count is an
    * array fold inside the row (`array_distinct` + `filter` + `size`), so
    * there is no explode, no shuffle, no state store, and append mode
    * works trivially: throughput is scan-bound at any rate. Bloom has no
    * false negatives, so a contaminated doc can never pass the stream
    * unflagged — identical over-flagging bound as the batch screen.
    *
    * Batch/stream unified: the same transform runs on a `spark.read`
    * frame; StreamingSpec asserts the streamed flags converge to the batch
    * operator's exactly. */
  // ---------------------------------- streaming sessionize (q38's twin)
  case class SessionRow(session_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)
  case class SessionState(events: List[(Long, Long, Double)])
  case class SessionSnapshot(user_id: Long, sessions: Seq[SessionRow])

  /** Sessionization-on-arrival —
    * [[graft.operators.RelationalQueries.q38Sessionize]]'s streaming twin:
    * per-user gaps-and-islands session assignment maintained incrementally.
    * Each update emits the user's full corrected session table (the
    * [[streamingRetention]] snapshot discipline): a late event can MERGE
    * two previously separate sessions — or split none but renumber all of
    * them — so per-session deltas would strand already-emitted rows, while
    * the snapshot is always the batch answer over events-so-far.
    *
    * Value sums mirror the batch DECIMAL(30,15) discipline digit for digit
    * (each double is scaled to 15 decimals HALF_UP, summed exactly, cast
    * back) so convergence is value-exact, not just approximate.
    *
    * TIE CONVENTION: this family merges AT an exact-gap tie (`> gapUs`
    * splits, q38's inclusive rule) — the window-operator family
    * ([[graft.operators.WindowQueries.qSession]]) pins the opposite,
    * strict rule per its own oracle; see q38Sessionize's scaladoc before
    * "unifying" either.
    *
    * State per user: the distinct (ts, event_id, value) set — in
    * production, bounded by the watermark horizon: sessions that END more
    * than gap+watermark before the max seen time are FINAL (no admissible
    * late event can touch or merge them), so they aggregate out of state
    * and emit once. The corpus here spans days, so the spec drives the
    * unbounded form. */
  def streamingSessionize(events: DataFrame, gapUs: Long = 1800L * 1000000L)(
      implicit spark: SparkSession): Dataset[SessionSnapshot] = {
    import spark.implicits._
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionSnapshot](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
            state: GroupState[SessionState]) =>
          val evs = (state.getOption.map(_.events).getOrElse(Nil) ++
            rows.map(r => (r._2, r._3, r._4))).distinct
          state.update(SessionState(evs))
          val sorted = evs.sortBy(e => (e._1, e._2))
          val sessions = Seq.newBuilder[SessionRow]
          var sid = 0L
          var cur = List.empty[(Long, Long, Double)]
          def flush(): Unit = if (cur.nonEmpty) {
            sid += 1
            val s = cur.reverse
            val sum = s.iterator.map(e =>
              BigDecimal(e._3).setScale(15, BigDecimal.RoundingMode.HALF_UP))
              .sum
            sessions += SessionRow(sid, s.head._1, s.last._1, s.size.toLong,
              BigDecimal(sum.toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
          }
          sorted.foreach { e =>
            if (cur.nonEmpty && e._1 - cur.head._1 > gapUs) { flush(); cur = Nil }
            cur = e :: cur
          }
          flush()
          SessionSnapshot(uid, sessions.result())
      }
  }

  // ------------------- horizon-bounded sessionize (the production form)
  case class SessOpen(start_us: Long, end_us: Long, n: Long, sum: BigDecimal)
  case class SessTtlState(opens: List[SessOpen], seen: List[(Long, Long)],
      maxTs: Long, nextSid: Long)
  case class FinalSession(user_id: Long, session_id: Long, start_us: Long,
      end_us: Long, n_events: Long, sum_value: Double)

  /** Horizon-bounded streaming sessionize — [[streamingSessionize]] with
    * the eviction its scaladoc promises, made real (r15 verdict #2: one
    * hot user holding 30% of a stream made the snapshot twin's per-user
    * full-history state the single-reducer cliff). Two structural changes:
    *
    *  - state holds SESSION SUMMARIES, not events: gaps-and-islands
    *    merging only ever needs a session's boundaries (an event extends a
    *    summary iff it lands within `gap` of it; two summaries merge iff
    *    gap-adjacent), so per-user state is O(open sessions), not
    *    O(events) — a hot user costs what its session count costs, at any
    *    event rate;
    *  - `horizonUs` is the allowed lateness: events older than
    *    maxTs − horizon are dropped (the watermark late-drop contract),
    *    and a session whose end is below maxTs − horizon − gap is FINAL —
    *    any admissible event has ts ≥ maxTs − horizon > end + gap, so
    *    nothing can ever extend or merge it. Finals EMIT ONCE and leave
    *    state. The same inequality proves finals leave in start order, so
    *    the emitted session numbering equals the batch ROW_NUMBER
    *    numbering (in-order or horizon-bounded-disorder arrival).
    *
    * Re-delivery dedup: event ids within the admissible horizon are kept
    * (and pruned with it) — at-least-once upstream cannot double-count.
    * Sum discipline mirrors the batch DECIMAL(30,15) form digit for digit
    * (exact scale-15 sums in state; toDouble → setScale(6) at emission).
    *
    * Bounded corpora: the tail sessions never finalize on their own
    * (nothing advances maxTs past them) — the spec closes them with a
    * per-user fence event beyond horizon + gap, the streaming analogue of
    * end-of-input. */
  def streamingSessionizeTtl(events: DataFrame,
      gapUs: Long = 1800L * 1000000L,
      horizonUs: Long = 2L * 3600 * 1000000L)(
      implicit spark: SparkSession): Dataset[FinalSession] = {
    import spark.implicits._
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessTtlState, FinalSession](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
            state: GroupState[SessTtlState]) =>
          val st = state.getOption.getOrElse(
            SessTtlState(Nil, Nil, Long.MinValue, 1L))
          val seen = st.seen.toMap
          // saturating lower bounds: maxTs starts at MinValue and plain
          // subtraction would wrap positive, silently dropping batch 1
          def floorOf(ts: Long, back: Long): Long =
            if (ts == Long.MinValue) Long.MinValue
            else ts - back
          val fresh = rows
            .filter(r => r._2 >= floorOf(st.maxTs, horizonUs) &&
              !seen.contains(r._3))
            .map(r => (r._2, r._3, r._4)).toList.distinct
          val maxTs = (st.maxTs :: fresh.map(_._1)).max
          // each admissible event becomes a singleton summary; one sort +
          // coalesce merges everything gap-adjacent (events into sessions,
          // sessions into each other — the bridging case included)
          val singles = fresh.map(e => SessOpen(e._1, e._1, 1L,
            BigDecimal(e._3).setScale(15, BigDecimal.RoundingMode.HALF_UP)))
          val merged = (st.opens ++ singles).sortBy(o => (o.start_us, o.end_us))
            .foldLeft(List.empty[SessOpen]) {
              case (acc @ (h :: t), o) if o.start_us - h.end_us <= gapUs =>
                SessOpen(h.start_us, math.max(h.end_us, o.end_us),
                  h.n + o.n, h.sum + o.sum) :: t
              case (acc, o) => o :: acc
            }.reverse
          val (fin, opens) = merged.partition(
            _.end_us < floorOf(maxTs, horizonUs + gapUs))
          val seenKept = (st.seen ++ fresh.map(e => (e._2, e._1)))
            .filter(_._2 >= floorOf(maxTs, horizonUs))
          state.update(SessTtlState(opens, seenKept, maxTs,
            st.nextSid + fin.size))
          fin.iterator.zipWithIndex.map { case (s, i) =>
            FinalSession(uid, st.nextSid + i, s.start_us, s.end_us, s.n,
              BigDecimal(s.sum.toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
          }
      }
  }

  /** Exact-substring cut on arrival — the streaming twin of
    * [[graft.operators.DedupOps.ddSubstringCut]]: remove from each
    * arriving document every token covered by a k-token window whose hash
    * hits a PRE-BUILT duplicated-window bloom sketch
    * ([[graft.operators.DedupOps.substringDupSketch]] — model state, a
    * binary literal on the plan). The whole operator is ONE stateless
    * projection: window hashing, sketch probes, and the covered-token
    * filter are all higher-order folds inside the row, so there is no
    * explode, no shuffle, no state store, and append mode is trivial.
    * Bloom has no false negatives — a span duplicated in the reference
    * corpus can never survive the stream; false positives over-cut at the
    * sketch's bounded rate (the safe direction for dedup).
    *
    * Batch/stream unified: the same transform runs on a `spark.read`
    * frame; StreamingSpec asserts streamed output == the batch cut. */
  def streamingSubstringCut(docs: DataFrame, sketch: Array[Byte],
      k: Int = 8): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import graft.functions.BloomSketch
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dup_pos",
        when(size(col("toks")) >= k,
          filter(sequence(lit(1), size(col("toks")) - (k - 1)),
            i => BloomSketch.mightContainLit(sketch,
              xxhash64(concat_ws(" ", slice(col("toks"), i, lit(k)))))))
          .otherwise(expr("CAST(array() AS array<int>)")))
      // covered-index set built ONCE from dup_pos, then a single
      // array_except — NOT a per-position `exists(dup_pos, …)` lambda:
      // withColumn chains collapse into one Project with aliases INLINED,
      // so a dup_pos reference inside a per-element lambda re-evaluates
      // the entire |toks| bloom-probe scan for EVERY position — O(n²)
      // probes, 2.5e9 on a 50k-token document (the r16 degenerate
      // streaming sweep found it 810 s into one pinned core; gate-SF
      // docs at ~300 tokens never showed it). Inlining still duplicates
      // the probe scan once per OUTPUT column that references the chain,
      // but that is a constant factor, not a per-element one.
      .withColumn("covered",
        array_distinct(flatten(transform(col("dup_pos"),
          p => sequence(p, p + (k - 1))))))
      .withColumn("keep_idx",
        array_except(sequence(lit(1), size(col("toks"))), col("covered")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("keep_idx"))).cast("long").as("n_removed"),
        concat_ws(" ",
          transform(col("keep_idx"), j => element_at(col("toks"), j)))
          .as("clean_text"))
  }

  // -------------------------------- streaming budget fill (mix_budget twin)
  /** Token-budget assembly on arrival — the streaming twin of
    * [[graft.operators.SamplingOps.mixBudget]]: per source, admit arriving
    * documents until the source's token budget is crossed, then stay
    * closed forever. A stream cannot sort the future, so the twin is
    * greedy per WAVE: within each micro-batch the group's rows are
    * quality-sorted exactly like the batch assembly (stopword ratio desc,
    * doc_id), and the budget counter carries across waves as keyed state —
    * one long per source. Fed the whole corpus as a single wave it
    * reproduces the batch assembly decision-for-decision (StreamingSpec);
    * across waves it keeps the batch operator's closure law (the counter
    * accumulates every seen doc, kept or not, so once a source crosses its
    * budget no later arrival reopens it).
    *
    * State per source is ONE cumulative count — no doc retention, no TTL
    * concern, unbounded arrival safe at any scale. */
  case class BudgetState(cum: Long)
  case class BudgetDecision(source: String, doc_id: Long, n_tokens: Long,
      kept: Boolean)

  def streamingMixBudget(docs: DataFrame, budgetTokens: Long)(
      implicit spark: SparkSession): Dataset[BudgetDecision] = {
    import spark.implicits._
    import graft.functions.TextFunctions.{tokens, stopwordCount, EnglishStops}
    docs
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_tokens"),
        round(stopwordCount(col("toks"), EnglishStops).cast("double") /
          size(col("toks")).cast("double"), 6).as("q"))
      .as[(Long, String, Long, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[BudgetState, BudgetDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(Long, String, Long, Double)],
            state: GroupState[BudgetState]) =>
          var cum = state.getOption.getOrElse(BudgetState(0L)).cum
          val out = rows.toSeq
            .sortBy { case (id, _, _, q) => (-q, id) }
            .map { case (id, _, n, _) =>
              val kept = cum < budgetTokens
              cum += n
              BudgetDecision(src, id, n, kept)
            }
          state.update(BudgetState(cum))
          out.iterator
      }
  }

  /** DSIR importance scoring on arrival — the streaming twin of
    * [[graft.operators.SamplingOps.sampDsir]] in its hashed form: the
    * trained `b`-bucket llr model ([[graft.operators.SamplingOps.dsirLlrBuckets]])
    * rides the plan as an array literal (model state, b doubles at ANY
    * corpus size — DSIR's hashed feature space is exactly what makes the
    * model stream-portable), and each arriving doc folds its tokens
    * through the bucket lookup in one stateless projection. No explode,
    * no shuffle, no state store; append mode is trivial. A curation
    * pipeline composes this with a downstream threshold/weighted-sample
    * stage the way batch DSIR composes with sampWeighted. */
  def streamingDsirScore(docs: DataFrame, buckets: Array[Double]): DataFrame =
    graft.operators.SamplingOps.dsirScore(docs, buckets)

  def streamingBloomFlag(docs: DataFrame, sketch: Array[Byte],
      minHits: Long = 3L): DataFrame = {
    import graft.functions.TextFunctions.{shingles, tokens}
    import graft.functions.BloomSketch
    // hash FIRST, then dedup the hashes: the batch screen counts distinct
    // 64-bit shingle hashes per doc (shingleSet distincts on xxhash64), so
    // deduping the raw strings here would diverge from it on a within-doc
    // hash collision — both paths must count the same set. The token array
    // materializes in its own projection: shingles()'s per-gram element_at
    // would otherwise re-run the split regex O(grams·n) times per doc
    // (the txtBoilerplate lesson, TextQueries.scala).
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(filter(
          array_distinct(transform(shingles(col("toks"), 3),
            s => xxhash64(s))),
          h => BloomSketch.mightContainLit(sketch, h)))
          .cast("long").as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Streaming Gopher rule battery — filter-on-arrival. The batch battery
    * is one stateless projection (integer-exact rule arithmetic, no
    * aggregation), so the streaming form IS the batch form: same column
    * set, same verdicts, append mode, no state store. */
  def streamingGopherFlags(docs: DataFrame): DataFrame =
    graft.operators.TextQueries.gopherFlagsFrom(docs)

  /** Streaming PII scan + redact: the sanitize-on-arrival form of
    * [[graft.operators.TextQueries.txtPii]] — four regex counts + the
    * redacted-stream fingerprint per arriving doc, one stateless
    * projection (no shuffle, no state store, append mode). */
  def streamingPii(docs: DataFrame): DataFrame =
    graft.operators.TextQueries.txtPiiOf(docs)

  /** Streaming BPE tokenization with a FIXED learned merge table (the
    * batch-trained [[graft.operators.CurationOps.txtBpeTrain]] artifact,
    * passed as literals — train offline, tokenize on arrival): the batch
    * form's explode + doc-keyed agg is re-expressed ROW-LOCALLY (the
    * whole word loop runs inside array HOFs), so the query is one
    * stateless append-mode projection — no shuffle, no state store.
    * Merge patterns are regex-quoted (\Q…\E) since this path applies
    * them via regexp_replace inside a lambda, where exact-substring
    * `replace` has no Column form. */
  def streamingBpeApply(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    import graft.functions.TextFunctions.tokens
    def chainOf(sym: org.apache.spark.sql.Column) =
      merges.foldLeft(sym) { case (e, (a, b)) =>
        val pat = java.util.regex.Pattern.quote(s"·${a}·${b}·")
        val rep = java.util.regex.Matcher.quoteReplacement(s"·${a}${b}·")
        val one = (x: org.apache.spark.sql.Column) =>
          regexp_replace(x, pat, rep)
        one(one(one(e)))
      }
    val perWordSyms = (w: org.apache.spark.sql.Column) =>
      size(filter(split(chainOf(concat(lit("·"),
        array_join(regexp_extract_all(w, lit("."), lit(0)), "·"),
        lit("·"))), "·"), x => x =!= "")).cast("long")
    docs.select(col("doc_id"), tokens(lower(col("text"))).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tok"),
        aggregate(transform(col("ws"), w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_sym0"),
        aggregate(transform(col("ws"), perWordSyms),
          lit(0L), (acc, x) => acc + x).as("n_bpe"))
      .withColumn("saved", col("n_sym0") - col("n_bpe"))
  }

  /** Streaming cluster assignment with a FIXED batch-built seed-centroid
    * model (the classify-on-arrival half of the cluster-then-curate
    * recipe: batch [[graft.operators.EmbeddingOps.seedAssignment]] builds
    * the model, arriving vectors route to their cluster for per-cluster
    * caps / cluster-scoped dedup downstream). Centroids enter as PLAN
    * LITERALS (k·d doubles — model state, the [[streamingBpeApply]]
    * pattern), the argmax folds over k codegen'd dot products with the
    * batch tiebreak (strict > keeps the earliest = lowest cluster id), so
    * the query is one stateless append-mode projection — no shuffle, no
    * state store, no broadcast churn per micro-batch. Emits
    * (vec_id, cluster, cos). */
  def streamingClusterAssign(vecs: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    def cnorm(cv: Seq[Double]): Double = math.sqrt(cv.map(x => x * x).sum)
    val base = vecs.select(col("vec_id"),
        VF.asDouble(col("embedding")).as("ve"))
      .withColumn("nrm", VF.norm(col("ve")))
    // argmax as ONE array_max over (cos, -cluster) structs — lexicographic
    // struct ordering gives max cos then (via the negation) the LOWEST
    // cluster on ties, the batch row_number tiebreak; NaN sorts greatest
    // in both, so even a degenerate zero-norm model agrees. A when-chain
    // fold here embeds the accumulator twice per centroid (condition +
    // otherwise) — 2^k expression growth that OOMs codegen at k=16.
    val entries = cents.sortBy(_._1).map { case (cid, cv) =>
      struct(
        (VF.dot(col("ve"), array(cv.map(lit): _*)) /
          (col("nrm") * lit(cnorm(cv)))).as("cos"),
        lit(-cid).as("nc"))
    }
    base.select(col("vec_id"), array_max(array(entries: _*)).as("b"))
      .select(col("vec_id"), (-col("b.nc")).cast("long").as("cluster"),
        round(col("b.cos"), 6).as("cos"))
  }

  /** Streaming graded contamination scoring: each arriving doc's
    * discriminative shingles probe two STATIC relations — the df-capped
    * universe (corpus model state, rebuilt offline at the batch cadence)
    * and the eval suite's shingle set — via a stream-static join, then a
    * doc-keyed update-mode aggregation emits
    * (doc_id, n_grams, n_contam, contam_frac), the
    * [[graft.operators.DedupOps.ddContamFraction]] verdict on arrival.
    * Docs with no discriminative shingle produce no join rows and so no
    * report row (the batch op reports them as 0/0 — the one documented
    * asymmetry of the streaming form).
    *
    * Scale: the stream side never shuffles except the doc-keyed agg;
    * both static sides are fixed-size model state (broadcastable). */
  def streamingContamFraction(docs: DataFrame, rare: DataFrame,
      evalGrams: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{shingles, tokens}
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(transform(shingles(col("toks"), 3),
          s => xxhash64(s)))).as("hs"))
      .join(rare.select(col("hs")), Seq("hs"))
      .join(evalGrams.select(col("hs"), lit(1).as("hit")), Seq("hs"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_contam"))
      .select(col("doc_id"), col("n_grams"), col("n_contam"),
        (round(col("n_contam").cast("double")
          / col("n_grams").cast("double"), 6) + 0.0).as("contam_frac"))
  }

  /** Streaming content-defined chunking: the per-row CDC fold emits each
    * arriving document's (chunk_id, n_tok, chunk_fp) grain with no state
    * and no shuffle (the cut never looks outside the row). Cross-doc dup
    * marking on a stream is a downstream concern — probe a static/broadcast
    * chunk-fp index the way [[streamingBloomFlag]] probes its sketch. */
  def streamingCdcChunks(docs: DataFrame): DataFrame =
    graft.operators.CurationOps.cdcChunkGrain(docs)

  /** Streaming exact tier of the incremental ingest screen: each arriving
    * doc fingerprints itself and LEFT-JOINS the static corpus fingerprint
    * index ([[graft.operators.DedupOps.fingerprintIndex]]) — a
    * stream-static equi-join, the Structured Streaming form of "probe the
    * persisted index". Spark re-plans the static side per micro-batch; at
    * scale the index sits bucketed/broadcast so the probe is map-side.
    * Verdicts are 'exact' (with the matched canonical id) or 'new'; the
    * near tier on a stream is [[streamingNearDup]]'s block-keyed state. */
  def streamingIncrementalExact(docs: DataFrame,
      corpusFpIndex: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.fingerprint
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .join(corpusFpIndex, Seq("fp"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, "exact").otherwise("new").as("verdict"),
        col("exact_id").as("match_id"))
  }

  /** Streaming twin of [[graft.operators.CurationOps.evtHourlyProfile]]'s
    * count core: (event_type, UTC hour) counts as an update-mode streaming
    * aggregation (the share normalization is a model-frame window the
    * consumer applies to the final counts — window functions don't exist
    * in streaming plans, and the counts ARE the state). */
  def streamingHourlyCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), hour(col("ts")).cast("long").as("hh"))
      .groupBy(col("event_type"), col("hh"))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming twin of [[graft.operators.CurationOps.evtOutliers]]:
    * score-on-arrival against a FROZEN per-type moments model
    * ([[graft.operators.CurationOps.evtValueMoments]], broadcast) — the
    * production anomaly-screen shape, where the model retrains on a batch
    * cadence and the stream only pays a stateless broadcast join + filter
    * per event. */
  def streamingEvtOutliers(events: DataFrame, moments: DataFrame,
      zThr: Double = 3.0): DataFrame =
    events
      .join(broadcast(moments), Seq("event_type"))
      .filter(col("sd") > 0.0 &&
        abs((col("value") - col("m")) / col("sd")) > zThr)
      .select(col("event_id"), col("event_type"), col("value"),
        (round((col("value") - col("m")) / col("sd"), 6) + 0.0).as("z"))

  case class SoftDoc(doc_id: Long, n_copies: Long, weight: Double,
    eff_tokens: Double)
  case class SoftState(members: List[(Long, Long)])
  case class SoftGroup(fp: String, docs: Seq[SoftDoc])

  /** Streaming twin of [[graft.operators.SamplingOps.sampSoftDedup]]:
    * fingerprint-keyed state accumulates the duplicate group's members and
    * re-emits the WHOLE group with refreshed 1/n weights on every arrival
    * — soft-dedup's weights are retroactive (an 11th copy changes the
    * other ten), so a per-doc append emission would ship stale weights by
    * construction; the snapshot emission is the honest streaming form.
    * State is bounded by the duplicate-group size (tiny in a deduped-ish
    * corpus; the pathological all-identical corpus degrades to one group
    * holding everything, the same worst case the batch window has). */
  def streamingSoftDedup(docs: DataFrame)(
      implicit spark: SparkSession): Dataset[SoftGroup] = {
    import graft.functions.TextFunctions.{fingerprint, tokenCount}
    import spark.implicits._
    docs
      .select(fingerprint(col("text")).as("fp"), col("doc_id"),
        tokenCount(col("text")).as("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SoftState, SoftGroup](GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(String, Long, Long)],
            state: GroupState[SoftState]) =>
          val members = (state.getOption.map(_.members).getOrElse(Nil) ++
            rows.map(r => (r._2, r._3))).distinct
          state.update(SoftState(members))
          val n = members.size.toLong
          def r6(x: Double): Double = BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
          SoftGroup(fp, members.sortBy(_._1).map { case (id, tok) =>
            SoftDoc(id, n, r6(1.0 / n), r6(tok.toDouble / n))
          })
      }
  }

  case class TransPair(prev_type: String, next_type: String)
  case class TransState(events: List[(Long, Long, String)])
  case class TransSnapshot(user_id: Long, pairs: Seq[TransPair])

  /** Streaming twin of [[graft.operators.CurationOps.evtTransitions]]:
    * per-user event-sequence state re-emits the user's full ordered
    * transition-pair list on every arrival (update mode); the global
    * transition matrix is the pair rollup of each user's LAST snapshot —
    * StreamingSpec asserts that rollup equals the batch matrix count for
    * count. Same snapshot-state shape as [[streamingSessionize]] (and the
    * same honesty note: state carries the user's history because events
    * may arrive across micro-batches in any order; a production deployment
    * bounds it with the [[streamingNearDupTtl]] watermark-eviction
    * pattern once sequences are assembly-complete). */
  def streamingTransitions(events: DataFrame)(
      implicit spark: SparkSession): Dataset[TransSnapshot] = {
    import spark.implicits._
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[TransState, TransSnapshot](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[TransState]) =>
          val evs = (state.getOption.map(_.events).getOrElse(Nil) ++
            rows.map(r => (r._2, r._3, r._4))).distinct
          state.update(TransState(evs))
          val ordered = evs.sortBy(e => (e._1, e._2)).map(_._3)
          TransSnapshot(uid, ordered.zip(ordered.drop(1)).map {
            case (p, n) => TransPair(p, n)
          })
      }
  }

  // ----------------------------- streaming pattern (evt_pattern's twin)
  case class PatternState(events: List[(Long, Int)])
  case class PatternSnapshot(user_id: Long, matches: Seq[Seq[Long]])

  /** MATCH_RECOGNIZE-on-arrival —
    * [[graft.operators.EventPattern.matchPatternGreedy]]'s streaming twin
    * (AFTER MATCH SKIP PAST LAST ROW): per-user non-overlapping pattern
    * matches maintained incrementally. Each update emits the user's full
    * corrected match list (the [[streamingSessionize]] snapshot
    * discipline): a late row can re-anchor the leftmost match and shift
    * every later match's skip point, so per-match deltas would strand
    * already-emitted rows, while the snapshot is always the batch answer
    * over events-so-far. The matcher itself is
    * [[graft.operators.EventPattern.greedyMatches]] — the SAME function
    * the batch form runs, so twin equality is equality of inputs.
    *
    * State per user: distinct (ts, stage-mask) pairs — the stage mask is
    * computed ONCE in a codegen'd projection, rows qualifying for no
    * stage never enter state, and (ts, mask) dedup makes at-least-once
    * re-delivery a no-op. In production the watermark bounds it
    * (the [[streamingNearDupTtl]] pattern): a match whose window
    * [t1, t1+within] closed below the watermark is final — its rows
    * aggregate out and emit once. */
  def streamingPattern(events: DataFrame,
      stages: Seq[graft.operators.EventPattern.PatternStage],
      withinUs: Long)(
      implicit spark: SparkSession): Dataset[PatternSnapshot] = {
    import spark.implicits._
    val n = stages.size
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        graft.operators.EventPattern.stageMask(stages).as("mask"))
      .filter(col("mask") =!= 0)
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .mapGroupsWithState[PatternState, PatternSnapshot](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Int)],
            state: GroupState[PatternState]) =>
          val evs = (state.getOption.map(_.events).getOrElse(Nil) ++
            rows.map(r => (r._2, r._3))).distinct
          state.update(PatternState(evs))
          PatternSnapshot(uid,
            graft.operators.EventPattern.greedyMatches(
              evs.sorted.toIndexedSeq, n, withinUs).map(_.toSeq))
      }
  }

  case class PatternTtlState(events: List[(Long, Int)],
      seen: List[(Long, Long)], maxTs: Long, lastEnd: Long)
  case class FinalMatch(user_id: Long, stage_ts: Seq[Long])

  /** Horizon-bounded streaming pattern — [[streamingPattern]] with real
    * eviction (the [[streamingSessionizeTtl]] discipline applied to
    * MATCH_RECOGNIZE state): `horizonUs` is the allowed lateness, and the
    * finalization law is geometric. With W = `withinUs` and
    * floor = maxTs − horizon − W, the resolved zone is STRICT (r16
    * verdict #2: admission `ts ≥ maxTs − horizon` and the match window
    * `c_ts ≤ t1 + W` are both INCLUSIVE, so a start at exactly
    * t1 == floor has window end t1 + W == maxTs − horizon — an instant a
    * still-admissible event can hit with equality; resolving at-or-below
    * would evict an anchor batch greedy can still complete):
    *
    *  - a pattern start at t1 < floor is RESOLVED: its whole window
    *    [t1, t1+W] ends strictly below maxTs − horizon, where no
    *    admissible event can land — if it completed, the match is final
    *    (emit once); if not, no future event can complete it (everything
    *    admissible is outside its window);
    *  - an event at ts < floor can never serve a LATER match: stage
    *    anchors are strictly increasing and every unresolved start has
    *    t1 ≥ floor, so an unresolved match only consumes rows at-or-above
    *    floor. Strictly-below-floor events leave state.
    *
    * So state per key = events in the (horizon + W) tail plus the skip
    * cursor (greedy consumption is a prefix property: SKIP PAST LAST ROW
    * resumes after the last emitted match's last row) — bounded by the
    * key's arrival RATE over a fixed span, never by stream length. The
    * matcher is the same pure [[graft.operators.EventPattern
    * .greedyMatches]]; finals leave in start order, so concatenated
    * emissions equal the batch greedy match list (spec: fence-closed
    * equality, late-drop hand case). */
  def streamingPatternTtl(events: DataFrame,
      stages: Seq[graft.operators.EventPattern.PatternStage],
      withinUs: Long, horizonUs: Long = 2L * 3600 * 1000000L)(
      implicit spark: SparkSession): Dataset[FinalMatch] = {
    import spark.implicits._
    val n = stages.size
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        graft.operators.EventPattern.stageMask(stages).as("mask"))
      .filter(col("mask") =!= 0)
      .as[(Long, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PatternTtlState, FinalMatch](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Int)],
            state: GroupState[PatternTtlState]) =>
          val st = state.getOption.getOrElse(
            PatternTtlState(Nil, Nil, Long.MinValue, Long.MinValue))
          def floorOf(ts: Long, back: Long): Long =
            if (ts == Long.MinValue) Long.MinValue else ts - back
          val seen = st.seen.toMap
          val fresh = rows
            .filter(r => r._2 >= floorOf(st.maxTs, horizonUs) &&
              !seen.contains(r._3))
            .map(r => (r._2, r._3, r._4)).toList.distinct
          val maxTs = (st.maxTs :: fresh.map(_._1)).max
          val floor = floorOf(maxTs, horizonUs + withinUs)
          // events above the skip cursor, sorted: the greedy scan's input
          val evs = (st.events ++ fresh.map(e => (e._1, e._3)))
            .filter(_._1 > st.lastEnd).distinct.sorted
          val ms = graft.operators.EventPattern.greedyMatches(
            evs.toIndexedSeq, n, withinUs)
          // final = start below the resolved line; later matches (and the
          // rows greedy consumed for them) stay IN state via the replay
          // form: keep only events past the last final match's end, and
          // past the resolved line — the next update re-derives the same
          // in-flight matches from the kept tail (greedy is deterministic)
          val fin = ms.takeWhile(_.head < floor)
          val lastEnd = if (fin.isEmpty) st.lastEnd else fin.last.last
          val kept = evs.filter(e => e._1 > lastEnd && e._1 >= floor)
          val seenKept = (st.seen ++ fresh.map(e => (e._2, e._1)))
            .filter(_._2 >= floorOf(maxTs, horizonUs))
          state.update(PatternTtlState(kept, seenKept, maxTs, lastEnd))
          fin.iterator.map(m => FinalMatch(uid, m.toSeq))
      }
  }

  case class PatternPlusTtlState(events: List[(Long, Int, Double)],
      seen: List[(Long, Long)], maxTs: Long, lastEnd: Long)
  case class FinalMatchPlus(user_id: Long, t1_us: Long, b1_us: Long,
      b_count: Long, b_sum: Double, b_last_us: Long, t3_us: Long)

  /** Horizon-bounded streaming QUANTIFIED pattern (`A B+ C` with run
    * MEASURES) — [[streamingPatternTtl]]'s replay discipline wired to the
    * quantified matcher [[graft.operators.EventPattern.greedyMatchesPlus]]
    * (r17 verdict #2: the quantified pattern shipped batch-only; every
    * other stateful operator has batch/stream parity).
    *
    * The finalization law is the SAME geometry as the fixed-stage twin,
    * and it covers the run aggregate too: with W = `withinUs` and
    * floor = maxTs − horizon − W (strict, the r16 exact-tie rule),
    *
    *  - a start at t1 < floor is RESOLVED — its whole window [t1, t1+W]
    *    ends strictly below maxTs − horizon, so no admissible event can
    *    join its B-run (run members have ts < t3 ≤ t1 + W) or complete
    *    it: the match, INCLUDING b_count/b_sum/b_last, is final;
    *  - an event at ts < floor can never serve a later match: every
    *    unresolved start has t1 ≥ floor and run/completion members have
    *    ts > t1. Strictly-below-floor events leave state.
    *
    * State per key = (ts, mask, value) rows in the (horizon + W) tail past
    * the skip cursor (SKIP PAST LAST ROW consumption is a prefix property;
    * the kept tail re-derives in-flight matches deterministically) —
    * bounded by the key's arrival RATE over a fixed span, never by stream
    * length. (ts, event_id) dedup makes at-least-once re-delivery a no-op,
    * and the DECIMAL(30,15) run-sum discipline inside the matcher makes
    * fence-closed finals equal the batch rows digit for digit
    * (EventPatternSpec).
    *
    * PINNED CONVENTION (r18 advice, made explicit): state rows collapse
    * on (ts, mask, value) — two genuinely distinct events (different
    * event_id) sharing the same microsecond instant, qualification mask,
    * AND value count as ONE run member in the whole greedy/TTL family
    * (this twin, [[streamingPatternStarTtl]], [[streamingPatternSpecTtl]]
    * and their pure matchers, which all run on (ts, mask, value)
    * tuples). The declarative SKIP TO NEXT ROW form
    * ([[graft.operators.EventPattern.matchPatternPlus]]) counts every
    * source row — both behaviors are separately oracle/spec-pinned
    * (EventPatternSpec "pinned convention" test), and the collapse is
    * what makes the duplicate-tolerance definitional rather than
    * event-id-bookkept: an exact duplicate is INDISTINGUISHABLE from an
    * at-least-once redelivery at the state grain, so the family treats
    * the two identically rather than counting whichever happened to
    * carry a fresh event_id. Do not "fix" by keying state on event_id
    * without re-pinning the fence-closed equality suite. */
  def streamingPatternPlusTtl(events: DataFrame,
      aPred: org.apache.spark.sql.Column, bPred: org.apache.spark.sql.Column,
      cPred: org.apache.spark.sql.Column, withinUs: Long,
      horizonUs: Long = 2L * 3600 * 1000000L)(
      implicit spark: SparkSession): Dataset[FinalMatchPlus] = {
    import spark.implicits._
    import graft.operators.EventPattern
    val stages = Seq(EventPattern.PatternStage("a", aPred),
      EventPattern.PatternStage("b", bPred),
      EventPattern.PatternStage("c", cPred))
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), EventPattern.stageMask(stages).as("mask"),
        col("value"))
      .filter(col("mask") =!= 0)
      .as[(Long, Long, Long, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PatternPlusTtlState, FinalMatchPlus](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Int, Double)],
            state: GroupState[PatternPlusTtlState]) =>
          val st = state.getOption.getOrElse(
            PatternPlusTtlState(Nil, Nil, Long.MinValue, Long.MinValue))
          def floorOf(ts: Long, back: Long): Long =
            if (ts == Long.MinValue) Long.MinValue else ts - back
          val seen = st.seen.toMap
          val fresh = rows
            .filter(r => r._2 >= floorOf(st.maxTs, horizonUs) &&
              !seen.contains(r._3))
            .map(r => (r._2, r._3, r._4, r._5)).toList.distinct
          val maxTs = (st.maxTs :: fresh.map(_._1)).max
          val floor = floorOf(maxTs, horizonUs + withinUs)
          val evs = (st.events ++ fresh.map(e => (e._1, e._3, e._4)))
            .filter(_._1 > st.lastEnd).distinct.sorted
          val ms = EventPattern.greedyMatchesPlus(evs.toIndexedSeq, withinUs)
          val fin = ms.takeWhile(_._1 < floor)
          val lastEnd = if (fin.isEmpty) st.lastEnd else fin.last._6
          val kept = evs.filter(e => e._1 > lastEnd && e._1 >= floor)
          val seenKept = (st.seen ++ fresh.map(e => (e._2, e._1)))
            .filter(_._2 >= floorOf(maxTs, horizonUs))
          state.update(PatternPlusTtlState(kept, seenKept, maxTs, lastEnd))
          fin.iterator.map(m =>
            FinalMatchPlus(uid, m._1, m._2, m._3, m._4, m._5, m._6))
      }
  }

  case class PatternAltTtlState(events: List[(Long, Int)],
      seen: List[(Long, Long)], maxTs: Long, lastEnd: Long)
  case class FinalMatchAlt(user_id: Long, t1_us: Long, t2_us: Long,
      via: String, t3_us: Long)

  /** Horizon-bounded streaming ALTERNATION pattern (`A (B₀|B₁|…) D` with
    * branch provenance) — the TTL replay discipline of
    * [[streamingPatternTtl]] wired to the pure alternation matcher
    * [[graft.operators.EventPattern.greedyMatchesAlt]], completing
    * batch/stream parity for the r18 quantifier envelope. Mask layout is
    * the matcher's: bit 0 = A, bit 1+i = alternative i, bit 1+n = D — one
    * codegen'd stageMask projection, rows qualifying nowhere never enter
    * state. The finalization law is the fixed-stage geometry verbatim
    * (W = `withinUs`, floor = maxTs − horizon − W, strict <): a start
    * below floor has its whole window beyond any admissible event's
    * reach, branch choice included, so its match — provenance and all —
    * is final; unresolved starts sit at-or-above floor and only consume
    * rows above it. Emissions carry the winning alternative's NAME. */
  def streamingPatternAltTtl(events: DataFrame,
      aPred: org.apache.spark.sql.Column,
      alts: Seq[(String, org.apache.spark.sql.Column)],
      dPred: org.apache.spark.sql.Column, withinUs: Long,
      horizonUs: Long = 2L * 3600 * 1000000L)(
      implicit spark: SparkSession): Dataset[FinalMatchAlt] = {
    import spark.implicits._
    import graft.operators.EventPattern
    val nAlts = alts.size
    val names = alts.map(_._1).toIndexedSeq
    val stages = (EventPattern.PatternStage("a", aPred) +:
      alts.map { case (nm, p) => EventPattern.PatternStage(nm, p) }) :+
      EventPattern.PatternStage("d", dPred)
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), EventPattern.stageMask(stages).as("mask"))
      .filter(col("mask") =!= 0)
      .as[(Long, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PatternAltTtlState, FinalMatchAlt](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Int)],
            state: GroupState[PatternAltTtlState]) =>
          val st = state.getOption.getOrElse(
            PatternAltTtlState(Nil, Nil, Long.MinValue, Long.MinValue))
          def floorOf(ts: Long, back: Long): Long =
            if (ts == Long.MinValue) Long.MinValue else ts - back
          val seen = st.seen.toMap
          val fresh = rows
            .filter(r => r._2 >= floorOf(st.maxTs, horizonUs) &&
              !seen.contains(r._3))
            .map(r => (r._2, r._3, r._4)).toList.distinct
          val maxTs = (st.maxTs :: fresh.map(_._1)).max
          val floor = floorOf(maxTs, horizonUs + withinUs)
          val evs = (st.events ++ fresh.map(e => (e._1, e._3)))
            .filter(_._1 > st.lastEnd).distinct.sorted
          val ms = EventPattern.greedyMatchesAlt(
            evs.toIndexedSeq, nAlts, withinUs)
          val fin = ms.takeWhile(_._1 < floor)
          val lastEnd = if (fin.isEmpty) st.lastEnd else fin.last._4
          val kept = evs.filter(e => e._1 > lastEnd && e._1 >= floor)
          val seenKept = (st.seen ++ fresh.map(e => (e._2, e._1)))
            .filter(_._2 >= floorOf(maxTs, horizonUs))
          state.update(PatternAltTtlState(kept, seenKept, maxTs, lastEnd))
          fin.iterator.map { case (t1, t2, bi, t3) =>
            FinalMatchAlt(uid, t1, t2, names(bi), t3)
          }
      }
  }

  case class FinalMatchOpt(user_id: Long, t1_us: Long, took_b: Int,
      b_us: Option[Long], t3_us: Long)
  case class FinalMatchStar(user_id: Long, t1_us: Long, b_count: Long,
      b_sum: Double, b_last_us: Option[Long], t3_us: Long)

  /** Horizon-bounded streaming `A B? C` — [[streamingPatternTtl]]'s
    * replay discipline wired to
    * [[graft.operators.EventPattern.greedyMatchesOpt]], completing
    * batch/stream parity for the optional stage. The strict-floor law
    * covers the BACKTRACKING too: a resolved start's whole window is
    * beyond any admissible event's reach, so no late arrival can flip
    * its took_b decision (a new B or C would have to land inside
    * [t1, t1+W], all strictly below the admission horizon). */
  def streamingPatternOptTtl(events: DataFrame,
      aPred: org.apache.spark.sql.Column, bPred: org.apache.spark.sql.Column,
      cPred: org.apache.spark.sql.Column, withinUs: Long,
      horizonUs: Long = 2L * 3600 * 1000000L)(
      implicit spark: SparkSession): Dataset[FinalMatchOpt] = {
    import spark.implicits._
    import graft.operators.EventPattern
    val stages = Seq(EventPattern.PatternStage("a", aPred),
      EventPattern.PatternStage("b", bPred),
      EventPattern.PatternStage("c", cPred))
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), EventPattern.stageMask(stages).as("mask"))
      .filter(col("mask") =!= 0)
      .as[(Long, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PatternAltTtlState, FinalMatchOpt](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Int)],
            state: GroupState[PatternAltTtlState]) =>
          val st = state.getOption.getOrElse(
            PatternAltTtlState(Nil, Nil, Long.MinValue, Long.MinValue))
          def floorOf(ts: Long, back: Long): Long =
            if (ts == Long.MinValue) Long.MinValue else ts - back
          val seen = st.seen.toMap
          val fresh = rows
            .filter(r => r._2 >= floorOf(st.maxTs, horizonUs) &&
              !seen.contains(r._3))
            .map(r => (r._2, r._3, r._4)).toList.distinct
          val maxTs = (st.maxTs :: fresh.map(_._1)).max
          val floor = floorOf(maxTs, horizonUs + withinUs)
          val evs = (st.events ++ fresh.map(e => (e._1, e._3)))
            .filter(_._1 > st.lastEnd).distinct.sorted
          val ms = EventPattern.greedyMatchesOpt(evs.toIndexedSeq, withinUs)
          val fin = ms.takeWhile(_._1 < floor)
          val lastEnd = if (fin.isEmpty) st.lastEnd else fin.last._3
          val kept = evs.filter(e => e._1 > lastEnd && e._1 >= floor)
          val seenKept = (st.seen ++ fresh.map(e => (e._2, e._1)))
            .filter(_._2 >= floorOf(maxTs, horizonUs))
          state.update(PatternAltTtlState(kept, seenKept, maxTs, lastEnd))
          fin.iterator.map { case (t1, b1, t3) =>
            FinalMatchOpt(uid, t1, if (b1.isDefined) 1 else 0, b1, t3)
          }
      }
  }

  /** Horizon-bounded streaming `A B* C` with run MEASURES —
    * [[streamingPatternPlusTtl]]'s discipline wired to
    * [[graft.operators.EventPattern.greedyMatchesStar]]; an empty run
    * finalizes as b_count 0 / b_sum 0.0 / b_last NULL, and the
    * greedy-emptiness preference is as finalization-safe as opt's
    * backtracking (same window-containment argument). */
  def streamingPatternStarTtl(events: DataFrame,
      aPred: org.apache.spark.sql.Column, bPred: org.apache.spark.sql.Column,
      cPred: org.apache.spark.sql.Column, withinUs: Long,
      horizonUs: Long = 2L * 3600 * 1000000L)(
      implicit spark: SparkSession): Dataset[FinalMatchStar] = {
    import spark.implicits._
    import graft.operators.EventPattern
    val stages = Seq(EventPattern.PatternStage("a", aPred),
      EventPattern.PatternStage("b", bPred),
      EventPattern.PatternStage("c", cPred))
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), EventPattern.stageMask(stages).as("mask"),
        col("value"))
      .filter(col("mask") =!= 0)
      .as[(Long, Long, Long, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PatternPlusTtlState, FinalMatchStar](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Int, Double)],
            state: GroupState[PatternPlusTtlState]) =>
          val st = state.getOption.getOrElse(
            PatternPlusTtlState(Nil, Nil, Long.MinValue, Long.MinValue))
          def floorOf(ts: Long, back: Long): Long =
            if (ts == Long.MinValue) Long.MinValue else ts - back
          val seen = st.seen.toMap
          val fresh = rows
            .filter(r => r._2 >= floorOf(st.maxTs, horizonUs) &&
              !seen.contains(r._3))
            .map(r => (r._2, r._3, r._4, r._5)).toList.distinct
          val maxTs = (st.maxTs :: fresh.map(_._1)).max
          val floor = floorOf(maxTs, horizonUs + withinUs)
          val evs = (st.events ++ fresh.map(e => (e._1, e._3, e._4)))
            .filter(_._1 > st.lastEnd).distinct.sorted
          val ms = EventPattern.greedyMatchesStar(evs.toIndexedSeq, withinUs)
          val fin = ms.takeWhile(_._1 < floor)
          val lastEnd = if (fin.isEmpty) st.lastEnd else fin.last._5
          val kept = evs.filter(e => e._1 > lastEnd && e._1 >= floor)
          val seenKept = (st.seen ++ fresh.map(e => (e._2, e._1)))
            .filter(_._2 >= floorOf(maxTs, horizonUs))
          state.update(PatternPlusTtlState(kept, seenKept, maxTs, lastEnd))
          fin.iterator.map { case (t1, n, s2, last, t3) =>
            FinalMatchStar(uid, t1, n, s2, last, t3)
          }
      }
  }

  /** One generic emission row: per-stage parallel sequences in stage
    * order — `stage_ts`/`run_last` use Long.MinValue as the absent
    * sentinel (skipped `?`/`*`, empty `*` run), `stage_bi` the branch
    * index (Int.MaxValue when skipped), `run_count`/`run_sum` 0/0.0 for
    * non-run stages. */
  case class FinalMatchSpec(user_id: Long, stage_ts: Seq[Long],
      stage_bi: Seq[Int], run_count: Seq[Long], run_sum: Seq[Double],
      run_last: Seq[Long])

  /** Horizon-bounded streaming twin for ANY compiled stage sequence —
    * the TTL replay discipline of [[streamingPatternTtl]] driving the ONE
    * generic matcher [[graft.operators.PatternCompiler.genericMatches]]
    * (r18 verdict #1: the five bespoke twins share one discipline; the
    * compiler's AST now generates it). The finalization law is unchanged
    * — with W = `withinUs` and floor = maxTs − horizon − W (strict <), a
    * start below floor has its whole window [t1, t1+W] beyond any
    * admissible event's reach, so every arm decision inside it
    * (backtracking, branch choice, run membership) is final; unresolved
    * starts sit at-or-above floor and consume only rows above it. State
    * per key = (ts, mask, value) rows in the (horizon + W) tail past the
    * skip cursor; (ts, event_id) dedup makes at-least-once a no-op. The
    * bespoke twins stay wired for the five hash-pinned rows; this is the
    * composition path (e.g. `A (B|C)+ D` — evt_pattern_combo's twin),
    * equality-gated against the generic matcher in PatternCompilerSpec. */
  def streamingPatternSpecTtl(events: DataFrame,
      stages: Seq[graft.operators.PatternCompiler.PStage], withinUs: Long,
      horizonUs: Long = 2L * 3600 * 1000000L)(
      implicit spark: SparkSession): Dataset[FinalMatchSpec] = {
    import spark.implicits._
    import graft.operators.PatternCompiler
    // the AST holds Columns (not serializable) — the closure gets only
    // the serializable shape; the predicates ride the mask projection
    val shape = PatternCompiler.shapesOf(stages)
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), PatternCompiler.specMask(stages).as("mask"),
        col("value"))
      .filter(col("mask") =!= 0)
      .as[(Long, Long, Long, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PatternPlusTtlState, FinalMatchSpec](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Int, Double)],
            state: GroupState[PatternPlusTtlState]) =>
          val st = state.getOption.getOrElse(
            PatternPlusTtlState(Nil, Nil, Long.MinValue, Long.MinValue))
          def floorOf(ts: Long, back: Long): Long =
            if (ts == Long.MinValue) Long.MinValue else ts - back
          val seen = st.seen.toMap
          val fresh = rows
            .filter(r => r._2 >= floorOf(st.maxTs, horizonUs) &&
              !seen.contains(r._3))
            .map(r => (r._2, r._3, r._4, r._5)).toList.distinct
          val maxTs = (st.maxTs :: fresh.map(_._1)).max
          val floor = floorOf(maxTs, horizonUs + withinUs)
          val evs = (st.events ++ fresh.map(e => (e._1, e._3, e._4)))
            .filter(_._1 > st.lastEnd).distinct.sorted
          val ms = PatternCompiler.genericMatchesShape(
            evs.toIndexedSeq, shape, withinUs)
          val fin = ms.takeWhile(_.head.anchor < floor)
          val lastEnd =
            if (fin.isEmpty) st.lastEnd else fin.last.last.anchor
          val kept = evs.filter(e => e._1 > lastEnd && e._1 >= floor)
          val seenKept = (st.seen ++ fresh.map(e => (e._2, e._1)))
            .filter(_._2 >= floorOf(maxTs, horizonUs))
          state.update(PatternPlusTtlState(kept, seenKept, maxTs, lastEnd))
          fin.iterator.map(m => FinalMatchSpec(uid, m.map(_.anchor),
            m.map(_.bi), m.map(_.count), m.map(_.sum), m.map(_.last)))
      }
  }

  /** Streaming winnowing fingerprints — the MOSS selection of
    * [[graft.operators.TextQueries.txtWinnowing]] on arrival. The batch
    * side's doc-keyed sliding window min becomes a ROW-LOCAL array_min
    * over a w-slice of the gram-key array (no window exec, no state for
    * the selection itself); the cross-doc shared-fp count probes the
    * STATIC batch-built fp→df index
    * ([[graft.operators.TextQueries.winnowingFpIndex]], model state
    * rebuilt at the batch cadence) via a stream-static left join, and ONE
    * doc-keyed update-mode aggregation rolls the exploded fingerprints
    * back up. Emits the batch columns
    * (doc_id, n_grams, n_sel, n_fp, n_fp_shared, density); docs with
    * fewer than w grams emit nothing (batch parity — no full window
    * exists). Keys are the batch bytes exactly: md5(gram) ++
    * lpad(10⁷ − pos), so lexicographic array_min = (min hash, rightmost
    * pos), the same tie rule.
    *
    * Scale: selection is map-side codegen'd array work; the only state is
    * the doc-keyed agg (bounded: each doc's fps arrive in one batch); the
    * index side is a static relation Spark broadcasts or shuffles once
    * per micro-batch plan. */
  def streamingWinnowing(docs: DataFrame, fpIndex: DataFrame,
      k: Int = 3, w: Int = 4): DataFrame = {
    import graft.functions.TextFunctions.{shingles, tokens}
    // mirror the batch sentinel guard (TextQueries.txtWinnowing): past
    // 10⁷ grams the subtraction goes negative and '-' sorts before
    // digits, silently flipping the rightmost-tie rule — fail fast
    // instead, inside the key expression so it can't be pruned
    val keys = transform(shingles(col("toks"), k), (g, i) => {
      val pos = i + 1
      val guarded = when(pos < lit(10000000L), pos)
        .otherwise(raise_error(concat(
          lit("streaming_winnowing: gram position "), pos.cast("string"),
          lit(" >= 10^7 sentinel — rightmost-tie key would misorder"))))
      concat(md5(g.cast("binary")),
        lpad((lit(10000000L) - guarded).cast("string"), 8, "0"))
    })
    val perDoc = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), keys.as("keys"))
      .filter(size(col("keys")) >= w)
      .select(col("doc_id"), size(col("keys")).cast("long").as("n_grams"),
        array_distinct(transform(
          sequence(lit(1), size(col("keys")) - (w - 1)),
          j => array_min(slice(col("keys"), j, lit(w))))).as("sels"))
      .select(col("doc_id"), col("n_grams"),
        size(col("sels")).cast("long").as("n_sel"),
        array_distinct(transform(col("sels"),
          s2 => substring(s2, lit(1), lit(32)))).as("fps"))
    perDoc
      .select(col("doc_id"), col("n_grams"), col("n_sel"),
        explode(col("fps")).as("fp"))
      .join(fpIndex, Seq("fp"), "left")
      .groupBy(col("doc_id"), col("n_grams"), col("n_sel"))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_fp_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_sel"), col("n_fp"),
        col("n_fp_shared"),
        (round(col("n_sel") / (col("n_grams") - (w - 1)), 6) + 0.0)
          .as("density"))
  }

  /** Streaming containment screen — the directed, ingest-time form of
    * [[graft.operators.DedupOps.ddContainment]]: each arriving document's
    * discriminative shingles probe the STATIC df-capped corpus shingle
    * table, and one update-mode aggregation emits a
    * (delta doc, corpus doc) containment verdict per partner above `thr`.
    * `n_delta` (the arriving doc's rare-shingle count — the batch |A|)
    * is computed ROW-LOCALLY against an oversized Bloom sketch of the
    * rare universe (the [[streamingSubstringCut]] sketch discipline;
    * Structured Streaming allows one aggregation per query, so the
    * per-doc count can't be a second groupBy), then carried through the
    * pair aggregation as a group key. Both static relations join BEFORE
    * the aggregation — stream-static joins after a streaming agg are
    * unsupported. On a corpus-replay stream every batch pair (a,b)
    * appears as BOTH directed rows (a→b and b→a); StreamingSpec folds
    * the directed form back onto the batch relation.
    *
    * Scale: the corpus side is a static table probed per micro-batch,
    * never self-joined; per-delta-doc work is bounded by its rare-shingle
    * count × their (df-capped ≤ dfCap) partner lists. */
  def streamingContainment(docs: DataFrame, corpusSh: DataFrame,
      corpusCnt: DataFrame, rareSketch: Array[Byte],
      thr: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions.{shingles, tokens}
    import graft.functions.BloomSketch
    val hsArr = array_distinct(transform(shingles(col("toks"), 3),
      s2 => xxhash64(s2)))
    val deltaSh = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        filter(hsArr,
          h => BloomSketch.mightContainLit(rareSketch, h)).as("hs_arr"))
      .filter(size(col("hs_arr")) > 0)
      .select(col("doc_id"), size(col("hs_arr")).cast("long").as("n_delta"),
        explode(col("hs_arr")).as("hs"))
    deltaSh
      .join(corpusSh.select(col("doc_id").as("c_id"), col("hs")), Seq("hs"))
      .filter(col("c_id") =!= col("doc_id"))
      .join(corpusCnt.select(col("doc_id").as("c_id"),
        col("n").as("n_corpus")), Seq("c_id"))
      .groupBy(col("doc_id").as("id_delta"), col("n_delta"),
        col("c_id").as("id_corpus"), col("n_corpus"))
      .agg(count(lit(1)).as("n_inter"))
      .select(col("id_delta"), col("id_corpus"), col("n_inter"),
        col("n_delta"), col("n_corpus"),
        round(col("n_inter") / col("n_delta"), 6).as("cont_delta_in_corpus"),
        round(col("n_inter") / col("n_corpus"), 6).as("cont_corpus_in_delta"))
      .filter(greatest(col("cont_delta_in_corpus"),
        col("cont_corpus_in_delta")) >= thr)
  }
}
