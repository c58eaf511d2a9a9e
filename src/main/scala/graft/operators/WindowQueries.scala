package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Event-time window operators over `events` (SURVEY.md §2.3 group windows,
  * §2.4 streaming semantics). These are the BATCH forms of the same
  * `window()`/`session_window()` operators the streaming path uses —
  * Spark's unified API means the exact expressions re-run under
  * `readStream` with a watermark (exercised in StreamingSpec). Oracles
  * reconstruct window assignment arithmetically in DuckDB.
  *
  * Timestamps cross the oracle boundary as epoch integers (`unix_timestamp`
  * / `epoch`) — parquet µs-vs-ns physical types would otherwise make
  * value-hash comparison fragile.
  */
object WindowQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ------------------------------------------------------- tumbling window
  // TUMBLE(ts, INTERVAL '1' MINUTE) per event_type
  // (reference shape: examples/01-datagen-streaming.flinknb:47).
  def qTumble(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // exact decimal sum internally; DOUBLE on the wire — a DECIMAL
        // output column renders scale-preserving via pyarrow but float64
        // via duckdb-pandas, breaking driver-side value hashing (r1).
        sum(col("value").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  val qTumbleSql: String =
    """SELECT CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) AS win_start,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  // ------------------------------------------------------- sliding (HOP)
  // HOP(ts, slide 1 min, size 2 min): each event belongs to 2 windows.
  def qHop(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "2 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"))
      .orderBy(col("win_start"), col("event_type"))

  val qHopSql: String =
    """SELECT win_start, event_type, COUNT(*) AS n_events FROM (
      |  SELECT event_type,
      |    unnest([CAST(floor(epoch(ts) / 60) * 60 AS BIGINT),
      |            CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) - 60]) AS win_start
      |  FROM events
      |) GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  // ------------------------------------------------------- session window
  /** SESSION(ts, gap 5 min) per user — the TIME-BANDED two-phase form
    * (r16 verdict #1): Spark's native `session_window` (kept as
    * [[qSessionNative]], the streaming path's operator) sorts each user's
    * FULL history on one reducer, so a hot key holding 30% of the corpus
    * concentrates 30% of the sort on one task (p100-skew exponent 1.34).
    * Banding event time into the sort key restores parallelism:
    *
    *  - phase 1: gaps-and-islands per (user, ⌊ts/band⌋) — session
    *    FRAGMENTS; the hot user's events shuffle into per-(user, band)
    *    sort units (~120 for the 30-day corpus), never one task;
    *  - phase 2: only fragments that can REACH a band boundary (first
    *    fragment starting within `gap` of its band's start, last fragment
    *    ending within `gap` of its band's end) enter a per-user stitch —
    *    ≤ 2 per touched band, a model-sized frame — where one more
    *    gaps-and-islands pass merges cross-band chains (a session spanning
    *    k bands is k chained fragments). Interior fragments are final on
    *    arrival: in-band fragments are ≥ gap apart by construction, and a
    *    fragment ending > gap below its band end can never reach the next
    *    band's earliest possible event.
    *
    * Tie semantics follow the ORACLE (a gap of exactly 5 min starts a new
    * session — DuckDB's `>= 300 → new`, strict merge `< 300`): Spark's
    * native `session_window` merges AT the tie (measured: two events
    * exactly 300 s apart share a native session), a measure-zero
    * disagreement invisible on real µs data but pinned by
    * BandedOrderedSpec — banded == [[qSessionDirect]] (oracle semantics)
    * everywhere including ties, banded == [[qSessionNative]] on tie-free
    * corpora. Band width (6 h) only trades stitch-frame size against
    * per-unit sort size — any value ≥ gap is correct.
    *
    * TIE CONVENTION cross-reference: the sessionize FAMILY pins the
    * OPPOSITE (inclusive) rule — an exact-gap tie MERGES in
    * [[graft.operators.RelationalQueries.q38Sessionize]] (`> 1800s`
    * splits) and both its streaming twins
    * ([[graft.streaming.StreamOps.streamingSessionize]] /
    * [[graft.streaming.StreamOps.streamingSessionizeTtl]], `<= gapUs`),
    * each hash-pinned by its own DuckDB oracle. Neither side may be
    * "fixed" to match the other without breaking a CORRECTNESS row. */
  def qSession(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 300L * 1000000L
    val bandUs = 6L * 3600 * 1000000L
    val wb = Window.partitionBy(col("user_id"), col("band")).orderBy(col("us"))
    val frags = events(s, dir).filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("band", floor(col("us") / bandUs))
      .withColumn("new_frag",
        when(col("us") - lag(col("us"), 1).over(wb) < gapUs, 0L).otherwise(1L))
      .withColumn("fid", sum(col("new_frag")).over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("band"), col("fid"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n"))
      // boundary reachability: fid == 1 is the band's first fragment (ids
      // are 1-based prefix sums); the last fragment is the one holding the
      // band's max end (fragments never overlap, so max(end) identifies it)
      .withColumn("band_last_end",
        max(col("end_us")).over(Window.partitionBy(col("user_id"), col("band"))))
      .withColumn("stitch",
        (col("fid") === 1L && col("start_us") < col("band") * bandUs + gapUs) ||
          (col("end_us") === col("band_last_end") &&
            col("end_us") > (col("band") + 1L) * bandUs - gapUs))
    val finals = frags.filter(!col("stitch"))
      .select(col("start_us").as("sess_start"), col("user_id"),
        col("n").as("n_events"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    val stitched = frags.filter(col("stitch"))
      .withColumn("new_s",
        when(col("start_us") - lag(col("end_us"), 1).over(wu) < gapUs, 0L)
          .otherwise(1L))
      .withColumn("sid", sum(col("new_s")).over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("start_us")).as("sess_start"), sum(col("n")).as("n_events"))
      .select(col("sess_start"), col("user_id"), col("n_events"))
    finals.unionByName(stitched).orderBy(col("user_id"), col("sess_start"))
  }

  /** Unbanded gaps-and-islands with the ORACLE's tie rule (new session iff
    * gap ≥ 5 min) — the single-window form the banded qSession must equal
    * on EVERY input, exact ties included. Spec twin only: its per-user
    * window is the single-reducer shape banding exists to avoid. */
  def qSessionDirect(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 300L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    events(s, dir).filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) < gapUs, 0L).otherwise(1L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("sess_start"), count(lit(1)).as("n_events"))
      .select(col("sess_start"), col("user_id"), col("n_events"))
      .orderBy(col("user_id"), col("sess_start"))
  }

  /** The native `session_window` form qSession replaced for scale — still
    * the operator the STREAMING session path runs (StreamOps.sessionAgg),
    * and the tie-free cross-check twin (it merges AT an exact-gap tie,
    * where the oracle starts a new session — see qSession's scaladoc). */
  def qSessionNative(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("ts").isNotNull)
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("session_window.start")).as("sess_start"),
        col("user_id"), col("n_events"))
      .orderBy(col("user_id"), col("sess_start"))

  val qSessionSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER w) >= 300 THEN 1 ELSE 0 END AS new_sess
      |  FROM events WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), numbered AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged
      |)
      |SELECT epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS sess_start, user_id,
      |  COUNT(*) AS n_events
      |FROM numbered GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  // --------------------------------------------------------- as-of join
  /** As-of join (Flink `FOR SYSTEM_TIME AS OF` / temporal-join analogue,
    * SURVEY.md §2.3 tier-V, §7.3 custom-if-pursued): for each 'purchase'
    * event, the most recent 'click' by the same user at-or-before its
    * timestamp.
    *
    * Spark-first plan: union the two sides tagged, one shuffle+sort on
    * (user, time), then `last_value(ignoreNulls)` over the running frame —
    * O(n log n) per key, no per-row range probe, no broadcast state. This
    * is the standard scalable as-of on Spark (vs. join+filter+max which
    * re-scans the build side per probe row). */
  def qAsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        lit(null).cast("timestamp").as("click_ts"), lit(1).as("is_probe"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
        col("ts").as("click_ts"), lit(0).as("is_probe"))
    // clicks sort before a purchase at the same (µs) timestamp: is_probe 0<1
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("last_click_ts")).as("last_click_us"))
      .orderBy(col("event_id"))
  }

  val qAsOfJoinSql: String =
    """SELECT p.event_id, p.user_id,
      |  epoch_us(CAST(p.ts AS TIMESTAMP)) AS ts_us,
      |  epoch_us(CAST(c.ts AS TIMESTAMP)) AS last_click_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  // ------------------------------------------------- interval join (batch)
  /** Time-bounded (interval) join — Flink's stream-stream interval join
    * (SURVEY §2.3 tier-V): purchase ⋈ clicks by user within (-10 min, 0].
    * The streaming twin keeps the raw range predicate (StreamingSpec) —
    * Spark infers stream-state eviction FROM that predicate and the
    * watermarks, so it must stay a range condition there.
    *
    * The batch form BANDS the time axis into the equi-join key: clicks
    * key on (user, ⌊ts/10min⌋) and each purchase probes the two 10-min
    * buckets its lookback range can touch, with the exact time bounds as
    * residual filters. Semantics are identical — a click in bucket b
    * matches a purchase probe row only at bkt = b, so no pair duplicates
    * — but the join's unit of work shrinks from per-user to per-(user,
    * 10 minutes). The plain user-keyed form put BOTH time bounds in the
    * post-filter of a user-keyed sort-merge join, so one user holding
    * 30% of a 3M-event corpus (the r15 skew rung) meant ~450k × 450k
    * in-key comparisons in ONE task — the sweep found it 28 minutes into
    * a single pinned core. Banded: that user's quadratic is sliced into
    * 4,320 ten-minute cells (~100×100 each), and a hot KEY no longer
    * implies a hot TASK at any corpus size. */
  def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val bucketUs = 600000000L // 10 minutes, the interval width, in micros
    val ev = events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"),
        floor(unix_micros(col("ts")) / bucketUs).as("bkt0"))
      .select(col("p_id"), col("user_id"), col("p_ts"),
        explode(array(col("bkt0"), col("bkt0") - 1)).as("bkt"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        floor(unix_micros(col("ts")) / bucketUs).as("c_bkt"))
    p.join(c, col("user_id") === col("c_user") && col("bkt") === col("c_bkt") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 10 MINUTES"))
      .groupBy(col("p_id"), col("user_id"))
      .agg(count(lit(1)).as("clicks_before"))
      .orderBy(col("p_id"))
  }

  val qIntervalJoinSql: String =
    """SELECT p.event_id AS p_id, p.user_id, COUNT(*) AS clicks_before
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 10 MINUTE
      |GROUP BY p.event_id, p.user_id
      |ORDER BY p_id""".stripMargin

  // ----------------------------------------------- streaming-dedup analogue
  // dropDuplicates(keys) batch form; the streaming form
  // (dropDuplicatesWithinWatermark) runs in StreamingSpec.
  def qEventDedup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("first_ts_us"),
        count(lit(1)).as("n_dups"))
      .orderBy(col("user_id"), col("event_type"))

  val qEventDedupSql: String =
    """SELECT user_id, event_type,
      |  MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_ts_us, COUNT(*) AS n_dups
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w_tumble" -> (qTumble _),
    "w_hop" -> (qHop _),
    "w_session" -> (qSession _),
    "w_asof_join" -> (qAsOfJoin _),
    "w_interval_join" -> (qIntervalJoin _),
    "w_event_dedup" -> (qEventDedup _),
  )

  val oracles: Map[String, String] = Map(
    "w_tumble" -> qTumbleSql,
    "w_hop" -> qHopSql,
    "w_session" -> qSessionSql,
    "w_asof_join" -> qAsOfJoinSql,
    "w_interval_join" -> qIntervalJoinSql,
    "w_event_dedup" -> qEventDedupSql,
  )
}
