package graft.engine

import scala.collection.mutable

/** Changelog row kinds crossing the client wire — mirrors the reference's
  * `ResultRow.kind` (vscode-extension/src/models/types.ts:24-27) including
  * UPDATE_BEFORE. Spark's update mode emits no retractions itself; the
  * store synthesizes the UpdateBefore/UpdateAfter pair from its keyed state
  * when the protocol flag asks for Flink-changelog parity, and falls back
  * to upsert-only delivery otherwise (SURVEY.md §7.4 known-hard #1).
  */
object RowKind extends Enumeration {
  val Insert, UpdateBefore, UpdateAfter, Delete = Value
}

final case class StoredRow(kind: RowKind.Value, fields: Seq[Any])

object ResultStore {
  /** Normalize a value to value-equality semantics for use as (part of) a
    * store key: BINARY columns arrive as Array[Byte] (identity
    * equals/hashCode), including nested inside Seq for ARRAY<BINARY> — a
    * key that never compares equal to itself across micro-batch
    * recomputations would turn every keyed update into a fresh insert.
    * The ONE shared implementation: Engine's convergent delivery and the
    * store's own upsert/delete all normalize through here (normalizing
    * twice is idempotent). */
  def keyable(v: Any): Any = v match {
    case a: Array[_] => a.toSeq.map(keyable)
    case s: scala.collection.Seq[_] => s.map(keyable)
    case x => x
  }
}

/** One page of results. `resultType` state machine matches the client's
  * (flinkNotebookController.ts:179-236): NOT_READY (retry same token),
  * PAYLOAD (data + nextToken), EOS (final).
  */
final case class FetchResult(
    resultType: String, // NOT_READY | PAYLOAD | EOS
    columns: Seq[String],
    rows: Seq[StoredRow],
    nextToken: Option[Long])

/** Token-paged, bounded result buffer for one operation.
  *
  *  - `append` for batch/append-mode rows.
  *  - `upsert(key, row)` for update-mode streaming aggregates: a re-emitted
  *    key OVERWRITES the previous row in-place (kind=UpdateAfter), so the
  *    client-visible row set converges to the aggregate's current state —
  *    Flink-retraction parity without UPDATE_BEFORE rows.
  *  - Page size and row cap default to the reference's constants
  *    (100 rows/fetch — sqlGatewayClient.ts:128; 10k cap — package.json:276).
  *  - Tokens are strictly sequential per the gateway protocol: fetching
  *    token N re-serves the SAME page (idempotent retry), token N+1 is
  *    only valid after N returned PAYLOAD.
  */
final class ResultStore(
    val columns: Seq[String],
    pageSize: Int = 100,
    maxRows: Int = 10000,
    /** Flink logical-type ROOT name + nullability per column, for the
      * gateway envelope's `logicalType` (empty ⇒ rendered as UNKNOWN —
      * the pre-round-7 simplification, kept for store-only callers). */
    val columnTypes: Seq[(String, Boolean)] = Nil,
    /** Flink-changelog parity: a keyed update to an already-served key is
      * delivered as an UpdateBefore(old)/UpdateAfter(new) PAIR (the
      * reference protocol's retraction shape, models/types.ts:24-27)
      * instead of a lone re-emitted UpdateAfter. */
    emitUpdateBefore: Boolean = false) {

  private val rows = mutable.ArrayBuffer.empty[StoredRow]
  private val keyIndex = mutable.HashMap.empty[Seq[Any], Int]
  private var eos = false
  private var error: Option[Throwable] = None
  @volatile private var pausedFlag = false

  def append(fields: Seq[Any]): Unit = synchronized {
    if (rows.size < maxRows) rows += StoredRow(RowKind.Insert, fields)
  }

  private def normKey(key: Seq[Any]): Seq[Any] = key.map(ResultStore.keyable)

  /** Value-equality for stored field rows (same normalization as keys:
    * BINARY surfaces as Array[Byte] with identity equals). */
  private def sameFields(a: Seq[Any], b: Seq[Any]): Boolean =
    a.length == b.length &&
      a.map(ResultStore.keyable) == b.map(ResultStore.keyable)

  def upsert(rawKey: Seq[Any], fields: Seq[Any]): Unit = synchronized {
    val key = normKey(rawKey)
    keyIndex.get(key) match {
      case Some(i) if rows(i).kind != RowKind.Delete &&
          sameFields(rows(i).fields, fields) =>
        // unchanged: no wire row. Convergent delivery recomputes the WHOLE
        // result every micro-batch; re-emitting every key per recompute
        // would burn the client cap in minutes of 500 ms polling even when
        // nothing changed. (A tombstoned key with equal fields still
        // re-emits — the key must reappear.)
        ()
      case Some(i) if i >= servedWatermark =>
        // not yet delivered: overwrite in place
        rows(i) = StoredRow(RowKind.UpdateAfter, fields)
      case Some(i) =>
        // already served to the client: forward-only paging would never
        // re-deliver a mutation, so RE-EMIT — with the protocol flag on, as
        // the UpdateBefore/UpdateAfter retraction pair; otherwise as a lone
        // UpdateAfter the client applies by key. The old row is tombstone-
        // marked either way so snapshot() stays keyed-unique.
        val extra = if (emitUpdateBefore) 2 else 1
        if (rows.size + extra <= maxRows) {
          val old = rows(i).fields
          rows(i) = StoredRow(RowKind.Delete, old)
          if (emitUpdateBefore) rows += StoredRow(RowKind.UpdateBefore, old)
          keyIndex(key) = rows.size
          rows += StoredRow(RowKind.UpdateAfter, fields)
        } else rows(i) = StoredRow(RowKind.UpdateAfter, fields)
      case None =>
        if (rows.size < maxRows) {
          keyIndex(key) = rows.size
          rows += StoredRow(RowKind.Insert, fields)
        }
    }
  }

  /** Changelog delete: tombstones the keyed row (kind=Delete); excluded
    * from `snapshot()`, still visible to the paging client as a Delete
    * row-kind (Flink retraction parity for CDC streams). */
  def delete(key: Seq[Any]): Unit = synchronized {
    keyIndex.get(normKey(key)).foreach { i =>
      rows(i) = StoredRow(RowKind.Delete, rows(i).fields)
    }
  }

  def markEos(): Unit = synchronized { eos = true }
  def fail(t: Throwable): Unit = synchronized { error = Some(t); eos = true }
  def isEos: Boolean = synchronized(eos)
  def size: Int = synchronized(rows.size)
  def atCapacity: Boolean = synchronized(rows.size >= maxRows)
  /** Rows the store will still accept — producers cap what they pull
    * driver-side to this, so a fast source can't land an arbitrarily large
    * micro-batch on the driver just to have it dropped here. */
  def remainingCapacity: Int = synchronized(math.max(0, maxRows - rows.size))

  /** Client pause/resume: drain control only — the producing query keeps
    * running (flinkNotebookController.ts:761-819). */
  def pause(): Unit = pausedFlag = true
  def resume(): Unit = pausedFlag = false
  def isPaused: Boolean = pausedFlag

  /** Served-batch ranges: token N re-serves exactly batch N (idempotent
    * retry); token servedBatches.size opens the next batch from wherever
    * the previous one ended. Batches are DYNAMIC size (≤ pageSize) — the
    * gateway model, where nextResultUri continues from the last served
    * row. Fixed token×pageSize windows would silently skip the unfilled
    * tail of any partially-served window. */
  private val servedBatches = mutable.ArrayBuffer.empty[(Int, Int)]
  private def servedWatermark: Int = servedBatches.lastOption.map(_._2).getOrElse(0)

  def fetch(token: Long): FetchResult = synchronized {
    error.foreach(t => throw t)
    if (pausedFlag && !eos)
      return FetchResult("NOT_READY", columns, Nil, Some(token))
    if (token < servedBatches.size) { // retry: re-serve the same batch
      val (s, e) = servedBatches(token.toInt)
      val next = if (token + 1 < servedBatches.size || !eos || e < rows.size)
        Some(token + 1) else None
      return FetchResult(if (next.isEmpty) "EOS" else "PAYLOAD",
        columns, rows.slice(s, e).toSeq, next)
    }
    if (token > servedBatches.size) // client skipped ahead: protocol error
      return FetchResult("NOT_READY", columns, Nil, Some(servedBatches.size.toLong))
    val start = servedBatches.lastOption.map(_._2).getOrElse(0)
    val end = math.min(start + pageSize, rows.size)
    if (end > start) {
      servedBatches += ((start, end))
      val fin = eos && end == rows.size
      FetchResult(if (fin) "EOS" else "PAYLOAD", columns,
        rows.slice(start, end).toSeq, if (fin) None else Some(token + 1))
    } else if (eos) FetchResult("EOS", columns, Nil, None)
    else FetchResult("NOT_READY", columns, Nil, Some(token))
  }

  /** Materialized current row set (post-upsert view; tombstones and
    * retraction markers excluded). */
  def snapshot(): Seq[Seq[Any]] = synchronized(
    rows.filter(r => r.kind != RowKind.Delete && r.kind != RowKind.UpdateBefore)
      .map(_.fields).toSeq)
}
