package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC / changelog interpretation (SURVEY.md §2.1 CDC row: "no native Spark
  * CDC source; parity route = Debezium-shaped stream + changelog
  * interpretation"). Input rows carry `op` ∈ {c,u,d,r} (create/update/
  * delete/read-snapshot), a key, an event ordering column, and the payload.
  *
  *  - `latestSnapshot` (batch): current table state = last non-delete row
  *    per key. One shuffle on the key; the window is a per-key top-1, so
  *    at 100 TB this is the standard "compact a changelog" job shape.
  *  - `upsertStream` (streaming): per-micro-batch reduction to the latest
  *    row per key via the same expressions under foreachBatch merge, or
  *    dropDuplicatesWithinWatermark for at-least-once collapse.
  */
object ChangelogOps {

  /** Per-key top-1 by `ord` descending, KEEPING delete rows (and the op
    * column): the winning row per key even when that winner is a
    * tombstone. Incremental snapshot folding needs the tombstones — a
    * delete's ordinal must keep shadowing older out-of-order changes that
    * arrive in later micro-batches. */
  def compact(changelog: DataFrame, keyCols: Seq[String],
      ord: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord.desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Batch/foreachBatch compaction: last-writer-wins per key, deletes drop
    * the key. `ord` breaks ties (e.g. the CDC LSN or kafka offset);
    * `opCol` names the changelog-op column (`__op` for DebeziumJson
    * streams, `op` for ad-hoc changelogs). */
  def latestSnapshot(changelog: DataFrame, keyCols: Seq[String],
      ord: Column, opCol: String = "op"): DataFrame =
    compact(changelog, keyCols, ord)
      .filter(col(opCol) =!= "d")
      .drop(opCol)

  /** Streaming form: collapse each micro-batch to latest-per-key and MERGE
    * into keyed store state — upserts for c/u/r, tombstones for d (a delete
    * must remove a key inserted in an EARLIER batch, so deletes can't just
    * be filtered out batch-locally). Suitable for foreachBatch.
    *
    * `opCol` names the changelog-op column (DebeziumJson.flatten emits the
    * reserved `__op`, immune to payload-name collisions; ad-hoc changelogs
    * default to `op`). That column — and the engine-internal `__ord` order
    * column when present — never reach the store.
    *
    * The `toLocalIterator` drain below is the engine's ONE deliberate
    * driver-side row loop, and it is BOUNDED by construction: the store is
    * the notebook result protocol's keyed buffer, capped at the protocol's
    * 10k-row limit (ResultStore evicts beyond it), and the iterator pulls
    * one partition at a time rather than collecting the batch. A
    * table-sized CDC snapshot is not this path's job — that's the batch
    * [[latestSnapshot]], which stays fully distributed. */
  def mergeBatch(store: graft.engine.ResultStore, keyCols: Seq[String],
      ord: Column, opCol: String = "op")(batch: DataFrame, batchId: Long): Unit = {
    // Deterministic tie-break for equal `ord` values (same-millisecond
    // changes to one key): monotonically_increasing_id() encodes
    // (partition, row-in-partition), and a file-source micro-batch's
    // partitions are byte ranges in file order — so replay position breaks
    // the tie, not hash-partition race order. Legal here (batch context
    // inside foreachBatch); the streaming plan itself must stay free of
    // nondeterministic expressions.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord.desc, col("__seq").desc)
    val latest = batch
      .withColumn("__seq", monotonically_increasing_id())
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__seq")
    val fieldNames = latest.schema.fieldNames
    val keyIdx = keyCols.map(fieldNames.indexOf(_))
    val opIdx = fieldNames.indexOf(opCol)
    require(opIdx >= 0, s"changelog op column '$opCol' missing from ${fieldNames.mkString(",")}")
    val dropIdx = fieldNames.zipWithIndex
      .collect { case (n, i) if n == opCol || n == "__ord" => i }
      .sorted.reverse
    latest.toLocalIterator().forEachRemaining { r =>
      val fields = r.toSeq
      val key = keyIdx.map(fields)
      if (fields(opIdx) == "d") store.delete(key)
      else store.upsert(key, dropIdx.foldLeft(fields)((f, i) => f.patch(i, Nil, 1)))
    }
  }
}
