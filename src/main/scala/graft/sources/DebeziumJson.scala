package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Debezium-JSON changelog shape (SURVEY §2.1 CDC row; reference
  * CONNECTORS.md:126-140 declares postgres-cdc/mysql-cdc tables whose wire
  * format is the Debezium envelope). A CDC row is
  * `{"before": {...}|null, "after": {...}|null, "op": "c|u|d|r",
  * "ts_ms": <long>}`; `after` is null exactly for deletes.
  *
  * The envelope parsing is pure DataFrame transforms, so the same code runs
  * over any stream of envelopes — a kafka value column in production, a
  * file-backed JSON-lines directory in tests/benchmarks (no CDC endpoint is
  * reachable in this environment).
  */
object DebeziumJson {

  /** Envelope schema for a declared payload row type. */
  def envelope(payload: StructType): StructType = new StructType()
    .add("before", payload)
    .add("after", payload)
    .add("op", StringType)
    .add("ts_ms", LongType)

  /** Envelope rows → flat changelog: payload columns + `__op` + `__ord`
    * (event order = ts_ms; deletes take their payload from `before`). The
    * metadata columns use reserved names so a payload column literally
    * named `op` can't shadow the Debezium op code in downstream
    * index-by-name resolution; a payload that itself declares a reserved
    * name is rejected up front.
    *
    * ts_ms ties (two changes to one key within the same Debezium
    * millisecond are realistic) are NOT resolved here — a read-position
    * expression would be nondeterministic and streaming plans reject those;
    * the per-batch merge adds the positional tiebreaker in batch context
    * (`ChangelogOps.mergeBatch`). */
  def flatten(env: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val payloadCols = env.schema("after").dataType
      .asInstanceOf[StructType].fieldNames
    // __seq/__rn are injected later by the per-batch merge/compaction —
    // reserving them here keeps the rejection up-front instead of letting
    // a payload column be silently clobbered downstream
    val clash = payloadCols.toSet.intersect(Set("__op", "__ord", "__seq", "__rn", "__mt"))
    require(clash.isEmpty,
      s"cdc payload columns ${clash.mkString(",")} collide with reserved changelog metadata names")
    val keepCols = keep.map(col)
    env
      .select(coalesce(col("after"), col("before")).as("__p") +:
        col("op").as("__op") +: col("ts_ms").as("__ord") +: keepCols: _*)
      .select(col("__p.*") +: col("__op") +: col("__ord") +: keepCols: _*)
  }

  /** File-backed Debezium changelog stream: JSON-lines files under `path`,
    * one envelope per line. One file per trigger, oldest first — a
    * changelog replay must apply files in write order, and batch-local
    * compaction across files would otherwise reorder a key's history. */
  def fileStream(spark: SparkSession, path: String, payload: StructType): DataFrame =
    flatten(spark.readStream.schema(envelope(payload))
      .option("maxFilesPerTrigger", "1").json(path))

  /** Batch twin (compaction jobs, tests). Carries `__mt` — the source
    * file's modification time — so whole-directory compaction can order
    * same-ts_ms changes by WRITE order: a batch scan's partition indexes
    * follow split-size packing, not replay order, so position alone
    * (monotonically_increasing_id) would tie-break across files by file
    * SIZE. (The streaming path needs no `__mt`: it replays one file per
    * trigger, oldest-first, so cross-file order is batch order there.) */
  def fileBatch(spark: SparkSession, path: String, payload: StructType): DataFrame =
    flatten(
      spark.read.schema(envelope(payload)).json(path)
        // microseconds, not cast-to-long (= epoch SECONDS): changelog files
        // written within the same second must still order by write time
        .withColumn("__mt",
          unix_micros(col("_metadata.file_modification_time"))),
      keep = Seq("__mt"))
}
