package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata (TESTDATA.md).
  *
  * Tables are plain parquet files, one per table, at `$sfDir/<name>.parquet`.
  * At 100 TB these would be partitioned directories behind the same call — the
  * reader path (`spark.read.parquet`) is identical, and every downstream
  * operator relies only on Catalyst pushdown (filters + column pruning reach
  * the scan), never on single-file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two parquet spellings across testdata
    * generations: TIMESTAMP(NANOS) (Spark's reader rejects it natively;
    * sessions set `spark.sql.legacy.parquet.nanosAsLong`, so it arrives as
    * Long nanos — normalize with integer division, never via double, which
    * loses precision above 2^53 ns) and TIMESTAMP_NTZ(MICROS) (micros with
    * isAdjustedToUTC=false). Both normalize to TimestampType here so every
    * operator — and the streaming specs' watermark declarations, which
    * require an instant-typed event time — sees one type. Sessions run in
    * UTC, so the NTZ cast is value-preserving. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (name == "events" && raw.schema("ts").dataType == TimestampNTZType)
      raw.withColumn("ts", col("ts").cast(TimestampType))
    else raw
  }

  /** [[load]] + hash-repartition on the table's row key, to
    * defaultParallelism partitions — the guide §2.5 "input skew" fix
    * ("one huge unsplittable file … repartition immediately after the
    * read"): the testdata tables are single-row-group parquet, so every
    * scan stage is ONE task no matter the file size, and any map-heavy
    * work pipelined into it (shingling, minhash permutations, vector
    * math, n-gram explodes) runs serially on a 32-core session. The
    * repartition is a narrow, row-sized shuffle that the heavy map
    * amortizes at ANY scale; keying it on the row key (not round-robin)
    * keeps the assignment deterministic under task retry, and the
    * partition count tracks defaultParallelism so lower-core sessions
    * shuffle proportionally less. Use ONLY where per-row map work dwarfs
    * the row itself — a cheap scan+filter is better left serial than
    * paying an extra exchange. On splittable production layouts
    * (multi-row-group files, partitioned directories) the scan already
    * parallelizes and this extra pass is the documented price of keeping
    * one code path; filters and pruning still push through the
    * repartition to the scan. */
  def loadFan(spark: SparkSession, sfDir: String, name: String,
      key: String): DataFrame =
    load(spark, sfDir, name)
      .repartition(spark.sparkContext.defaultParallelism, col(key))

  /** Register every table as a temp view so SQL-path queries (and the dialect
    * shim) resolve the same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
