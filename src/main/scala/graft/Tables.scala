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

  /** Register every table as a temp view so SQL-path queries (and the dialect
    * shim) resolve the same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
