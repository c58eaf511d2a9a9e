package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects natively. Sessions set `spark.sql.legacy.parquet.nanosAsLong`, so
    * the raw column arrives as Long nanos; normalize to TimestampType (µs)
    * with integer division — never via double, which loses precision above
    * 2^53 ns. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Register every table as a temp view so SQL-path queries (and the dialect
    * shim) resolve the same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
