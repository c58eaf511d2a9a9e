package graft.sources

import graft.engine.TableSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source (SURVEY §2.1; reference CONNECTORS.md:119-121 declares jdbc
  * tables with url/table-name/username/password). Flink DDL options map to
  * Spark's JDBC source options; the reader builder needs no database — the
  * driver lookup/connection happens at `.load()`, so a jdbc table whose
  * endpoint (or driver jar) is absent registers fine at DDL time and fails
  * with the driver's clear error on the SELECT's operation.
  */
object Jdbc {

  /** Flink jdbc-connector DDL options → Spark jdbc source options. Pure
    * mapping, unit-tested without a database. */
  def sparkOptions(o: Map[String, String]): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    o.get("url").foreach(v => m += "url" -> v)
    o.get("table-name").foreach(v => m += "dbtable" -> v)
    o.get("username").foreach(v => m += "user" -> v)
    o.get("password").foreach(v => m += "password" -> v)
    o.get("driver").foreach(v => m += "driver" -> v)
    // partitioned parallel scan options pass through under Flink's names
    o.get("scan.partition.column").foreach(v => m += "partitionColumn" -> v)
    o.get("scan.partition.num").foreach(v => m += "numPartitions" -> v)
    o.get("scan.partition.lower-bound").foreach(v => m += "lowerBound" -> v)
    o.get("scan.partition.upper-bound").foreach(v => m += "upperBound" -> v)
    m.result()
  }

  def reader(spark: SparkSession, spec: TableSpec): DataFrame =
    spark.read.format("jdbc").options(sparkOptions(spec.options)).load()
}
