package graft.sources

import graft.engine.TableSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka + JSON format shape (SURVEY §2.1: kafka DDL with 'format'='json',
  * CONNECTORS.md:98-109). The wire shape is Kafka's fixed schema
  * (key/value binary, topic, partition, offset, timestamp); these helpers
  * are the value ⇄ columns mapping used on both the read and write path.
  * They're pure DataFrame transforms — the same code runs on
  * `readStream.format("kafka")` output when a broker exists (no kafka
  * connector jar ships in this environment, so tests drive them with
  * synthetic frames of identical shape).
  */
object KafkaJson {

  /** Kafka value bytes → typed columns per the declared table schema. */
  def parse(frames: DataFrame, schema: StructType): DataFrame =
    frames
      .select(from_json(col("value").cast("string"), schema).as("v"))
      .select(col("v.*"))

  /** Typed rows → Kafka (key, value) JSON frames. */
  def serialize(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*))
        .cast("binary").as("value"))

  /** Flink kafka-connector DDL options → Spark kafka source options
    * (CONNECTORS.md:98-109 ↔ spark-sql-kafka). Pure mapping, unit-tested
    * without a broker or the connector jar. */
  def sparkOptions(o: Map[String, String]): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    o.get("properties.bootstrap.servers")
      .foreach(v => m += "kafka.bootstrap.servers" -> v)
    o.get("topic").foreach(v => m += "subscribe" -> v)
    o.get("scan.startup.mode").foreach {
      case "earliest-offset" => m += "startingOffsets" -> "earliest"
      case "latest-offset" => m += "startingOffsets" -> "latest"
      case _ => () // group-offsets etc.: Spark has no analogue; default
    }
    // remaining properties.* pass through to the kafka client verbatim
    o.foreach { case (k, v) =>
      if (k.startsWith("properties.") && k != "properties.bootstrap.servers")
        m += s"kafka.${k.stripPrefix("properties.")}" -> v
    }
    m.result()
  }

  /** Builds the full read plan for a kafka-declared table:
    * `readStream.format("kafka")` with the mapped options, value parsed per
    * the declared schema. The builder itself needs no broker; without the
    * connector jar on the classpath, `.load()` raises the data-source-not-
    * found error — surfaced asynchronously on the SELECT's operation, never
    * at DDL time. */
  def reader(spark: SparkSession, spec: TableSpec): DataFrame =
    parse(
      spark.readStream.format("kafka")
        .options(sparkOptions(spec.options)).load(),
      spec.schema)
}
