package graft.sources

import org.apache.spark.sql.DataFrame
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
}
