package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{StructField, StructType}

/** Lookup join (Flink's per-record external-table join, SURVEY.md §2.3
  * tier-V "lookup join — foreachBatch + JDBC read / mapPartitions with
  * connection pool; custom").
  *
  * `Connector` abstracts the external system: `open()` once per PARTITION
  * (this is the whole point — a JDBC/HTTP client per row would melt the
  * external system at scale; per-partition amortizes to
  * numPartitions/cluster connections), `lookup(key)` per row, `close()` on
  * partition end. A JDBC-backed Connector plugs in unchanged; tests use a
  * map-backed one (no external DB exists in this environment).
  */
object LookupJoin {

  trait Connector extends Serializable {
    /** Called once per partition (connection setup). */
    def open(): Unit = ()
    def lookup(key: Any): Option[Seq[Any]]
    def close(): Unit = ()
    /** Schema of the looked-up columns. */
    def valueSchema: StructType
  }

  /** Left-join `df` against the connector on `keyCol`; misses yield nulls. */
  def withLookup(df: DataFrame, keyCol: String, connector: Connector): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ connector.valueSchema.fields
      .map(f => StructField(f.name, f.dataType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val keyIdx = df.schema.fieldNames.indexOf(keyCol)
    require(keyIdx >= 0, s"key column $keyCol not in ${df.schema.fieldNames.mkString(",")}")
    val width = connector.valueSchema.fields.length
    df.mapPartitions { rows =>
      connector.open()
      // close on task completion, not iterator exhaustion: a downstream
      // limit()/failure stops consuming mid-partition and would leak the
      // connection (and repeated hasNext after drain would double-close)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => connector.close()))
      rows.map { r =>
        val vals = connector.lookup(r.get(keyIdx))
          .getOrElse(Seq.fill[Any](width)(null))
        Row.fromSeq(r.toSeq ++ vals)
      }
    }(enc)
  }
}
