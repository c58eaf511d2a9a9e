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

  /** Deterministic "dimension service" stub standing in for an external
    * JDBC/HTTP endpoint (none exists in this environment): computes its
    * answer from the key, declines keys ≥ missFrom. Because it's a pure
    * function, the q22 driver query's DuckDB oracle can reproduce it in
    * SQL — certifying the per-partition open/lookup/close machinery and
    * the null-padded miss path end-to-end. A real connector replaces
    * `lookup` with a client call; nothing else changes. */
  final class StubDimService(missFrom: Long) extends Connector {
    import org.apache.spark.sql.types.{LongType, StringType}
    override def valueSchema: StructType = StructType(Seq(
      StructField("svc_region", LongType), StructField("svc_tag", StringType)))
    override def lookup(key: Any): Option[Seq[Any]] = {
      val k = key.asInstanceOf[Number].longValue()
      if (k >= missFrom) None else Some(Seq(k % 5, s"svc-$k"))
    }
  }

  /** Driver query: supplier lookup-joined against the stub service. */
  def q22(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val sup = graft.Tables.load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    withLookup(sup, "s_nationkey", new StubDimService(missFrom = 20L))
      .orderBy(col("s_suppkey"))
  }

  val q22Sql: String =
    """SELECT s_suppkey, s_nationkey,
      |  CASE WHEN s_nationkey >= 20 THEN NULL
      |       ELSE CAST(s_nationkey % 5 AS BIGINT) END AS svc_region,
      |  CASE WHEN s_nationkey >= 20 THEN NULL
      |       ELSE 'svc-' || s_nationkey END AS svc_tag
      |FROM supplier ORDER BY s_suppkey""".stripMargin

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
