package graft

import java.util.concurrent.atomic.AtomicInteger
import graft.operators.LookupJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

// top-level (not spec-nested) so the closure serializes without capturing
// the suite (which holds a SparkSession)
object LookupOpens { val count = new AtomicInteger(0) }

class MapConnector extends LookupJoin.Connector {
  @transient private var dict: Map[Any, Seq[Any]] = _
  override def open(): Unit = {
    LookupOpens.count.incrementAndGet()
    dict = Map(0L -> Seq("region-a"), 1L -> Seq("region-b"), 2L -> Seq("region-c"))
  }
  override def lookup(key: Any): Option[Seq[Any]] = dict.get(key)
  override def valueSchema: StructType =
    StructType(Seq(StructField("region_name", StringType)))
}

class LookupJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  test("lookup join enriches rows, misses null, connection opens per partition") {
    val nations = Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .select("n_nationkey", "n_regionkey").repartition(3)
    val enriched = LookupJoin.withLookup(
      nations.withColumn("key", nations("n_regionkey").cast("long")),
      "key", new MapConnector)
    val rows = enriched.collect()
    assert(rows.length == 25)
    val hit = rows.filter(_.getAs[Long]("key") <= 2)
    val miss = rows.filter(_.getAs[Long]("key") > 2)
    assert(hit.nonEmpty && hit.forall(_.getAs[String]("region_name").startsWith("region-")))
    assert(miss.nonEmpty && miss.forall(_.getAs[String]("region_name") == null))
    // local mode: connector runs in-process, so the counter is visible.
    assert(LookupOpens.count.get() >= 1 && LookupOpens.count.get() <= 3)
  }

  test("cumulate windows: every event lands in 1..size/step prefixes") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val cum = graft.operators.CumulateWindows.cumulate(ev, col("ts"), 60, 120)
    val perEvent = cum.groupBy(col("event_id")).count().collect().map(_.getLong(1))
    assert(perEvent.forall(c => c == 1 || c == 2))
    assert(cum.filter(col("win_end") <= unix_timestamp(col("ts"))).count() == 0)
  }
}
