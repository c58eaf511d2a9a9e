package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Flink CUMULATE window TVF (SURVEY.md §2.3 group windows tier-V: "no
  * direct primitive ⇒ union of growing windows or custom").
  *
  * CUMULATE(ts, step, size) assigns each row to the expanding windows
  * [W, W+step), [W, W+2·step), …, [W, W+size) where W = floor(ts, size) —
  * i.e. every size-aligned window prefix that already contains the row.
  * Implemented as one generated column + explode: k ranges over the
  * prefixes with end > ts. Pure map-side expansion (≤ size/step rows per
  * input row), then a normal groupBy — no custom physical operator needed,
  * and the same expression works under readStream.
  */
object CumulateWindows {

  /** Adds `win_start`,`win_end` (epoch seconds) for CUMULATE windows. */
  def cumulate(df: DataFrame, ts: Column, stepSec: Long, sizeSec: Long): DataFrame = {
    require(sizeSec % stepSec == 0, "size must be a multiple of step")
    val steps = (sizeSec / stepSec).toInt
    val epoch = unix_timestamp(ts)
    val winStart = floor(epoch / sizeSec) * sizeSec
    // prefix ends strictly after the row's timestamp
    val ends = (1 to steps).map(k => winStart + lit(k * stepSec))
    df.withColumn("win_start", winStart.cast(LongType))
      // explode must be top-level in the projection (no enclosing cast)
      .withColumn("win_end", explode(filter(array(ends: _*), e => e > epoch)))
      .withColumn("win_end", col("win_end").cast(LongType))
  }

  /** Driver query: 2-minute cumulate windows advancing every minute. */
  def qCumulate(s: SparkSession, dir: String): DataFrame =
    cumulate(Tables.load(s, dir, "events"), col("ts"), stepSec = 60, sizeSec = 120)
      .groupBy(col("win_start"), col("win_end"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("win_start"), col("win_end"), col("event_type"))

  val qCumulateSql: String =
    """SELECT win_start, win_end, event_type, COUNT(*) AS n_events FROM (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts) / 120) * 120 AS BIGINT) AS win_start,
      |    unnest(list_filter(
      |      [CAST(floor(epoch(ts) / 120) * 120 + 60 AS BIGINT),
      |       CAST(floor(epoch(ts) / 120) * 120 + 120 AS BIGINT)],
      |      e -> e > epoch(ts))) AS win_end
      |  FROM events
      |) GROUP BY 1, 2, 3 ORDER BY win_start, win_end, event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w_cumulate" -> (qCumulate _))
  val oracles: Map[String, String] = Map(
    "w_cumulate" -> qCumulateSql)
}
