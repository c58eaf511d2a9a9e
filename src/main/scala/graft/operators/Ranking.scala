package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed global ranking primitives.
  *
  * The naive global `row_number() OVER (ORDER BY …)` funnels the ENTIRE
  * frame through one reducer (Spark logs `WindowExec: No Partition
  * Defined` for exactly this reason) — fine for a 20-row head, fatal for
  * a web-scale vocabulary in the 10⁸–10⁹ range. The two-phase form here
  * is the repo's standard escape hatch (first shipped in
  * [[SamplingOps.dsShuffle]] and `txtCurriculum`, grafted out so every
  * vocabulary-frame ranker shares one audited implementation). */
object Ranking {

  /** Append a global dense 1-based `row_number` column named `rankName`,
    * ordered by `order` (which must be a TOTAL order — include a unique
    * tie-break column), without ever concentrating the frame on one
    * reducer:
    *
    *  1. `repartitionByRange` on the order key — range partitioning
    *     preserves the global order ACROSS partitions, so partition i's
    *     rows all rank before partition i+1's;
    *  2. rank locally per partition, in parallel;
    *  3. add per-partition base offsets (a prefix sum over `parts`
    *     counts — the driver sees `parts` longs, never rows).
    *
    * The partitioned frame persists so the count pass and the rank pass
    * read ONE pid assignment; the result is `localCheckpoint`ed so the
    * caller can fan out over it without re-running either phase, and the
    * intermediate cache is released before returning.
    *
    * Rank values are independent of where the range sampler happens to
    * place partition boundaries — boundaries only move rows between
    * (pid, local_rank) slots, never change base + local_rank. */
  def twoPhaseRank(df: DataFrame, rankName: String, parts: Int,
      order: Column*): DataFrame = {
    val keyed = df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // empty range partitions simply don't appear; the prefix sum pairs
    // positionally with the pids that do
    val totals = keyed.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid + 1, acc + n)
    }.init.zip(totals).map { case ((_, base), (pid, _)) => (pid, base) }
    val baseDf = df.sparkSession.createDataFrame(bases.toSeq)
      .toDF("__pid", "__base")
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val out = keyed
      .withColumn("__lr", row_number().over(wLocal))
      .join(broadcast(baseDf), Seq("__pid"))
      .withColumn(rankName, (col("__base") + col("__lr")).cast("long"))
      .drop("__pid", "__base", "__lr")
      .localCheckpoint()
    keyed.unpersist()
    out
  }
}
