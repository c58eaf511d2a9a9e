package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities (SURVEY §2 scale notes: "co-locate joins via
  * bucketing"). Writing both sides bucketed by the join key with the same
  * bucket count lets Catalyst plan a sort-merge join with NO Exchange on
  * either side — at 100 TB that's the difference between re-shuffling the
  * fact table on every join and reading it pre-partitioned.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True iff the physical plan contains no shuffle below the join —
    * the bucketing worked. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
