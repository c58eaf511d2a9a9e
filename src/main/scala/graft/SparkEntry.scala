package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{CumulateWindows, CurationOps, DedupOps, EmbeddingOps, EventPattern, MultimodalOps, RelationalQueries, SamplingOps, SimilarityOps, TextQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TextQueries.all ++ DedupOps.all ++
      SimilarityOps.all ++ WindowQueries.all ++ MultimodalOps.all ++
      CumulateWindows.all ++ CurationOps.all ++ EmbeddingOps.all ++
      SamplingOps.all ++ EventPattern.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. EVERY query carries an oracle (ContractSpec
    * pins key parity) — ops whose hashing isn't DuckDB-expressible get a
    * violation-check form whose oracle is the empty relation. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ DedupOps.oracles ++
      SimilarityOps.oracles ++ WindowQueries.oracles ++ MultimodalOps.oracles ++
      CumulateWindows.oracles ++ CurationOps.oracles ++ EmbeddingOps.oracles ++
      SamplingOps.oracles ++ EventPattern.oracles
}
