package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting utility for hot-key joins (SURVEY §2 scale notes; the
  * pattern AQE's skew-join handles for sort-merge, generalized to any
  * equi-join and usable when AQE can't see the skew — e.g. post-explode).
  *
  * Big side gets a deterministic salt in [0, factor) derived from a
  * differentiating column (NOT rand() — retries must be replayable);
  * small side replicates each row `factor` times. Join key becomes
  * (key, salt): one hot key spreads over `factor` reducers.
  */
object Salting {

  def skewSaltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, saltSource: Column, joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(factor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(factor - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
