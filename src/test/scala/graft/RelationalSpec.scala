package graft

import graft.operators.RelationalQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = GraftSession.local("4")

  test("approx sketches track exact values (HLL within rsd, p50 within range)") {
    // raw sketch query (the q21 driver entry is its error-bound check form)
    val approx = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.01).as("approx_supps"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_qty"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("supps"),
        expr("percentile(l_quantity, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, a) <- approx) {
      val e = exact(flag)
      val partsErr = math.abs(a.getLong(1) - e.getLong(1)).toDouble / e.getLong(1)
      assert(partsErr < 0.15, s"$flag HLL parts err $partsErr")
      // rsd=0.01 sketch should be near-exact on 10 suppliers
      assert(a.getLong(2) == e.getLong(2), s"$flag supps")
      val p50a = a.getAs[Number](3).doubleValue
      val p50e = e.getAs[Number](3).doubleValue
      assert(math.abs(p50a - p50e) <= 1.0, s"$flag p50 approx=$p50a exact=$p50e")
    }
    // driver-certified form: every sketch honors its error contract
    assert(RelationalQueries.q21Approx(spark, dir).count() == 0,
      "sketch error-bound violations must be empty")
  }
}
