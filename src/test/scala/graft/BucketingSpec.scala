package graft

import graft.operators.Bucketing
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")

  test("same-bucketed tables join without a shuffle; results match plain join") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
      .withColumnRenamed("l_orderkey", "k")
    val ord = Tables.load(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "k")
    Bucketing.writeBucketed(li.select("k", "l_quantity"), "b_lineitem", "k", 8)
    Bucketing.writeBucketed(ord.select("k", "o_totalprice"), "b_orders", "k", 8)
    // force SMJ so an Exchange would be visible if bucketing failed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "k")
      assert(Bucketing.isExchangeFree(joined),
        "bucketed join must not shuffle:\n" + joined.queryExecution.executedPlan)
      val expected = li.select("k", "l_quantity").join(ord.select("k", "o_totalprice"), "k").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
