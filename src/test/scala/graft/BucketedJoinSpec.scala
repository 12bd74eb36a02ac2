package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located-join evidence for ScaleOps.writeBucketed: joining two tables
  * bucketed on the same key with the same bucket count plans with NO
  * Exchange — the one-shuffle-amortized-forever property that makes hub
  * tables cheap to join against repeatedly.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkTestBase._

  test("equi-join of co-bucketed tables plans without any Exchange") {
    val orders = Tables.load(spark, Sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    ops.ScaleOps.writeBucketed(orders, "bj_orders", "o_orderkey", 8)
    ops.ScaleOps.writeBucketed(lineitem, "bj_lineitem", "o_orderkey", 8)
    // the fixture tables are broadcast-sized; force the sort-merge path the
    // join would take at scale so the bucketed no-Exchange property shows
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ops.ScaleOps.bucketedJoin(spark, "bj_orders", "bj_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side\n$plan")
      // and it is a real join, not a plan artifact: multiset matches the
      // plain (shuffling) join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expected && expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bj_orders")
      spark.sql("DROP TABLE IF EXISTS bj_lineitem")
    }
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    val lineitem = Tables.load(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    ops.ScaleOps.writeBucketed(lineitem, "bj_agg", "l_orderkey", 8)
    try {
      val agg = spark.table("bj_agg").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must aggregate in place\n$plan")
      assert(agg.count() == lineitem.select("l_orderkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS bj_agg")
  }
}
