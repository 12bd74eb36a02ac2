package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom TypedImperativeAggregate's contract: exact window-form
  * semantics, planned as a partial+final ObjectHashAggregate (the map-side
  * reduction that makes it beat the window at scale).
  */
class NativeAggSpec extends AnyFunSuite {
  import SparkTestBase._

  test("graft_topk_pairs equals the window form and plans partial+final") {
    functions.NativeAgg.register(spark)
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, Sf0001, "events")
      .select(col("event_type"), col("value"), col("event_id"))
    val viaAgg = ev.groupBy(col("event_type"))
      .agg(expr("graft_topk_pairs(value, event_id, 3)").as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), col("col.v").as("value"), col("col.id").as("event_id"))
    val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    val viaWindow = ev
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
      .select(col("event_type"), col("value"), col("event_id"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "custom aggregate must reproduce the window top-k exactly")
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate must plan as ObjectHashAggregate\n$plan")
    assert(plan.contains("partial_graft_topk_pairs"),
      s"map-side partial aggregation must be present (the scale property)\n$plan")
  }

  test("graft_topk_pairs keeps groups smaller than k and skips nulls") {
    functions.NativeAgg.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", DoubleType), StructField("id", LongType)))
    val rows = Seq(
      Row("a", 5.0, 1L), Row("a", 7.0, 2L),           // fewer than k
      Row("b", 1.0, 3L), Row("b", null, 4L),          // null value skipped
      Row("b", 3.0, 5L), Row("b", 2.0, 6L), Row("b", 4.0, 7L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val m = df.groupBy(col("g"))
      .agg(expr("graft_topk_pairs(v, id, 3)").as("top"))
      .select(col("g"), size(col("top")).as("n"),
        col("top")(0).getField("id").as("best"))
      .collect().map(r => (r.getString(0), (r.getInt(1), r.getLong(2)))).toMap
    assert(m("a") == ((2, 2L)), s"group a: $m")   // both rows, best = v 7.0
    assert(m("b") == ((3, 7L)), s"group b: $m")   // null dropped, top-3 of 4, best = v 4.0
  }
}
