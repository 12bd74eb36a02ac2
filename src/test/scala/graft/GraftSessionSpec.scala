package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: after GraftSession.init, plain `spark.sql` text over
  * the registered views and native functions must agree with the
  * DataFrame formulations.
  */
class GraftSessionSpec extends AnyFunSuite {
  import SparkTestBase._

  test("every corpus table is queryable as a view") {
    GraftSession.init(spark, Sf0001)
    GraftSession.TableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").head.getLong(0) > 0, t)
    }
  }

  test("native functions are SQL-callable and agree with the DataFrame path") {
    GraftSession.init(spark, Sf0001)
    val sql = spark.sql(
      """SELECT doc_id, size(graft_shingle_hashes(text)) AS n_sh,
        |  graft_simhash60_shingles(text) AS sim,
        |  graft_normalize_text(text) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin)
    val df = Tables.load(spark, Sf0001, "documents")
      .select(col("doc_id"), size(expr("graft_shingle_hashes(text)")).as("n_sh"),
        expr("graft_simhash60_shingles(text)").as("sim"),
        expr("graft_normalize_text(text)").as("norm"))
      .orderBy(col("doc_id"))
    assert(sql.exceptAll(df).isEmpty && df.exceptAll(sql).isEmpty)
  }

  test("the nanos-rescaled events view pushes watermark predicates in SQL too") {
    GraftSession.init(spark, Sf0001)
    val q = spark.sql(
      "SELECT count(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'")
    val plan = q.queryExecution.executedPlan.toString
    assert(q.head.getLong(0) > 0)
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"SQL text over the view must keep the pushdown rewrite\n$plan")
  }
}
