package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NestedBillingOps
import graft.schema.BillingExportSchema

/** Nested billing-export fidelity at the DATA level (SURVEY §7.4 hard
  * part #2): the fixture carries real array-of-struct values through the
  * S7 dest write + the per-row JSON boundary, and the null-array /
  * empty-array / null-struct distinctions survive both hops.
  */
class NestedBillingSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val rows = NestedBillingOps.billingRows(spark, Sf0001)

  test("fixture schema IS the 26-field standard-export schema") {
    // .sql canonicalizes types recursively without nullability noise
    assert(rows.schema.fields.map(f => f.name -> f.dataType.sql).toSeq ==
      BillingExportSchema.schema.fields.map(f => f.name -> f.dataType.sql).toSeq)
  }

  test("JSON boundary preserves null array vs empty array vs null struct") {
    val before = rows.select(
      sum(when(col("credits").isNull, 1L).otherwise(0L)),
      sum(when(col("credits").isNotNull && size(col("credits")) === 0, 1L).otherwise(0L)),
      sum(when(col("adjustment_info").isNull, 1L).otherwise(0L)),
      sum(when(col("labels").isNull, 1L).otherwise(0L))).head()
    val after = NestedBillingOps.jsonBoundary(rows).select(
      sum(when(col("credits").isNull, 1L).otherwise(0L)),
      sum(when(col("credits").isNotNull && size(col("credits")) === 0, 1L).otherwise(0L)),
      sum(when(col("adjustment_info").isNull, 1L).otherwise(0L)),
      sum(when(col("labels").isNull, 1L).otherwise(0L))).head()
    assert(before == after)
    assert(before.getLong(0) > 0, "fixture must include null credits arrays")
    assert(before.getLong(1) > 0, "fixture must include empty credits arrays")
    assert(before.getLong(2) > 0, "fixture must include null adjustment_info structs")
  }

  test("array-of-struct VALUES round-trip the JSON boundary exactly") {
    val proj = Seq("usage_start_time", "credits", "labels", "project", "tags",
      "adjustment_info", "usage").map(col)
    val a = rows.select(proj: _*)
    val b = NestedBillingOps.jsonBoundary(rows).select(proj: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "JSON-serialized rows must parse back value-identical")
  }

  test("credits explode from the dest matches the source arrays") {
    val dest = ops.NestedBillingOps.queries("etl_nested_credits")(spark, Sf0001)
    // spot-check the three credit classes against first principles
    val byService = dest.collect().map(r => r.getString(0) -> r).toMap
    assert(byService.nonEmpty)
    dest.collect().foreach { r =>
      val nRows = r.getLong(1)
      assert(r.getLong(2) + r.getLong(3) <= nRows) // null + empty <= total
      assert(r.getLong(4) <= 0L, "credits are discounts: cents must be <= 0")
      assert(r.getLong(6) >= 2 * nRows, "every row has >= 2 ancestors")
    }
  }
}
