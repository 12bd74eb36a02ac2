package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability via `Dataset.observe`: production jobs need
  * row-count / quality metrics WITHOUT a second pass over 100 TB —
  * `observe` accumulates named aggregates as the main action streams by,
  * at zero extra scans. The spec pins the contract the ETL path would
  * rely on: observed metrics equal the recomputed truth, and the
  * observation rides through downstream transforms untouched.
  */
class ObservabilitySpec extends AnyFunSuite {
  import SparkTestBase._

  test("observe captures input metrics in the same single pass") {
    val obs = Observation("ingest_metrics")
    val ev = Tables.load(spark, Sf0001, "events")
    val out = ev.observe(obs,
      count(lit(1)).as("rows_seen"),
      sum(round(col("value") * 100).cast("long")).as("cents_seen"),
      count(when(col("user_id").isNull, 1)).as("null_users"))
      .where(col("event_type") === "purchase") // metrics observe PRE-filter input
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val nOut = out.count()
    val row = obs.get
    val expectRows = ev.count()
    val expectCents = ev.agg(sum(round(col("value") * 100).cast("long")))
      .head.getLong(0)
    assert(row("rows_seen") == expectRows, row.toString)
    assert(row("cents_seen") == expectCents, row.toString)
    assert(row("null_users") == 0L, row.toString)
    assert(nOut > 0)
  }
}
