package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** The ingest edge must absorb every timestamp encoding a real landing zone
  * produces — the reference pipeline tolerates timezone-naive timestamps end
  * to end (core/services/billing_etl.py:35-40 serializes bare isoformat();
  * the warehouse coerces on load), and the round-9 fixture regeneration
  * proved a naive-MICROS drop can silently break every downstream consumer.
  *
  * Three static fixtures (src/test/resources/tsvariants/<v>/events.parquet)
  * hold the SAME three instants under the encodings that matter:
  *   - nanos: parquet TIMESTAMP(NANOS) — Spark 4 refuses it outright
  *     without the nanosAsLong escape hatch (PARQUET_TYPE_ILLEGAL)
  *   - ntz:   TIMESTAMP(MICROS, isAdjustedToUTC=false) — what pandas and
  *     DuckDB write by default; Spark 4 infers TIMESTAMP_NTZ
  *   - utc:   TIMESTAMP(MICROS, isAdjustedToUTC=true) — Spark's own default
  *
  * Contract: Tables.load yields TimestampType with IDENTICAL values for all
  * three (naive encodings read as UTC; the session TZ is pinned UTC).
  */
class TimestampIngestSpec extends AnyFunSuite {
  import SparkTestBase._

  private val base = "src/test/resources/tsvariants"
  private val variants = Seq("nanos", "ntz", "utc")

  test("all three parquet timestamp encodings land as TimestampType") {
    variants.foreach { v =>
      val df = Tables.load(spark, s"$base/$v", "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"variant '$v' must normalize to TimestampType, got ${df.schema("ts").dataType}")
    }
  }

  test("the three encodings decode to identical instants (micro precision)") {
    val decoded = variants.map { v =>
      v -> Tables.load(spark, s"$base/$v", "events")
        .orderBy("event_id")
        .collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1).toInstant)
        .toSeq
    }.toMap
    assert(decoded("nanos") == decoded("utc"),
      s"nanos vs utc: ${decoded("nanos")} != ${decoded("utc")}")
    assert(decoded("ntz") == decoded("utc"),
      s"ntz vs utc: ${decoded("ntz")} != ${decoded("utc")}")
    // and the values are the expected wall-clock instants read as UTC
    assert(decoded("utc").map(_._2.toString) == Seq(
      1L -> "2024-01-10T00:00:00Z",
      2L -> "2024-01-15T12:34:56.789012Z",
      3L -> "2024-01-20T23:59:59.999999Z").map(_._2))
  }

  test("watermark predicates still push down to the scan for the ntz variant") {
    import org.apache.spark.sql.functions._
    val q = Tables.load(spark, s"$base/ntz", "events")
      .where(col("ts") >= to_timestamp(lit("2024-01-12 00:00:00")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"normalized NTZ read must keep scan-level pushdown\n$plan")
    assert(q.count() == 2)
  }
}
