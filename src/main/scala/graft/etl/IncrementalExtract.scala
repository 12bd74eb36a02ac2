package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The incremental extraction primitives, S1/F1/A2/W1/W2/W7
  * (reference: core/services/billing_etl.py:135-171, :270-298).
  *
  * Scale notes (the whole point of the Spark re-expression):
  *   - the half-open predicate is a plain Catalyst filter → pushed to the
  *     parquet scan (row-group min/max skipping), and becomes partition
  *     pruning when the source is laid out by `date(watermarkCol)`;
  *   - the reference's LIMIT/OFFSET paging + driver-side `list(rows)`
  *     materialization (billing_etl.py:287-289) are deliberately ABSENT —
  *     Spark partitions the scan and streams it to the sink; nothing is ever
  *     collected to the driver except the 2-value (count, max) reduce;
  *   - count + max are computed in ONE aggregation job, not two passes.
  */
object IncrementalExtract {

  val Epoch: Timestamp = Timestamp.from(java.time.Instant.EPOCH)

  /** F1 — the half-open watermark predicate `[start, end)`
    * (reference: billing_etl.py:280-281). `>=` on the left edge is what
    * re-admits the boundary row on the next run (semantics note N1).
    */
  def windowPredicate(watermarkCol: String, start: Timestamp, end: Timestamp): Column =
    col(watermarkCol) >= lit(start) && col(watermarkCol) < lit(end)

  /** S1 — the bounded incremental scan. */
  def extract(source: DataFrame, watermarkCol: String,
      start: Timestamp, end: Timestamp): DataFrame =
    source.where(windowPredicate(watermarkCol, start, end))

  final case class BatchStats(rows: Long, maxWatermark: Option[Timestamp])

  /** A1 + A2 in a single reduce: row count and max watermark of the batch.
    * One Spark job, one shuffle-free partial-agg → 1-row final agg.
    */
  def batchStats(extracted: DataFrame, watermarkCol: String): BatchStats = {
    val r = extracted.agg(count(lit(1)), max(col(watermarkCol))).head()
    // Total over every JVM shape a timestamp-ish column can surface as
    // (LTZ → java.sql.Timestamp, NTZ → LocalDateTime, datetimeJava8API →
    // Instant): a future source-type drift degrades to a typed error here,
    // not a ClassCastException three layers deep.
    val wm = r.get(1) match {
      case null                        => None
      case t: Timestamp                => Some(t)
      case i: java.time.Instant        => Some(Timestamp.from(i))
      case ldt: java.time.LocalDateTime =>
        // Naive values are interpreted as UTC — the session TZ is pinned
        // UTC, so this matches what the LTZ read of the same bytes yields.
        Some(Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC)))
      case other => throw new IllegalArgumentException(
        s"watermark column '$watermarkCol' yielded unsupported type " +
          s"${other.getClass.getName}: $other")
    }
    BatchStats(r.getLong(0), wm)
  }

  /** W2 + W7 — the persisted watermark rule (reference: billing_etl.py:160-168):
    * max(export_time) of the extracted rows; if the batch is empty, jump to
    * the job time "to avoid looping forever".
    */
  def newWatermark(stats: BatchStats, jobTime: Timestamp): Timestamp =
    stats.maxWatermark.getOrElse(jobTime)
}
