package graft.etl

import java.sql.Timestamp

import scala.util.Random
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EngineError, EtlJobMessage, EtlStatus}

/** The end-to-end incremental ETL job — the reference's primary entry point
  * re-expressed Spark-first (reference: core/services/billing_etl.py:43-218,
  * lifecycle mapped in SURVEY §3.1).
  *
  * One run: config lookup → watermark resume (last SUCCESS, epoch default) →
  * bounded scan `[watermark, jobTime)` → transform hook → partitioned parquet
  * append → status log IN_PROGRESS → SUCCESS/FAILED with the new watermark.
  * Job-level retry ×3 with jittered exponential backoff (W6); empty batches
  * jump the watermark to jobTime (W7). The at-least-once boundary-duplicate
  * semantics of the reference (N1: next run re-reads `== watermark` rows)
  * are reproduced exactly — this is parity mode, asserted by the oracle.
  *
  * Scale: the only driver-side values are the 1-row (count, max) reduce and
  * the tiny config/status rows. The data path is scan → filter → write with
  * no shuffle at all; the destination is partitioned by `export_date` so a
  * 100 TB history stays prunable and an "exact" (idempotent) mode could
  * overwrite just the affected date partitions.
  */
object EtlJob {

  final case class RunReport(
      orgId: Int,
      projectId: String,
      rowsExtracted: Long,
      watermark: Timestamp,
      status: String,
      attempts: Int)

  /** Run one incremental ETL job.
    *
    * @param source       the client's billing table (any DataFrame with `watermarkCol`)
    * @param watermarkCol event-time column driving incrementality (`export_time` in the reference)
    * @param destDir      destination parquet directory (append-only)
    * @param jobTime      end of the extraction window — passed in (not now()) for determinism
    * @param transform    U1 hook (reference: billing_etl.py:301-303, identity by default)
    * @param maxRetries   W6 (reference: billing_etl.py:58)
    * @param sleeper      injectable so tests don't sleep
    * @param rng          jitter source (reference: billing_etl.py:205 `uniform(0, 2**attempt)`)
    */
  def run(
      spark: SparkSession,
      meta: MetaStore,
      source: DataFrame,
      watermarkCol: String,
      destDir: String,
      message: EtlJobMessage,
      jobTime: Timestamp,
      transform: DataFrame => DataFrame = identity,
      maxRetries: Int = 3,
      sleeper: Long => Unit = Thread.sleep,
      rng: Random = new Random()): Either[EngineError, RunReport] = {

    // J1 — config lookup; missing config is the error channel
    // (reference: billing_etl_db.py:82-84).
    val config = meta.configFor(message.org_id) match {
      case Some(c) => c
      case None => return Left(EngineError.MissingConfig(message.org_id))
    }
    val projectId = config.projectid

    // W1 — resume from the last SUCCESS watermark, epoch on first run
    // (reference: billing_etl.py:135-139).
    val start = meta.lastSuccessWatermark(message.org_id, projectId)
      .getOrElse(IncrementalExtract.Epoch)

    var lastError: Throwable = null
    var lastWatermark: Option[Timestamp] = None

    var attempt = 0
    while (attempt < maxRetries) {
      try {
        val extracted = IncrementalExtract.extract(source, watermarkCol, start, jobTime)
        val stats = IncrementalExtract.batchStats(extracted, watermarkCol)
        val endDateTime = IncrementalExtract.newWatermark(stats, jobTime)
        lastWatermark = Some(endDateTime)

        // Status ordering is load-then-commit (reference: billing_etl.py:173-198):
        // IN_PROGRESS carries the candidate watermark before the load starts.
        meta.appendStatus(meta.nextStatusSeq,
          EtlStatus(message.org_id, projectId, EtlStatus.InProgress, Some(endDateTime)))

        val transformed = transform(extracted)

        // S7 — append to the destination, partitioned by event date so the
        // 100 TB layout prunes on time (SURVEY §4 physical-layout decision).
        if (stats.rows > 0)
          transformed
            .withColumn("export_date", to_date(col(watermarkCol)))
            .write.mode(SaveMode.Append)
            .partitionBy("export_date")
            .parquet(destDir)

        meta.appendStatus(meta.nextStatusSeq,
          EtlStatus(message.org_id, projectId, EtlStatus.Success, Some(endDateTime)))

        return Right(RunReport(message.org_id, projectId, stats.rows, endDateTime,
          EtlStatus.Success, attempt + 1))
      } catch {
        case NonFatal(e) =>
          lastError = e
          attempt += 1
          if (attempt < maxRetries) {
            // Jittered exponential backoff (reference: billing_etl.py:204-208).
            sleeper((rng.nextDouble() * math.pow(2, attempt - 1) * 1000).toLong)
          }
      }
    }

    // Final failure: FAILED status row. The reference would crash here if the
    // first attempt failed before computing end_date_time (semantics note N4);
    // we write a null watermark instead.
    meta.appendStatus(meta.nextStatusSeq,
      EtlStatus(message.org_id, projectId, EtlStatus.Failed, lastWatermark))
    Left(EngineError.ExtractionFailed(
      s"all $maxRetries attempts failed: ${Option(lastError).map(_.getMessage).getOrElse("?")}"))
  }

  /** Read the destination back without the layout column. */
  def readDestination(spark: SparkSession, destDir: String): DataFrame =
    spark.read.parquet(destDir).drop("export_date")
}
