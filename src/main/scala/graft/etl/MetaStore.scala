package graft.etl

import java.sql.Timestamp
import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ClientBillingConfig, EtlStatus, StepStatus}

/** Control-plane store: the engine's stand-in for the reference's MySQL
  * tables (`billing_alerts_setting`, `billing_etl_status`,
  * `user_stepper_form_step_status` — reference:
  * core/database/billing_etl_db.py:12-162, README.md:186-210).
  *
  * Three logical tables:
  *   - `config`  — small, read-mostly; UPDATE (S9) is whitelisted
  *   - `stepper` — same update pattern (S10)
  *   - `status`  — append-only log (S8); never rewritten
  *
  * Two interchangeable backends implement the trait (MetaStoreSpec runs
  * the same battery against both):
  *   - [[FsMetaStore]] — versioned parquet snapshots + an atomically
  *     swapped CURRENT pointer; no external service needed.
  *   - [[JdbcMetaStore]] — a real JDBC database (embedded Derby in tests;
  *     the URL/driver generalize to the reference's MySQL), read through
  *     `spark.read.jdbc` and updated with genuine SQL UPDATEs, matching
  *     the reference's `.rowcount` semantics.
  */
trait MetaStore {

  // ------------------------------------------------------------------ config

  /** Seed/replace the whole config table (test fixture path). */
  def putConfigs(rows: Seq[ClientBillingConfig]): Unit

  def configs: Dataset[ClientBillingConfig]

  /** Config UPDATE sink, S9 (reference: billing_etl_db.py:122-162).
    * Mirrors the reference's whitelist: only `pulsebillingdataset` and
    * `pulsetableid` are updatable (billing_etl_db.py:126-129); other keys
    * are ignored. Returns the number of rows affected.
    */
  def updateConfig(orgId: Int, projectId: String, fields: Map[String, String]): Long

  /** Config point-lookup, S3/P2/F3 (reference: billing_etl_db.py:63-89).
    * Driver-side single-row fetch — the table is tiny by construction.
    */
  def configFor(orgId: Int): Option[ClientBillingConfig] =
    configs.where(col("org_id") === orgId).head(1).headOption

  // ----------------------------------------------------------------- stepper

  def putSteps(rows: Seq[StepStatus]): Unit

  def steps: Dataset[StepStatus]

  /** Step-status UPDATE sink, S10 (reference: billing_etl_db.py:91-120).
    * Returns rows_affected, as the reference surfaces via `.rowcount`.
    */
  def updateStepCompleted(stepId: Int, orgId: Int, completed: Boolean): Long

  // ------------------------------------------------------------------ status

  /** Status append sink, S8 (reference: billing_etl_db.py:12-43). `seq` is
    * orchestrator-assigned so the append-only log has a deterministic total
    * order regardless of storage enumeration order.
    */
  def appendStatus(seq: Long, s: EtlStatus): Unit

  def statusLog: DataFrame

  /** Checkpoint top-1 read, S4/F2/O1/A3 (reference: billing_etl_db.py:45-61):
    * latest SUCCESS watermark for (org, project), None on first run.
    */
  def lastSuccessWatermark(orgId: Int, projectId: String): Option[Timestamp] =
    statusLog
      .where(col("org_id") === orgId && col("project_id") === projectId &&
        col("status") === EtlStatus.Success)
      .agg(max(col("end_date_time")))
      .head(1).headOption.flatMap(r => Option(r.getTimestamp(0)))

  def nextStatusSeq: Long =
    statusLog.agg(coalesce(max(col("seq")), lit(0L))).head().getLong(0) + 1L
}

object MetaStore {
  /** The reference's updatable-column whitelist (billing_etl_db.py:126-129). */
  val UpdatableConfigColumns: Set[String] = Set("pulsebillingdataset", "pulsetableid")

  /** Default backend: versioned parquet + atomic pointer swap. */
  def apply(root: String)(implicit spark: SparkSession): FsMetaStore =
    new FsMetaStore(root)
}

/** Filesystem backend. Vanilla Spark tables have no in-place UPDATE, so
  * overwrites are implemented as **versioned snapshots with an
  * atomically-swapped CURRENT pointer** (write the new snapshot dir in
  * full, then atomic-rename a tiny pointer file): readers either see the
  * old version or the new one, never a half-written table. This is the
  * write-temp-then-swap pattern of SURVEY §7.4.5 and gives
  * last-writer-wins under concurrent updaters. Control tables are tiny
  * (one row per org), so rewriting them whole is O(orgs), not O(data) —
  * this never becomes a bottleneck at 100 TB of *billing* data because
  * config/status volume scales with tenants, not rows.
  */
final class FsMetaStore(val root: String)(implicit spark: SparkSession)
    extends MetaStore {
  import spark.implicits._

  private val configDir = s"$root/config"
  private val stepperDir = s"$root/stepper"
  private val statusDir = s"$root/status/data"

  // ---------------------------------------------------------------- versions
  //
  // All pointer probes/reads/swaps go through graft.util.Fs (Hadoop
  // FileSystem): the control-plane root is HDFS/S3/GCS at cluster scale,
  // where a java.nio probe silently answers false — config lookups would
  // come back empty and the watermark resume would restart from epoch.

  private def currentPointer(tableDir: String): String = s"$tableDir/CURRENT"

  private def currentVersion(tableDir: String): Option[String] =
    graft.util.Fs.readSmallText(spark, currentPointer(tableDir)).map(_.trim)

  /** Write `df` as a fresh snapshot, then atomically repoint CURRENT
    * (write-in-full + rename-OVERWRITE; see Fs.writeSmallTextAtomic for the
    * S3 caveat).
    */
  private def overwriteVersioned(tableDir: String, df: DataFrame): Unit = {
    val v = s"v_${UUID.randomUUID().toString.take(8)}"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$tableDir/$v")
    graft.util.Fs.writeSmallTextAtomic(spark, currentPointer(tableDir), v)
  }

  private def readVersioned(tableDir: String): Option[DataFrame] =
    currentVersion(tableDir).map(v => spark.read.parquet(s"$tableDir/$v"))

  override def putConfigs(rows: Seq[ClientBillingConfig]): Unit =
    overwriteVersioned(configDir, rows.toDF())

  override def configs: Dataset[ClientBillingConfig] =
    readVersioned(configDir)
      .map(_.as[ClientBillingConfig])
      .getOrElse(spark.emptyDataset[ClientBillingConfig])

  override def updateConfig(orgId: Int, projectId: String,
                            fields: Map[String, String]): Long = {
    val allowed = fields.view.filterKeys(MetaStore.UpdatableConfigColumns).toMap
    if (allowed.isEmpty) return 0L
    val cur = configs
    val hit = $"org_id" === orgId && $"projectid" === projectId
    val affected = cur.where(hit).count()
    if (affected > 0) {
      val updated = allowed.foldLeft(cur.toDF()) { case (df, (k, v)) =>
        df.withColumn(k, when(hit, lit(v)).otherwise(col(k)))
      }
      overwriteVersioned(configDir, updated.as[ClientBillingConfig].toDF())
    }
    affected
  }

  override def putSteps(rows: Seq[StepStatus]): Unit =
    overwriteVersioned(stepperDir, rows.toDF())

  override def steps: Dataset[StepStatus] =
    readVersioned(stepperDir)
      .map(_.as[StepStatus])
      .getOrElse(spark.emptyDataset[StepStatus])

  override def updateStepCompleted(stepId: Int, orgId: Int, completed: Boolean): Long = {
    val cur = steps
    val hit = $"stepid" === stepId && $"org_id" === orgId
    val affected = cur.where(hit).count()
    if (affected > 0) {
      val updated = cur.toDF()
        .withColumn("step_completed", when(hit, lit(completed)).otherwise(col("step_completed")))
      overwriteVersioned(stepperDir, updated.as[StepStatus].toDF())
    }
    affected
  }

  override def appendStatus(seq: Long, s: EtlStatus): Unit =
    Seq((seq, s.org_id, s.project_id, s.status, s.end_date_time.orNull))
      .toDF("seq", "org_id", "project_id", "status", "end_date_time")
      .coalesce(1).write.mode(SaveMode.Append).parquet(statusDir)

  override def statusLog: DataFrame =
    if (graft.util.Fs.hasParquetFiles(spark, statusDir))
      spark.read.parquet(statusDir)
    else
      Seq.empty[(Long, Int, String, String, Timestamp)]
        .toDF("seq", "org_id", "project_id", "status", "end_date_time")
}
