package graft.etl

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.model.EngineError
import graft.schema.BillingExportSchema

/** Catalog DDL + the provisioning saga, D1–D5
  * (reference: core/utility/dataset_utils.py:110-228 and
  * core/bigquery/client.py:42-58).
  *
  * The reference provisions a per-org BigQuery dataset + table, verifies the
  * dataset with retries (BigQuery listings are eventually consistent), writes
  * the created identifiers back into the config table (S9), marks onboarding
  * step 3 complete (S10), and compensates with DROP … CASCADE on any failure.
  * Spark's catalog is strongly consistent, so verification succeeds on the
  * first probe — the retry loop is kept (with an injectable sleeper) because
  * the saga's *shape* is the capability under test.
  */
object CatalogOps {

  /** Identifier scheme (reference: dataset_utils.py:127, :141). */
  def datasetName(orgId: Int): String = s"org_${orgId}_standard_export"
  def tableName(orgId: Int): String = s"org_${orgId}_standard_export_table"

  /** D1 — CREATE NAMESPACE (reference: client.py:42-46). */
  def createNamespace(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS `$db`")

  /** D2 — verify dataset with exponential backoff ×3
    * (reference: dataset_utils.py:71-96; constants.py:18-19: 3 retries,
    * 0.5 s initial delay, doubling).
    */
  def verifyNamespace(spark: SparkSession, db: String,
      retries: Int = 3, initialDelayMs: Long = 500,
      sleeper: Long => Unit = Thread.sleep): Boolean = {
    var delay = initialDelayMs
    var attempt = 0
    while (attempt < retries) {
      if (spark.catalog.databaseExists(db)) return true
      attempt += 1
      if (attempt < retries) { sleeper(delay); delay *= 2 }
    }
    false
  }

  /** S6 — existence probes (reference: dataset_utils.py:236-247). */
  def tableExists(spark: SparkSession, db: String, table: String): Boolean =
    spark.catalog.tableExists(s"`$db`.`$table`")

  /** D3 — CREATE TABLE with the nested billing-export schema
    * (reference: dataset_utils.py:230-341, schema :250-332).
    */
  def createBillingTable(spark: SparkSession, db: String, table: String): Unit =
    if (!tableExists(spark, db, table))
      spark.catalog.createTable(s"`$db`.`$table`", "parquet", BillingExportSchema.schema,
        Map.empty[String, String])

  /** D4 — DROP NAMESPACE CASCADE compensation
    * (reference: client.py:48-58 `delete_contents=True, not_found_ok=True`).
    */
  def dropNamespaceCascade(spark: SparkSession, db: String): Unit =
    spark.sql(s"DROP NAMESPACE IF EXISTS `$db` CASCADE")

  final case class Provisioned(dataset: String, table: String)

  /** D5 — the provisioning saga (reference: dataset_utils.py:110-228):
    * create dataset → verify → create table → write ids back to config (S9)
    * → mark stepper step 3 complete (S10); on ANY failure, compensate by
    * dropping the namespace cascade and surface a ProvisioningFailed error.
    */
  def provision(spark: SparkSession, meta: MetaStore, orgId: Int, projectId: String,
      sleeper: Long => Unit = Thread.sleep): Either[EngineError, Provisioned] = {
    val db = datasetName(orgId)
    val table = tableName(orgId)
    try {
      createNamespace(spark, db)
      if (!verifyNamespace(spark, db, sleeper = sleeper))
        throw new IllegalStateException(s"namespace $db not visible after create")
      createBillingTable(spark, db, table)
      val updated = meta.updateConfig(orgId, projectId,
        Map("pulsebillingdataset" -> db, "pulsetableid" -> table))
      if (updated == 0)
        throw new IllegalStateException(s"no config row for org_id=$orgId, projectid=$projectId")
      // Step id 3 = "billing export configured" (reference: dataset_utils.py:172-174).
      meta.updateStepCompleted(stepId = 3, orgId = orgId, completed = true)
      Right(Provisioned(db, table))
    } catch {
      case NonFatal(e) =>
        try dropNamespaceCascade(spark, db) catch { case NonFatal(_) => () }
        Left(EngineError.ProvisioningFailed(e.getMessage))
    }
  }
}
