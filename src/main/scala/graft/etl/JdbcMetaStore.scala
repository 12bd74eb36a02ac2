package graft.etl

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

import graft.model.{ClientBillingConfig, EtlStatus, StepStatus}

/** JDBC backend of the control plane — the shape the reference actually
  * runs (MySQL: core/database/database_class.py:26-47,
  * billing_etl_db.py:12-162), with the reference's own table names.
  *
  * Split of responsibilities, mirroring the reference:
  *   - **reads** go through `spark.read.jdbc` — the control tables are
  *     ordinary DataFrames to the rest of the engine, so every consumer
  *     (watermark resume, config lookup join, saga read-back) is
  *     backend-agnostic. Control tables are tiny (rows scale with
  *     tenants, not data), so the single-partition default read is the
  *     right plan; a genuinely large table would add
  *     partitionColumn/numPartitions bounds.
  *   - **appends** (S8 status log) go through the Spark JDBC writer.
  *   - **updates** (S9/S10) are genuine SQL UPDATEs issued driver-side
  *     with `rows_affected` from `executeUpdate` — exactly the
  *     reference's cursor `.rowcount` contract. Unlike the FS backend's
  *     snapshot-swap emulation, no table rewrite happens at all.
  *
  * Tests run it on embedded Derby (`jdbc:derby:<dir>;create=true` — in
  * the Spark distribution's classpath already, since Hive metastores use
  * it); the DDL is deliberately vanilla ANSI (INT/BIGINT/VARCHAR/
  * TIMESTAMP/BOOLEAN) so the same class points at MySQL/Postgres by
  * swapping url + driver.
  *
  * Identifier case: tables are created UNQUOTED, so the database folds
  * names to its canonical case (upper, for Derby); reads rename columns
  * back to the engine's lowercase schema positionally, and the Spark JDBC
  * writer maps DataFrame fields onto table columns case-insensitively.
  */
final class JdbcMetaStore(
    url: String,
    driver: String = "org.apache.derby.jdbc.EmbeddedDriver")
    (implicit spark: SparkSession) extends MetaStore {
  import spark.implicits._

  JdbcMetaStore.ensureDialect

  private val ConfigTable = "billing_alerts_setting"
  private val StepperTable = "user_stepper_form_step_status"
  private val StatusTable = "billing_etl_status"

  private val ConfigCols = Seq("org_id", "projectid", "billingdataset", "tableid",
    "pulsebillingdataset", "pulsetableid", "customerserviceaccountid")
  private val StepperCols = Seq("stepid", "org_id", "step_completed")
  private val StatusCols = Seq("seq", "org_id", "project_id", "status", "end_date_time")

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", driver)
    p
  }

  private def withConnection[A](f: Connection => A): A = {
    Class.forName(driver)
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** Create-if-absent: Derby has no IF NOT EXISTS, so an existing table is
    * recognized by SQLState X0Y32 (MySQL/Postgres would use IF NOT EXISTS
    * DDL instead).
    */
  private def ensureTable(ddl: String): Unit = withConnection { c =>
    val st = c.createStatement()
    try st.executeUpdate(ddl)
    catch { case e: SQLException if e.getSQLState == "X0Y32" => () }
    finally st.close()
  }

  // explicit DDL instead of writer-created tables: Spark's Derby dialect
  // maps StringType to CLOB, which Derby refuses to compare with `=` —
  // pushed-down filters (org_id + projectid point lookups) need VARCHAR
  ensureTable(s"""CREATE TABLE $ConfigTable (
    org_id INT NOT NULL, projectid VARCHAR(256) NOT NULL,
    billingdataset VARCHAR(256), tableid VARCHAR(256),
    pulsebillingdataset VARCHAR(256), pulsetableid VARCHAR(256),
    customerserviceaccountid VARCHAR(256))""")
  ensureTable(s"""CREATE TABLE $StepperTable (
    stepid INT NOT NULL, org_id INT NOT NULL, step_completed BOOLEAN NOT NULL)""")
  ensureTable(s"""CREATE TABLE $StatusTable (
    seq BIGINT NOT NULL, org_id INT NOT NULL, project_id VARCHAR(256) NOT NULL,
    status VARCHAR(32) NOT NULL, end_date_time TIMESTAMP)""")

  /** `spark.read.jdbc` with the engine's lowercase column names restored
    * (SELECT * returns columns in DDL order, so the rename is positional).
    */
  private def readTable(table: String, names: Seq[String]): DataFrame =
    spark.read.jdbc(url, table, props).toDF(names: _*)

  /** Replace-whole-table fixture path: TRUNCATE (keeps our VARCHAR DDL —
    * a drop-and-recreate by the writer would resurrect the CLOB mapping)
    * + Spark JDBC append.
    */
  private def replaceTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("truncate", "true").jdbc(url, table, props)

  override def putConfigs(rows: Seq[ClientBillingConfig]): Unit =
    replaceTable(rows.toDF(), ConfigTable)

  override def configs: Dataset[ClientBillingConfig] =
    readTable(ConfigTable, ConfigCols).as[ClientBillingConfig]

  override def updateConfig(orgId: Int, projectId: String,
                            fields: Map[String, String]): Long = {
    // whitelist first (billing_etl_db.py:126-129): only vetted column
    // names ever reach the SQL text; values are bound as parameters
    val allowed = fields.view.filterKeys(MetaStore.UpdatableConfigColumns)
      .toMap.toSeq.sortBy(_._1)
    if (allowed.isEmpty) return 0L
    val sets = allowed.map { case (k, _) => s"$k = ?" }.mkString(", ")
    withConnection { c =>
      val ps = c.prepareStatement(
        s"UPDATE $ConfigTable SET $sets WHERE org_id = ? AND projectid = ?")
      try {
        allowed.zipWithIndex.foreach { case ((_, v), i) => ps.setString(i + 1, v) }
        ps.setInt(allowed.size + 1, orgId)
        ps.setString(allowed.size + 2, projectId)
        ps.executeUpdate().toLong
      } finally ps.close()
    }
  }

  override def putSteps(rows: Seq[StepStatus]): Unit =
    replaceTable(rows.toDF(), StepperTable)

  override def steps: Dataset[StepStatus] =
    readTable(StepperTable, StepperCols).as[StepStatus]

  override def updateStepCompleted(stepId: Int, orgId: Int, completed: Boolean): Long =
    withConnection { c =>
      val ps = c.prepareStatement(
        s"UPDATE $StepperTable SET step_completed = ? WHERE stepid = ? AND org_id = ?")
      try {
        ps.setBoolean(1, completed)
        ps.setInt(2, stepId)
        ps.setInt(3, orgId)
        ps.executeUpdate().toLong
      } finally ps.close()
    }

  override def appendStatus(seq: Long, s: EtlStatus): Unit =
    Seq((seq, s.org_id, s.project_id, s.status, s.end_date_time.orNull))
      .toDF(StatusCols: _*)
      .coalesce(1).write.mode(SaveMode.Append).jdbc(url, StatusTable, props)

  override def statusLog: DataFrame = readTable(StatusTable, StatusCols)
}

object JdbcMetaStore {
  /** Spark's built-in Derby dialect maps StringType to CLOB, which poisons
    * BOTH directions against our VARCHAR DDL: the writer's `setNull` binds
    * Types.CLOB into VARCHAR columns (SQLState 22005), and Derby refuses
    * `=` comparisons on CLOB if the writer ever created the table itself.
    * This override maps StringType to VARCHAR(256) and leaves every other
    * type to the built-in dialect (registered dialects are consulted
    * first; None falls through).
    */
  private object DerbyVarcharDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
        : Option[org.apache.spark.sql.jdbc.JdbcType] = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(256)", java.sql.Types.VARCHAR))
      case _ => None
    }
    // Derby TRUNCATE does not cascade; declaring it makes the writer's
    // Overwrite+truncate path actually TRUNCATE instead of dropping and
    // recreating the table (which would discard our DDL's unquoted,
    // case-folded identifiers for quoted lowercase ones and break the
    // driver-side UPDATE statements)
    override def isCascadingTruncateTable(): Option[Boolean] = Some(false)
  }

  /** Idempotent one-time registration (lazy val body runs once per JVM). */
  lazy val ensureDialect: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)
}
