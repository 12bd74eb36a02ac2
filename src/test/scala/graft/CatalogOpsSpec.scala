package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{CatalogOps, MetaStore}
import graft.model.{ClientBillingConfig, EngineError, StepStatus}

/** D1–D5: the provisioning saga and its compensating cleanup
  * (reference: dataset_utils.py:110-228).
  */
class CatalogOpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("provision saga creates namespace + table and writes back config/step") {
    val m = MetaStore(tmpDir("saga_"))
    m.putConfigs(Seq(ClientBillingConfig(801, "p801", "bd", "t", None, None, None)))
    m.putSteps(Seq(StepStatus(3, 801, step_completed = false)))
    val res = CatalogOps.provision(spark, m, 801, "p801", sleeper = _ => ())
    try {
      assert(res.isRight)
      assert(spark.catalog.databaseExists("org_801_standard_export"))
      assert(CatalogOps.tableExists(spark, "org_801_standard_export",
        "org_801_standard_export_table"))
      val c = m.configFor(801).get
      assert(c.pulsebillingdataset.contains("org_801_standard_export"))
      assert(c.pulsetableid.contains("org_801_standard_export_table"))
      assert(m.steps.collect().exists(st => st.org_id == 801 && st.step_completed))
    } finally CatalogOps.dropNamespaceCascade(spark, "org_801_standard_export")
  }

  test("saga failure compensates by dropping the namespace cascade") {
    val m = MetaStore(tmpDir("saga_"))
    // no config row for this org → the S9 write-back step must fail
    m.putConfigs(Seq(ClientBillingConfig(1, "p1", "bd", "t", None, None, None)))
    val res = CatalogOps.provision(spark, m, 802, "p802", sleeper = _ => ())
    assert(res.swap.toOption.get.isInstanceOf[EngineError.ProvisioningFailed])
    assert(!spark.catalog.databaseExists("org_802_standard_export"),
      "compensation must remove the half-provisioned namespace")
  }

  test("created table carries the full nested billing-export schema") {
    val m = MetaStore(tmpDir("saga_"))
    m.putConfigs(Seq(ClientBillingConfig(803, "p803", "bd", "t", None, None, None)))
    m.putSteps(Seq(StepStatus(3, 803, step_completed = false)))
    CatalogOps.provision(spark, m, 803, "p803", sleeper = _ => ())
    try {
      val schema = spark.table("`org_803_standard_export`.`org_803_standard_export_table`").schema
      assert(schema == graft.schema.BillingExportSchema.schema)
    } finally CatalogOps.dropNamespaceCascade(spark, "org_803_standard_export")
  }
}
