package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MetaStore
import graft.model.{ClientBillingConfig, EtlStatus, StepStatus}

/** Control-table semantics: S9/S10 whitelisted UPDATEs as atomic versioned
  * overwrites, S8 append log, S4 checkpoint read (SURVEY §7.4 items 3/5).
  */
class MetaStoreSpec extends AnyFunSuite {
  import SparkTestBase._

  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def fresh(): MetaStore = new MetaStore(tmpDir("meta_spec_"))

  test("config update honors the reference's column whitelist") {
    val m = fresh()
    m.putConfigs(Seq(ClientBillingConfig(1, "p1", "bd", "t", None, None, None)))
    // non-whitelisted keys must be ignored (billing_etl_db.py:126-129)
    assert(m.updateConfig(1, "p1", Map("projectid" -> "EVIL", "billingdataset" -> "EVIL")) == 0)
    assert(m.configFor(1).get.projectid == "p1")
    assert(m.updateConfig(1, "p1",
      Map("pulsebillingdataset" -> "ds9", "pulsetableid" -> "tb9", "projectid" -> "EVIL")) == 1)
    val c = m.configFor(1).get
    assert(c.pulsebillingdataset.contains("ds9") && c.pulsetableid.contains("tb9"))
    assert(c.projectid == "p1")
  }

  test("updates report rows_affected, 0 on no match") {
    val m = fresh()
    m.putSteps(Seq(StepStatus(3, 1, step_completed = false)))
    assert(m.updateStepCompleted(3, 999, completed = true) == 0)
    assert(m.updateStepCompleted(3, 1, completed = true) == 1)
    assert(m.steps.collect().head.step_completed)
  }

  test("versioned overwrite is last-writer-wins and never half-visible") {
    val m = fresh()
    m.putConfigs(Seq(ClientBillingConfig(1, "p1", "bd", "t", None, None, None)))
    (1 to 5).foreach(i => m.updateConfig(1, "p1", Map("pulsetableid" -> s"v$i")))
    assert(m.configFor(1).get.pulsetableid.contains("v5"))
    assert(m.configs.count() == 1, "overwrites must not duplicate rows")
  }

  test("control plane is storage-agnostic: works through an explicit file: URI") {
    // An explicit-scheme URI is how every non-local root (hdfs://, s3a://)
    // arrives; java.nio.Paths.get("file:///...") mangles it into a relative
    // path, so this round-trips only if the pointer/probe logic goes through
    // the Hadoop FileSystem API (the bug class round 2 found in EtlJob).
    val m = new MetaStore("file://" + tmpDir("meta_uri_spec_"))
    m.putConfigs(Seq(ClientBillingConfig(1, "p1", "bd", "t", None, None, None)))
    assert(m.updateConfig(1, "p1", Map("pulsetableid" -> "tb9")) == 1)
    assert(m.configFor(1).get.pulsetableid.contains("tb9"))
    assert(m.lastSuccessWatermark(1, "p1").isEmpty, "empty status log reads as empty, not a crash")
    val t1 = utcTs("2024-01-10 00:00:00")
    m.appendStatus(1, EtlStatus(1, "p1", EtlStatus.Success, Some(t1)))
    assert(m.lastSuccessWatermark(1, "p1").contains(t1))
    assert(m.nextStatusSeq == 2L)
  }

  test("checkpoint read: None before any SUCCESS, filters by key and status") {
    val m = fresh()
    assert(m.lastSuccessWatermark(1, "p1").isEmpty)
    val t1 = utcTs("2024-01-10 00:00:00")
    val t2 = utcTs("2024-01-12 00:00:00")
    m.appendStatus(1, EtlStatus(1, "p1", EtlStatus.InProgress, Some(t2)))
    assert(m.lastSuccessWatermark(1, "p1").isEmpty, "IN_PROGRESS must not count")
    m.appendStatus(2, EtlStatus(1, "p1", EtlStatus.Success, Some(t1)))
    m.appendStatus(3, EtlStatus(2, "p2", EtlStatus.Success, Some(t2)))
    assert(m.lastSuccessWatermark(1, "p1").contains(t1), "other keys must not leak")
    m.appendStatus(4, EtlStatus(1, "p1", EtlStatus.Success, Some(t2)))
    assert(m.lastSuccessWatermark(1, "p1").contains(t2), "latest SUCCESS wins")
  }
}
