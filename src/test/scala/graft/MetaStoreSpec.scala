package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{JdbcMetaStore, MetaStore}
import graft.model.{ClientBillingConfig, EtlStatus, StepStatus}

/** Control-table semantics: S9/S10 whitelisted UPDATEs, S8 append log, S4
  * checkpoint read (SURVEY §7.4 items 3/5) — the SAME battery against both
  * backends: the versioned-parquet FS store and the real-JDBC (embedded
  * Derby) store, so backend choice can never change control-plane
  * behavior.
  */
class MetaStoreSpec extends AnyFunSuite {
  import SparkTestBase._

  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private val backends: Seq[(String, () => MetaStore)] = Seq(
    "fs" -> (() => MetaStore(tmpDir("meta_spec_"))),
    "jdbc" -> (() => new JdbcMetaStore(s"jdbc:derby:${tmpDir("meta_jdbc_")}/db;create=true")))

  private def forEachBackend(body: (String, () => MetaStore) => Unit): Unit =
    backends.foreach { case (name, fresh) => body(name, fresh) }

  test("config update honors the reference's column whitelist (both backends)") {
    forEachBackend { (name, fresh) =>
      val m = fresh()
      m.putConfigs(Seq(ClientBillingConfig(1, "p1", "bd", "t", None, None, None)))
      // non-whitelisted keys must be ignored (billing_etl_db.py:126-129)
      assert(m.updateConfig(1, "p1", Map("projectid" -> "EVIL", "billingdataset" -> "EVIL")) == 0,
        name)
      assert(m.configFor(1).get.projectid == "p1", name)
      assert(m.updateConfig(1, "p1",
        Map("pulsebillingdataset" -> "ds9", "pulsetableid" -> "tb9", "projectid" -> "EVIL")) == 1,
        name)
      val c = m.configFor(1).get
      assert(c.pulsebillingdataset.contains("ds9") && c.pulsetableid.contains("tb9"), name)
      assert(c.projectid == "p1", name)
    }
  }

  test("updates report rows_affected, 0 on no match (both backends)") {
    forEachBackend { (name, fresh) =>
      val m = fresh()
      m.putSteps(Seq(StepStatus(3, 1, step_completed = false)))
      assert(m.updateStepCompleted(3, 999, completed = true) == 0, name)
      assert(m.updateStepCompleted(3, 1, completed = true) == 1, name)
      assert(m.steps.collect().head.step_completed, name)
    }
  }

  test("repeated updates are last-writer-wins and never duplicate rows (both backends)") {
    forEachBackend { (name, fresh) =>
      val m = fresh()
      m.putConfigs(Seq(ClientBillingConfig(1, "p1", "bd", "t", None, None, None)))
      (1 to 5).foreach(i => m.updateConfig(1, "p1", Map("pulsetableid" -> s"v$i")))
      assert(m.configFor(1).get.pulsetableid.contains("v5"), name)
      assert(m.configs.count() == 1, s"$name: overwrites must not duplicate rows")
    }
  }

  test("checkpoint read: None before any SUCCESS, filters by key and status (both backends)") {
    forEachBackend { (name, fresh) =>
      val m = fresh()
      assert(m.lastSuccessWatermark(1, "p1").isEmpty, name)
      val t1 = utcTs("2024-01-10 00:00:00")
      val t2 = utcTs("2024-01-12 00:00:00")
      m.appendStatus(1, EtlStatus(1, "p1", EtlStatus.InProgress, Some(t2)))
      assert(m.lastSuccessWatermark(1, "p1").isEmpty, s"$name: IN_PROGRESS must not count")
      m.appendStatus(2, EtlStatus(1, "p1", EtlStatus.Success, Some(t1)))
      m.appendStatus(3, EtlStatus(2, "p2", EtlStatus.Success, Some(t2)))
      assert(m.lastSuccessWatermark(1, "p1").contains(t1), s"$name: other keys must not leak")
      m.appendStatus(4, EtlStatus(1, "p1", EtlStatus.Success, Some(t2)))
      assert(m.lastSuccessWatermark(1, "p1").contains(t2), s"$name: latest SUCCESS wins")
      assert(m.nextStatusSeq == 5L, name)
    }
  }

  test("control plane is storage-agnostic: works through an explicit file: URI") {
    // An explicit-scheme URI is how every non-local root (hdfs://, s3a://)
    // arrives; java.nio.Paths.get("file:///...") mangles it into a relative
    // path, so this round-trips only if the pointer/probe logic goes through
    // the Hadoop FileSystem API (the bug class round 2 found in EtlJob).
    val m = MetaStore("file://" + tmpDir("meta_uri_spec_"))
    m.putConfigs(Seq(ClientBillingConfig(1, "p1", "bd", "t", None, None, None)))
    assert(m.updateConfig(1, "p1", Map("pulsetableid" -> "tb9")) == 1)
    assert(m.configFor(1).get.pulsetableid.contains("tb9"))
    assert(m.lastSuccessWatermark(1, "p1").isEmpty, "empty status log reads as empty, not a crash")
    val t1 = utcTs("2024-01-10 00:00:00")
    m.appendStatus(1, EtlStatus(1, "p1", EtlStatus.Success, Some(t1)))
    assert(m.lastSuccessWatermark(1, "p1").contains(t1))
    assert(m.nextStatusSeq == 2L)
  }

  test("JDBC store survives reopen: state lives in the database, not the object") {
    val dir = tmpDir("meta_jdbc_reopen_")
    val url = s"jdbc:derby:$dir/db;create=true"
    val m1 = new JdbcMetaStore(url)
    m1.putConfigs(Seq(ClientBillingConfig(1, "p1", "bd", "t", None, None, None)))
    m1.appendStatus(1, EtlStatus(1, "p1", EtlStatus.Success, Some(utcTs("2024-01-10 00:00:00"))))
    val m2 = new JdbcMetaStore(url)
    assert(m2.configFor(1).get.billingdataset == "bd")
    assert(m2.nextStatusSeq == 2L)
    assert(m2.lastSuccessWatermark(1, "p1").contains(utcTs("2024-01-10 00:00:00")))
  }
}
