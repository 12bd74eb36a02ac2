package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{MetaStore, TenantCredentials}
import graft.etl.TenantCredentials._
import graft.model.{ClientBillingConfig, EngineError}

/** Per-tenant credential scoping (SURVEY N5): the credential must land on
  * the one relation it was issued for — observable in the plan's
  * HadoopFsRelation options — and never on the session or the shared
  * Hadoop conf; the broker must honor the reference's 3600 s lifetime;
  * denial must fail closed.
  */
class TenantScopeSpec extends AnyFunSuite {
  import SparkTestBase._

  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def relationOptions(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.queryExecution.analyzed.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => fs.options
    }.head

  private def fixture(revoked: Set[Int] = Set.empty) = {
    val tmp = tmpDir("tenant_spec_")
    val meta = MetaStore(s"$tmp/meta")
    meta.putConfigs(Seq(
      ClientBillingConfig(1, "p1", "bd", "t", None, None, Some("sa-1@t1")),
      ClientBillingConfig(2, "p2", "bd", "t", None, None, Some("sa-2@t2")),
      ClientBillingConfig(3, "p3", "bd", "t", None, None, None)))
    import s.implicits._
    (1 to 3).foreach { org =>
      Seq((org, s"row_of_$org")).toDF("org_id", "payload")
        .write.parquet(s"$tmp/src/org_$org")
    }
    (tmp, meta)
  }

  test("credential is scoped to the tenant's relation, not the session") {
    val (tmp, meta) = fixture()
    val clock = () => 1000000L
    val sources = new TenantSources(spark, meta, new StaticBroker(), cfg =>
      s"$tmp/src/org_${cfg.org_id}", clock)

    val df1 = sources.read(1).toOption.get
    val df2 = sources.read(2).toOption.get
    val o1 = relationOptions(df1)
    val o2 = relationOptions(df2)
    // each relation carries exactly its own tenant's credential
    assert(o1("graft.auth.principal") == "sa-1@t1")
    assert(o2("graft.auth.principal") == "sa-2@t2")
    assert(o1("graft.auth.token") != o2("graft.auth.token"))
    // and the scope is the relation: nothing leaked into shared state
    assert(spark.conf.getOption("graft.auth.token").isEmpty)
    assert(spark.sparkContext.hadoopConfiguration.get("graft.auth.token") == null)
    // the scoped reads still read the right data
    assert(df1.select("payload").collect().map(_.getString(0)).toSeq == Seq("row_of_1"))
    assert(df2.select("payload").collect().map(_.getString(0)).toSeq == Seq("row_of_2"))
    // an org with no customer SA reads with ambient credentials: no auth options
    val o3 = relationOptions(sources.read(3).toOption.get)
    assert(!o3.contains("graft.auth.token") && !o3.contains("graft.auth.principal"))
  }

  test("broker caches within the 3600s lifetime and reissues after it") {
    var issued = 0
    val counting = new CredentialBroker {
      private val inner = new StaticBroker()
      def issue(orgId: Int, sa: String, nowMs: Long): Option[ScopedCredential] = {
        issued += 1; inner.issue(orgId, sa, nowMs)
      }
    }
    val broker = new CachingBroker(counting)
    val t0 = 5000L
    val c1 = broker.issue(1, "sa-1", t0).get
    // inside the lifetime: cached, no re-mint
    assert(broker.issue(1, "sa-1", t0 + LifetimeMs - 1).get == c1)
    assert(issued == 1)
    // different org: its own credential
    broker.issue(2, "sa-2", t0)
    assert(issued == 2)
    // expired: re-minted with a fresh token
    val c2 = broker.issue(1, "sa-1", t0 + LifetimeMs + 1).get
    assert(issued == 3 && c2.options("graft.auth.token") != c1.options("graft.auth.token"))
    // SA rotation on the config row must invalidate the cache immediately
    broker.issue(1, "sa-1-rotated", t0 + LifetimeMs + 2)
    assert(issued == 4)
  }

  test("denied credential fails closed, never falls back to ambient reads") {
    val (tmp, meta) = fixture()
    val sources = new TenantSources(spark, meta,
      new CachingBroker(new StaticBroker(revoked = Set(2))),
      cfg => s"$tmp/src/org_${cfg.org_id}", () => 0L)
    assert(sources.read(1).isRight)
    sources.read(2) match {
      case Left(EngineError.CredentialDenied(2, sa)) => assert(sa == "sa-2@t2")
      case other => fail(s"expected CredentialDenied, got $other")
    }
    sources.read(99) match {
      case Left(EngineError.MissingConfig(99)) => ()
      case other => fail(s"expected MissingConfig, got $other")
    }
  }
}
