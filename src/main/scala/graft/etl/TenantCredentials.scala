package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{ClientBillingConfig, EngineError}

/** Per-tenant credential scoping — SURVEY N5 (reference:
  * core/services/billing_etl.py:20-32, the impersonated-credential helper
  * with a 3600 s token lifetime, core/services/billing_etl.py:30; the
  * client-side hook is `customerserviceaccountid` on the config row,
  * core/database/billing_etl_db.py:63-89).
  *
  * Spark-first mapping: a credential is an OPTIONS MAP applied to one
  * `DataFrameReader`. Spark merges per-read options into that relation's
  * private Hadoop configuration (`sessionState.newHadoopConfWithOptions`),
  * so the credential's scope IS the relation — two tenants' reads in the
  * same session carry different credentials, and neither the session conf
  * nor the shared hadoopConf is ever mutated. This is the real mechanism
  * for per-bucket object-store auth (per-path `fs.s3a.*` keys, SAS
  * tokens); locally the options ride along inert, and TenantScopeSpec
  * asserts they land on the right relation and nowhere else.
  *
  * Scale: the broker runs driver-side on O(tenants) tiny rows; the data
  * path is untouched. Credentials are cached per org and reissued only
  * after the lifetime lapses, so a 10k-tenant sweep makes 10k token calls
  * per hour, not per read.
  */
object TenantCredentials {

  /** Reference token lifetime (billing_etl.py:30: lifetime=3600). */
  val LifetimeMs: Long = 3600L * 1000L

  /** A short-lived, tenant-scoped read credential. */
  final case class ScopedCredential(
      orgId: Int,
      serviceAccount: String,
      options: Map[String, String],
      expiresAtMs: Long)

  /** Issues tenant credentials. `None` = denied (revoked/unknown SA) —
    * callers must fail closed.
    */
  trait CredentialBroker {
    def issue(orgId: Int, serviceAccount: String, nowMs: Long): Option[ScopedCredential]
  }

  /** Deterministic local broker: mints an opaque bearer-style token bound
    * to (org, sa, issue-time). Stands in for the reference's
    * impersonated-credential call; a real deployment substitutes an STS /
    * token-service client behind the same trait.
    */
  final class StaticBroker(revoked: Set[Int] = Set.empty) extends CredentialBroker {
    def issue(orgId: Int, serviceAccount: String, nowMs: Long): Option[ScopedCredential] =
      if (revoked(orgId)) None
      else Some(ScopedCredential(
        orgId, serviceAccount,
        Map(
          "graft.auth.principal" -> serviceAccount,
          "graft.auth.token" -> s"tok_${orgId}_$nowMs"),
        nowMs + LifetimeMs))
  }

  /** Caches per-org credentials until expiry (the reference re-impersonates
    * per job; we additionally avoid re-minting inside the lifetime).
    * Thread-safe: concurrent jobs for the same org race benignly (last
    * write wins; both tokens are valid).
    */
  final class CachingBroker(underlying: CredentialBroker) extends CredentialBroker {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[Int, ScopedCredential]()

    def issue(orgId: Int, serviceAccount: String, nowMs: Long): Option[ScopedCredential] = {
      val cached = Option(cache.get(orgId))
        .filter(c => c.serviceAccount == serviceAccount && c.expiresAtMs > nowMs)
      cached.orElse {
        val fresh = underlying.issue(orgId, serviceAccount, nowMs)
        fresh.foreach(cache.put(orgId, _))
        fresh
      }
    }
  }

  /** Resolves an org's source DataFrame with that org's credential scoped
    * to the read. Missing config → MissingConfig; broker denial → fail
    * closed with CredentialDenied (never a fallback to ambient
    * credentials — that would read tenant data as the service account).
    * A config row with NO customer SA reads with ambient credentials,
    * matching the reference's non-impersonated default path.
    */
  final class TenantSources(
      spark: SparkSession,
      meta: MetaStore,
      broker: CredentialBroker,
      pathFor: ClientBillingConfig => String,
      clock: () => Long) {

    def read(orgId: Int): Either[EngineError, DataFrame] =
      meta.configFor(orgId) match {
        case None => Left(EngineError.MissingConfig(orgId))
        case Some(cfg) =>
          cfg.customerserviceaccountid match {
            case None => Right(spark.read.parquet(pathFor(cfg)))
            case Some(sa) =>
              broker.issue(orgId, sa, clock()) match {
                case None => Left(EngineError.CredentialDenied(orgId, sa))
                case Some(cred) =>
                  Right(spark.read.options(cred.options).parquet(pathFor(cfg)))
              }
          }
      }
  }
}
