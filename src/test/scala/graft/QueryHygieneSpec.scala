package graft

import org.apache.spark.sql.graft.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

/** The sweep-hygiene contract (SCALE.md "Sweep hygiene & bench
  * methodology"): a query may cache whatever it wants WHILE it runs, but
  * returning from the registry function must leave nothing registered in
  * the CacheManager, and iterative queries must not accumulate persisted
  * round blocks — otherwise a 300-query single-session sweep bills query
  * N's working set to query N+40 (r11: `graph_triangles` 6.75 s isolated
  * → 24.6 s at sweep position ~130).
  */
class QueryHygieneSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Every registry query whose plan references query-local caches. */
  private val cachingQueries = Seq(
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_source_matrix", "dedup_containment", "dedup_clusters",
    "graph_triangles", "graph_pagerank", "graph_bfs_hops",
    "basket_lift", "stats_kmv_setops", "embed_kmeans", "embed_outliers",
    "semdedup_prune", "ingest_screen_pipeline")

  test("hygienic queries leave NOTHING registered in the CacheManager") {
    spark.catalog.clearCache() // start from a known-clean session
    cachingQueries.foreach { name =>
      val df = SparkEntry.queries(name)(spark, Sf0001)
      df.count() // terminal action, as Verify/Bench/the driver run it
      assert(GraftSqlBridge.cacheManagerEmpty(spark),
        s"$name left cached relations registered after returning")
    }
  }

  test("iterative queries do not accumulate persisted round blocks") {
    // each call may leave AT MOST its own materialized result (freed by
    // the ContextCleaner once the caller drops the reference); superseded
    // rounds are released eagerly — growth must be O(calls), never
    // O(calls × rounds)
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    (1 to 3).foreach { _ =>
      SparkEntry.queries("graph_pagerank")(spark, Sf0001).count()
      SparkEntry.queries("dedup_clusters")(spark, Sf0001).count()
    }
    val grown = persisted - before
    // 6 calls; pagerank leaves 1 (final ranks), dedup_clusters ≤ 2 (final
    // labels + the checkpointed pair set feeding the lazy projection) —
    // anything near rounds×calls (≥ 20) means a release regressed
    assert(grown <= 12, s"persisted RDDs grew by $grown across 6 iterative calls")
    assert(GraftSqlBridge.cacheManagerEmpty(spark))
  }
}
