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

  test("protectSharedCheckpoint shields a shared Dataset from release") {
    import spark.implicits._
    val shared = (1 to 100).toDF("x").localCheckpoint(eager = true)
    val ephemeral = (1 to 100).toDF("y").localCheckpoint(eager = true)
    GraftSqlBridge.protectSharedCheckpoint(shared)
    // Bench/Verify free every returned result's blocks — a shared memoized
    // checkpoint must survive that (a local checkpoint has no lineage, so
    // an unpersisted one is unrecoverable for every later query)
    GraftSqlBridge.releaseLocalCheckpoint(shared)
    GraftSqlBridge.releaseLocalCheckpoint(ephemeral)
    val persistedIds = spark.sparkContext.getPersistentRDDs.keySet
    assert(GraftSqlBridge.logicalRddIds(shared).forall(persistedIds.contains),
      "protected checkpoint blocks were unpersisted")
    assert(GraftSqlBridge.logicalRddIds(ephemeral).forall(!persistedIds.contains(_)),
      "unprotected checkpoint blocks were not freed")
    assert(shared.count() == 100) // still readable after the release pass
    shared.unpersist(blocking = false)
  }

  test("hygienic() with the reliable checkpointer survives and matches") {
    // cluster-mode knob: the materialized result goes to the checkpoint
    // dir (executor-loss-proof) instead of executor storage; same rows,
    // same cache-release contract, files actually written
    val dir = graft.util.TempDirs.create("graft_qh_ck_")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val local = graft.ops.DedupOps
        .dedupNgramJaccardStaged(spark, Sf0001).hygienic()
        .collect().map(_.toSeq).toSeq
      val reliable = graft.ops.DedupOps
        .dedupNgramJaccardStaged(spark, Sf0001)
        .hygienic(graft.ops.ClusterOps.reliableCheckpointer)
        .collect().map(_.toSeq).toSeq
      assert(reliable == local)
      assert(GraftSqlBridge.cacheManagerEmpty(spark),
        "reliable-checkpoint hygienic left cached relations registered")
      val written = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(written > 0, "reliable checkpoint wrote no files")
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}
