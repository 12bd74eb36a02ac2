package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev measurement main (optimization guide §1.1/§1.4/§7.2): dump the
  * EXECUTED physical plan (`explain("formatted")`, AQE-final) for named
  * registry queries to `<outDir>/<query>_<suffix>.txt` — the before/after
  * plan evidence an optimization round commits alongside its bench numbers.
  *
  * Two accuracy rules, both from the guide:
  *  - the dumped plan is taken AFTER a noop-sink execution (§1.4), so with
  *    AQE it is the FINAL re-optimized plan (runtime join rewrites,
  *    coalesced reads), not the `isFinalPlan=false` guess;
  *  - hygienic queries return a materialized local checkpoint whose outer
  *    plan is an opaque `Scan ExistingRDD`; for those the dump uses the
  *    op's `*Staged` accessor and prints the real pipeline plan (the same
  *    plan PlanSpec pins), releasing the stage's caches afterwards.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query ...]
  * (no query names = every registered query). Data dir from
  * SPARK_GRAFT_SF_DIR (default sf0.001; use a larger SF when AQE/broadcast
  * thresholds are the question). Side-effecting query builders (ETL writes,
  * stream drains) execute as part of plan construction, exactly as in
  * PlanAudit.
  */
object PlanDump {

  /** Inner-pipeline accessors for hygienic queries (outer plan is opaque). */
  private val stagedAccessors: Map[String, (SparkSession, String) => ops.QueryHygiene.Staged] =
    Map(
      "basket_lift" -> (ops.ProductAnalyticsOps.basketLiftStaged _),
      "dedup_simhash" -> (ops.DedupOps.dedupSimhashStaged _),
      "dedup_minhash_lsh" -> (ops.DedupOps.dedupMinhashLshStaged _),
      "dedup_ngram_jaccard" -> (ops.DedupOps.dedupNgramJaccardStaged _),
      "dedup_containment" -> (ops.DedupOps.dedupContainmentStaged _),
      "dedup_incremental" -> (ops.IncrementalDedupOps.dedupIncrementalStaged _),
      "graph_triangles" -> (ops.ClusterOps.graphTrianglesStaged _),
      "stats_kmv_setops" -> (ops.CoverageOps.statsKmvSetopsStaged _)
    )

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.TempDirs.create("graft_local_"))
      // catalog-table data (bucketed scratch tables, saga namespaces) is
      // ephemeral in these mains — same RAM-fs scratch policy as local.dir;
      // a real deployment points the warehouse at durable storage
      .config("spark.sql.warehouse.dir", graft.util.TempDirs.create("graft_wh_"))
      // guide §3.1/§9: allow shuffled-hash where its size conditions hold,
      // and let AQE rewrite SMJ→SHJ when every post-shuffle partition fits
      // 64 MB (size-bounded, so the build side can never OOM a partition).
      // At bench SF this flips exactly one plan (dedup_simhash's self-join,
      // −2 Sorts; bench-neutral) — the win lives at cluster SFs where dims
      // outgrow broadcast but fit a partition. See OPTIMIZATION_r17.md §1.
      // SPARK_GRAFT_PLANDUMP_LEGACY_SMJ=1 re-captures plans under the
      // pre-r17 join defaults, so before/after evidence shares one capture
      // methodology (executed AQE-final plans)
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.contains("SPARK_GRAFT_PLANDUMP_LEGACY_SMJ").toString)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        if (sys.env.contains("SPARK_GRAFT_PLANDUMP_LEGACY_SMJ")) "0" else "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Logs.suppressExpectedUnpersistWarnings()
    val selected =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else names.toSeq
    val missing = selected.filterNot(SparkEntry.queries.contains)
    if (missing.nonEmpty) System.err.println(s"[plandump] unknown queries: ${missing.mkString(", ")}")
    selected.filter(SparkEntry.queries.contains).foreach { name =>
      try {
        val (df, release): (DataFrame, () => Unit) = stagedAccessors.get(name) match {
          case Some(acc) =>
            val st = acc(spark, sfDir)
            (st.plan, () => st.release())
          case None =>
            val d = SparkEntry.queries(name)(spark, sfDir)
            (d, () => org.apache.spark.sql.graft.GraftSqlBridge.releaseLocalCheckpoint(d))
        }
        // guide §1.4: noop sink computes every column of every row and,
        // with AQE, turns the dumped plan into the FINAL executed one
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        release()
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
