package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from SURVEY.md §2
  * (plus the LLM-pipeline operator families); `oracleSql` carries the
  * equivalent DuckDB SQL for every hash-checkable entry.
  */
object SparkEntry {

  /** Flagship: the §7.1 end-to-end incremental ETL slice on sf0.001
    * (watermarked run over `events`; driver smoke-checks rows>0).
    *
    * The extraction window is DATA-DRIVEN (jobTime = max(ts) + 1 s), not a
    * fixed date constant, so the smoke check stays non-vacuous even if a
    * fixture regeneration moves the events table's date span — the oracle
    * queries keep their fixed windows (mirrored in SQL), but the driver's
    * rows>0 gate must never hinge on a generator constant.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    implicit val s: SparkSession = spark
    val dir = "/root/testdata/sf0.001"
    val tmp = graft.util.TempDirs.create("graft_entry_")
    val meta = etl.MetaStore(s"$tmp/meta")
    meta.putConfigs(Seq(graft.model.ClientBillingConfig(
      1, "proj_entry", "ds", "t", None, None, None)))
    val src = Tables.load(spark, dir, "events")
    // same type-drift-tolerant decode as IncrementalExtract.batchStats —
    // the driver supplies this session, so its datetime conf is not ours
    val maxTs = etl.IncrementalExtract
      .batchStats(src, "ts").maxWatermark
      .getOrElse(throw new IllegalStateException("events table is empty"))
    val jobTime = new java.sql.Timestamp(maxTs.getTime + 1000L)
    val r = etl.EtlJob.run(spark, meta, src, "ts", s"$tmp/dest",
      graft.model.EtlJobMessage(1), jobTime, sleeper = _ => ())
    require(r.isRight, s"entry run failed: $r")
    etl.EtlJob.readDestination(spark, s"$tmp/dest")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalOps.queries ++ ops.EtlOps.queries ++ ops.MessageOps.queries ++
      ops.DedupOps.queries ++ ops.IncrementalDedupOps.queries ++ ops.ClusterOps.queries ++
      ops.SimilarityOps.queries ++ ops.TextAnalysisOps.queries ++
      ops.MultimodalOps.queries ++ ops.StreamingOps.queries ++
      ops.SamplingOps.queries ++ ops.IngestScreenOps.queries ++ ops.CoverageOps.queries ++
      ops.WarehouseOps.queries ++ ops.EmbedClusterOps.queries ++ ops.SearchOps.queries ++
      ops.ScaleOps.queries ++ ops.NestedBillingOps.queries ++
      ops.ProductAnalyticsOps.queries ++ ops.SeriesOps.queries ++ ops.GeoOps.queries ++
      ops.SqlSurfaceOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    ops.RelationalOps.oracleSql ++ ops.EtlOps.oracleSql ++ ops.MessageOps.oracleSql ++
      ops.DedupOps.oracleSql ++ ops.IncrementalDedupOps.oracleSql ++ ops.ClusterOps.oracleSql ++
      ops.SimilarityOps.oracleSql ++ ops.TextAnalysisOps.oracleSql ++
      ops.MultimodalOps.oracleSql ++ ops.StreamingOps.oracleSql ++
      ops.SamplingOps.oracleSql ++ ops.IngestScreenOps.oracleSql ++ ops.CoverageOps.oracleSql ++
      ops.WarehouseOps.oracleSql ++ ops.EmbedClusterOps.oracleSql ++ ops.SearchOps.oracleSql ++
      ops.ScaleOps.oracleSql ++ ops.NestedBillingOps.oracleSql ++
      ops.ProductAnalyticsOps.oracleSql ++ ops.SeriesOps.oracleSql ++ ops.GeoOps.oracleSql ++
      ops.SqlSurfaceOps.oracleSql
}
