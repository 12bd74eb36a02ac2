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
    * (two watermarked runs over `events`; driver smoke-checks rows>0).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.EtlOps.queries("etl_run_dest")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalOps.queries ++ ops.EtlOps.queries ++ ops.MessageOps.queries ++
      ops.DedupOps.queries ++ ops.IncrementalDedupOps.queries ++ ops.ClusterOps.queries ++
      ops.SimilarityOps.queries ++ ops.TextAnalysisOps.queries ++
      ops.MultimodalOps.queries ++ ops.StreamingOps.queries ++
      ops.SamplingOps.queries ++ ops.IngestScreenOps.queries ++ ops.CoverageOps.queries ++
      ops.WarehouseOps.queries ++ ops.EmbedClusterOps.queries ++ ops.SearchOps.queries ++
      ops.ScaleOps.queries ++ ops.NestedBillingOps.queries

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
      ops.ScaleOps.oracleSql ++ ops.NestedBillingOps.oracleSql
}
