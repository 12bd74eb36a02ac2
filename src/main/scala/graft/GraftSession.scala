package graft

import org.apache.spark.sql.SparkSession

/** The library's SQL-surface entry point: make everything the engine
  * offers callable from plain `spark.sql(...)` on a caller-provided
  * session — temp views for every corpus table (loaded through
  * [[Tables.load]], so the nanos-timestamp rescale and its pushdown rule
  * come along), plus both native function families
  * (`graft_token_hashes`/`graft_shingle_hashes`/`graft_ngram8_hashes`/
  * `graft_minhash_sig64`/`graft_simhash60[_shingles]`/
  * `graft_repetition_stats`, `graft_cosine`/`graft_lsh_keys`).
  *
  * A user of the reference drives it with SQL text shipped to BigQuery /
  * MySQL; after `GraftSession.init` the same habit works here — the
  * `sql_api_pricing_summary` gate query runs one IDENTICAL ANSI string on
  * Spark and on the DuckDB oracle.
  */
object GraftSession {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Idempotent: (re)registers views + functions; returns the session. */
  def init(spark: SparkSession, dir: String): SparkSession = {
    functions.NativeText.register(spark)
    functions.NativeVector.register(spark)
    functions.NativeAgg.register(spark)
    functions.CountMin.register(spark)
    functions.DaySpanTvf.register(spark)
    plans.AsofJoin.register(spark)
    TableNames.foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    spark
  }
}
