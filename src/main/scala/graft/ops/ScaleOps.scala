package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities that don't map to a single reference operator but are
  * load-bearing at 100 TB: skew-safe joins via salting, and bucketed-table
  * helpers for shuffle-free repeated joins (see BucketedJoinSpec for the
  * co-located-join evidence).
  */
object ScaleOps {

  /** Equi-join that survives heavy key skew: the left (large, skewed) side
    * gets a uniform salt derived from a per-row fingerprint; the right
    * (dimension) side is replicated once per salt value. The join key
    * becomes (key, salt), so a hot key's rows spread over `saltFactor`
    * reducers instead of melting one. Result multiset is identical to the
    * unsalted join (inner/left semantics preserved for equi-keys).
    *
    * AQE's skew-join handles sort-merge skew adaptively; explicit salting
    * remains the tool when the skew is extreme or the join is
    * broadcast-ineligible — and it composes with AQE.
    */
  def saltedJoin(
      left: DataFrame,
      leftKey: Column,
      right: DataFrame,
      rightKey: Column,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    // right/full-outer would emit one row per salt replica for unmatched
    // right rows — multiset-wrong. Salting only composes with join types
    // that never preserve unmatched RIGHT rows.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(normalized),
      s"saltedJoin does not support joinType=$joinType (unmatched right rows would replicate)")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
      leftKey === rightKey && salted("__salt") === replicated("__salt"), joinType)
      .drop("__salt")
  }

  /** Persist `df` as a hash-bucketed, per-bucket-sorted parquet table:
    * repeated equi-joins or aggregations on `key` then read the buckets
    * co-located and skip their Exchange entirely (asserted in
    * BucketedJoinSpec) — the amortize-one-shuffle-across-many-reads tool
    * for hub tables (config dims, signature indexes, entity maps) that a
    * 100 TB pipeline joins against daily.
    *
    * Bucketing metadata lives in the session catalog (`saveAsTable`), so
    * both bucketed writers and readers must share a catalog/metastore;
    * `spark.sql.sources.bucketing.enabled` (default true) governs whether
    * reads exploit it.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Shuffle-free equi-join of two tables previously written by
    * [[writeBucketed]] with the SAME bucket count on the join key.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** Compact a date-partitioned parquet destination: every incremental run
    * appends `shuffle.partitions` small files per touched partition, and at
    * 100 TB the accumulated small files dominate scan planning and NameNode
    * pressure. Rewrites each partition into ~`targetBytes`-sized files via
    * dynamic partition overwrite (readers see old-or-new, atomically per
    * partition). Returns (files before, files after).
    *
    * At cluster scale this runs as periodic maintenance over recent
    * partitions only — date pruning keeps the rewrite proportional to the
    * compaction window, not the table's history.
    */
  def compactDatePartitions(
      spark: SparkSession,
      destDir: String,
      partitionCol: String = "export_date",
      targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    // Hadoop FileSystem, not java.nio: the destination is HDFS/S3 at scale.
    // One recursive listing serves both the file count and the byte total —
    // each listing is a full remote round-trip on HDFS/S3.
    val beforeFiles = graft.util.Fs.listParquetFiles(spark, destDir)
    val before = beforeFiles.size.toLong
    val df = spark.read.parquet(destDir)
    val totalBytes = beforeFiles.map(_._2).sum
    val nParts = math.max(1, (totalBytes / targetBytes).toInt)
    // stage through a temp copy: Spark cannot overwrite a path it reads
    val stage = graft.util.TempDirs.create("graft_compact_")
    df.repartition(nParts, col(partitionCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(stage)
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.read.parquet(stage)
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(destDir)
    finally prevMode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    (before, graft.util.Fs.listParquetFiles(spark, destDir).size.toLong)
  }
}
