package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (see /root/repo/TESTDATA.md).
  *
  * All engine code reads sources through here so the physical layout
  * (single parquet file per table locally; partitioned directories on a
  * real cluster) is a one-place concern.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Corpus tables are immutable inputs, so the (dir, name) → DataFrame plan
  // is memoized per session: every load otherwise re-runs file listing +
  // footer schema inference on the driver (~100 ms each), which dominates
  // short queries and at cluster scale hammers the object store with
  // redundant LIST/HEAD calls — a catalog caches listings for the same
  // reason. The memoized plan pins the file listing at first load: files
  // added to a (dir, name) later are invisible to that session — fine for
  // this corpus contract, wrong for a landing zone (use the streaming
  // source for those). The cached DataFrames strongly reference their
  // session, so retirement relies on SessionMemo's stopped-context sweep.
  private val cache = new graft.util.SessionMemo[(String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate(spark, (dir, name))(doLoad(spark, dir, name))

  private def doLoad(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The ingest edge must absorb every timestamp encoding a real landing
    // zone produces (the reference tolerates timezone-naive timestamps end
    // to end — core/services/billing_etl.py:35-40 serializes bare
    // isoformat() and the warehouse coerces on load):
    //   - TIMESTAMP(NANOS): Spark 4 refuses it by default
    //     (PARQUET_TYPE_ILLEGAL). Read nanos as long, rescale to micros
    //     TimestampType (test data is micro-precision → lossless).
    //     NanosTimestampPushdown rewrites watermark predicates on the
    //     derived column back onto the raw long so row-group skipping works.
    //   - TIMESTAMP(MICROS, isAdjustedToUTC=false) — what pandas/DuckDB
    //     write by default — which Spark 4 infers as TIMESTAMP_NTZ.
    //     Disable NTZ inference so it lands as TimestampType directly
    //     (session TZ is pinned UTC, so the reading is exact and matches
    //     the DuckDB oracle's naive view of the same bytes).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    graft.plans.NanosTimestampPushdown.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val rescaled =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    normalizeNtz(rescaled)
  }

  /** Belt-and-braces for sources loaded outside the conf's reach (e.g. a
    * schema inferred before the conf was set): cast any remaining
    * TIMESTAMP_NTZ to TimestampType — including NTZ nested inside
    * struct/array/map columns (a struct→struct cast rewrites just the
    * changed leaves). The session TZ is pinned UTC, so the cast is the
    * identity on the underlying micros.
    */
  private[graft] def normalizeNtz(df: DataFrame): DataFrame = {
    def deNtz(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
      dt match {
        case TimestampNTZType => TimestampType
        case s: org.apache.spark.sql.types.StructType =>
          org.apache.spark.sql.types.StructType(
            s.fields.map(f => f.copy(dataType = deNtz(f.dataType))))
        case a: org.apache.spark.sql.types.ArrayType => a.copy(elementType = deNtz(a.elementType))
        case m: org.apache.spark.sql.types.MapType =>
          m.copy(keyType = deNtz(m.keyType), valueType = deNtz(m.valueType))
        case other => other
      }
    val changed = df.schema.fields.collect {
      case f if deNtz(f.dataType) != f.dataType => f.name -> deNtz(f.dataType)
    }
    if (changed.isEmpty) df
    else changed.foldLeft(df) { case (d, (name, t)) => d.withColumn(name, col(name).cast(t)) }
  }
}
