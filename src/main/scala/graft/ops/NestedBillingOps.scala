package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{EtlJob, MetaStore}
import graft.model.{ClientBillingConfig, EtlJobMessage}
import graft.schema.BillingExportSchema

/** The nested billing-export load path exercised with REAL data — SURVEY
  * §7.4 hard part #2 at the data level, not just the metadata level.
  *
  * The reference's whole load path is: query rows of the 26-field nested
  * standard-export schema, serialize each row to JSON
  * (core/services/billing_etl.py:315-346 `serialize_row` + 1000-row
  * batches), and `load_table_from_json` into a destination created with
  * that schema (core/utility/dataset_utils.py:250-332). The arrays of
  * structs (`labels`, `credits`, `project.ancestors`, `tags`) and nullable
  * RECORDs (`adjustment_info`) must survive that boundary with the
  * null-struct vs empty-array distinction intact.
  *
  * Here the same path is Spark-native: a deterministic fixture of full
  * 26-field rows derived from `events` ([[billingRows]] — schema pinned
  * equal to [[BillingExportSchema.schema]] in NestedBillingSpec), run
  * through [[EtlJob.run]] with the JSON round-trip as the U1 transform
  * hook ([[jsonBoundary]] — `to_json` per row, `from_json` back, exactly
  * the serialize→load coercion), landing in the date-partitioned parquet
  * destination. The oracled query reads the DEST back and operates on the
  * arrays: explode-free credit summation via the `aggregate` HOF, label
  * lookup via `map_from_entries`, ancestor depth, and explicit null-vs-
  * empty credit counts — so the DuckDB hash check proves the array-of-
  * struct VALUES round-tripped, not merely the schema.
  *
  * Scale: the fixture map is per-row projection (no shuffle), the load is
  * the same scan→transform→partitioned-write shape as the S7 path, and
  * the aggregate is one hash aggregation over `service.id` — nothing here
  * is driver-side, and the JSON boundary is a codegen'd row-local
  * expression pair, so the path holds at 100 TB exactly like the plain
  * ETL slice.
  */
object NestedBillingOps {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val DuckTsFmt = "%Y-%m-%d %H:%M:%S.%f"

  /** Window end for the single deterministic run (covers every fixture row). */
  private val JobEnd = "2024-02-01 00:00:00"

  private def utcTs(s: String): Timestamp =
    Timestamp.from(java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC))

  /** Micro-precision timestamps through the JSON boundary: the default
    * JSON format carries millis only, which would silently truncate
    * `usage_start_time`/`export_time` and break watermark fidelity.
    */
  private val JsonOpts = Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  private def kv(k: Column, v: Column): Column = struct(k.as("key"), v.as("value"))

  /** Deterministic full-schema billing rows derived from `events`:
    * one billing-export row per event, every one of the 26 top-level
    * fields populated (or deliberately null), with the array-of-struct
    * fields carrying the three-way edge the JSON boundary must preserve —
    * `event_id % 3`: 0 → NULL array, 1 → EMPTY array, 2 → populated
    * (two credits, two labels). `adjustment_info` is the null-STRUCT edge
    * (`event_id % 4`). Credit amounts are exact binary fractions
    * (quarters/halves) so cent-rounding is bit-identical in any engine.
    */
  def billingRows(spark: SparkSession, dir: String): DataFrame = {
    val sch = BillingExportSchema.schema
    def t(field: String) = sch(field).dataType
    // The bench fixtures are ONE parquet split (2 MB at sf0.1), so without
    // this exchange the whole nested-struct build + JSON boundary chain
    // runs on a single task until the destination write's rebalance — the
    // entire one-time fixture-build cost serialized on one core (measured
    // as the sweep's slowest entry). Shuffle the RAW event rows (cheap,
    // flat) to session parallelism before the expensive per-row work; on a
    // real deployment the input is already thousands of splits and AQE
    // coalesces this exchange to a no-op-sized plan step.
    val ev = Tables.load(spark, dir, "events")
      .repartition(math.max(1, spark.sparkContext.defaultParallelism))
    val uid = col("user_id")
    val eid = col("event_id")

    val labels = when(eid % 3 === 0, lit(null).cast(t("labels")))
      .when(eid % 3 === 1, array().cast(t("labels")))
      .otherwise(array(
        kv(lit("env"), when(uid % 2 === 0, "prod").otherwise("dev")),
        kv(lit("team"), concat(lit("t"), (uid % 3).cast("string")))))

    val credits = when(eid % 3 === 0, lit(null).cast(t("credits")))
      .when(eid % 3 === 1, array().cast(t("credits")))
      .otherwise(array(
        struct(lit("sustained-use").as("name"),
          ((eid % 50).cast("double") * -0.25).as("amount"),
          lit("credits/sustained-use").as("full_name"),
          concat(lit("c1-"), eid).as("id"),
          lit("DISCOUNT").as("type")),
        struct(lit("committed-use").as("name"),
          ((uid % 20).cast("double") * -0.5).as("amount"),
          lit("credits/committed-use").as("full_name"),
          concat(lit("c2-"), eid).as("id"),
          lit("COMMITMENT").as("type"))))

    def anc(rn: Column, dn: Column): Column =
      struct(rn.as("resource_name"), dn.as("display_name"))
    val orgAnc = anc(lit("organizations/42"), lit("Acme Holdings"))
    val folderAnc = anc(concat(lit("folders/"), (uid % 5).cast("string")),
      concat(lit("Folder "), (uid % 5).cast("string")))
    val ancestors = when(uid % 5 === 0,
        array(orgAnc, folderAnc, anc(lit("projects/root"), lit("Root Project"))))
      .otherwise(array(orgAnc, folderAnc))

    val built = ev.select(
      concat(lit("BA-"), (uid % 10).cast("string")).as("billing_account_id"),
      struct(col("event_type").as("id"), upper(col("event_type")).as("description"))
        .as("service"),
      struct(concat(lit("SKU-"), (eid % 100).cast("string")).as("id"),
        concat(lit("sku "), (eid % 100).cast("string")).as("description")).as("sku"),
      col("ts").as("usage_start_time"),
      (col("ts") + expr("INTERVAL 1 HOUR")).as("usage_end_time"),
      struct(
        concat(lit("proj_"), (uid % 5).cast("string")).as("id"),
        (uid % 5).cast("string").as("number"),
        concat(lit("Project "), (uid % 5).cast("string")).as("name"),
        array(kv(lit("owner"), concat(lit("u"), (uid % 11).cast("string")))).as("labels"),
        concat(lit("42/"), (uid % 5).cast("string")).as("ancestry_numbers"),
        ancestors.as("ancestors")).as("project"),
      labels.as("labels"),
      array(kv(lit("cores"), (uid % 64).cast("string"))).as("system_labels"),
      struct(lit("r1").as("location"), lit("XX").as("country"),
        lit("r1").as("region"), lit("r1-a").as("zone")).as("location"),
      when(uid % 7 === 0, array(struct(lit("cost-center").as("key"),
          (uid % 4).cast("string").as("value"), (uid % 2 === 0).as("inherited"),
          lit("ns1").as("namespace"))))
        .otherwise(array().cast(t("tags"))).as("tags"),
      lit("REGULAR").as("transaction_type"),
      lit("Example Seller").as("seller_name"),
      col("ts").as("export_time"),
      col("value").as("cost"),
      lit("USD").as("currency"),
      lit(1.0).as("currency_conversion_rate"),
      struct((col("value") * 3600.0).as("amount"), lit("seconds").as("unit"),
        col("value").as("amount_in_pricing_units"), lit("hours").as("pricing_unit"))
        .as("usage"),
      credits.as("credits"),
      struct(date_format(col("ts"), "yyyyMM").as("month"),
        lit("self").as("publisher_type")).as("invoice"),
      lit("regular").as("cost_type"),
      when(eid % 4 === 0,
          struct(concat(lit("adj-"), eid.cast("string")).as("id"),
            lit("correction").as("description"), lit("MANUAL").as("mode"),
            lit("ADJUSTMENT").as("type")))
        .otherwise(lit(null).cast(t("adjustment_info"))).as("adjustment_info"),
      (col("value") * 1.25).as("cost_at_list"))
    // normalize to the exact destination schema (field order and types)
    built.select(sch.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** The JSON load boundary: each row serialized to one JSON document and
    * parsed back against the destination schema — the reference's
    * per-row `serialize_row` + `load_table_from_json` coercion
    * (billing_etl.py:315-346) as a codegen'd expression pair. Null fields
    * are OMITTED from the JSON (the json-generator default), so a null
    * array/struct comes back null while an empty array round-trips as
    * `[]` — the exact BigQuery JSON-load semantics the nested-fidelity
    * hard part is about.
    */
  private[graft] def jsonBoundary(df: DataFrame): DataFrame = {
    val sch = df.schema
    df.select(to_json(struct(df.columns.map(col).toSeq: _*), JsonOpts).as("row_json"))
      .select(from_json(col("row_json"), sch, JsonOpts).as("r"))
      .select(sch.fieldNames.map(n => col(s"r.`$n`")).toSeq: _*)
  }

  // The dest fixture is deterministic per (session, sfDir) — build it once
  // per JVM (values are PATHS only, so the weak session key stays
  // collectable; see SessionMemo for the invariants).
  private val destMemo = new graft.util.SessionMemo[String, String]

  private def nestedDest(spark: SparkSession, dir: String): String =
    destMemo.getOrElseUpdate(spark, dir)(buildNestedDest(spark, dir))

  private def buildNestedDest(spark: SparkSession, dir: String): String = {
    implicit val s: SparkSession = spark
    val tmp = graft.util.TempDirs.create("graft_nested_")
    val meta = MetaStore(s"$tmp/meta")
    meta.putConfigs(Seq(ClientBillingConfig(21, "proj_21", "ds", "t", None, None, None)))
    val r = EtlJob.run(spark, meta, billingRows(spark, dir), "export_time",
      s"$tmp/dest", EtlJobMessage(21), utcTs(JobEnd), sleeper = _ => (),
      transform = jsonBoundary)
    require(r.isRight, s"nested billing run failed: $r")
    s"$tmp/dest"
  }

  /** Per-service rollup computed FROM THE ARRAYS read back out of the
    * destination: credit cents via the `aggregate` HOF over the credits
    * array, prod-env rows via a `map_from_entries` label lookup, ancestor
    * depth via `size`, the null-vs-empty credit counts, and the max
    * usage-start timestamp at micro precision (proof the JSON boundary
    * did not truncate). The DuckDB oracle recomputes all of it from
    * `events` + the fixture's arithmetic — a hash match means every
    * array-of-struct value survived parquet → JSON → parquet intact.
    */
  private def etlNestedCredits(spark: SparkSession, dir: String): DataFrame =
    nestedRollup(EtlJob.readDestination(spark, nestedDest(spark, dir)))

  /** The shared rollup over a destination's nested rows — see
    * [[etlNestedCredits]]'s doc for what each column proves.
    */
  private def nestedRollup(rows: DataFrame): DataFrame =
    rows.select(
        col("service.id").as("service_id"),
        col("cost"), col("credits"), col("labels"),
        col("project.ancestors").as("anc"),
        col("adjustment_info"), col("usage_start_time"))
      .withColumn("credit_cents", coalesce(
        aggregate(col("credits"), lit(0L),
          (acc, c) => acc + round(c.getField("amount") * 100).cast("long")),
        lit(0L)))
      .groupBy(col("service_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("credits").isNull, 1L).otherwise(0L)).as("n_null_credits"),
        sum(when(col("credits").isNotNull && size(col("credits")) === 0, 1L)
          .otherwise(0L)).as("n_empty_credits"),
        sum(col("credit_cents")).as("credit_cents"),
        sum(when(map_from_entries(col("labels")).getItem("env") === "prod", 1L)
          .otherwise(0L)).as("n_prod_env"),
        sum(size(col("anc")).cast("long")).as("n_ancestors"),
        sum(when(col("adjustment_info").isNotNull, 1L).otherwise(0L)).as("n_adjusted"),
        sum(round(col("cost") * 100).cast("long")).as("cost_cents"),
        date_format(max(col("usage_start_time")), TsFmt).as("max_usage_start"))
      .orderBy(col("service_id"))

  /** The nested path as a STREAM: the billing landing zone consumed by the
    * streaming file source with the full 26-field nested schema (arrays of
    * structs through `readStream`), the JSON boundary applied per
    * micro-batch, drained through the parquet file sink, and the rollup
    * computed from the sink's read-back. Same oracle as the batch twin —
    * a hash match proves the nested values survive the STREAMING ingest
    * edge byte-identically too.
    */
  private def streamNestedCredits(spark: SparkSession, dir: String): DataFrame = {
    val stream = spark.readStream
      .schema(BillingExportSchema.schema)
      .parquet(nestedLanding(spark, dir))
      .where(col("export_time") < lit(utcTs(JobEnd)))
    nestedRollup(graft.streaming.StreamingIngest.runToParquet(jsonBoundary(stream)))
  }

  /** Batch-written landing zone of raw [[billingRows]] (the upstream
    * producer's drop dir), memoized per (session, sfDir) like the dest.
    */
  private def nestedLanding(spark: SparkSession, dir: String): String =
    destMemo.getOrElseUpdate(spark, s"landing:$dir") {
      val stage = graft.util.TempDirs.create("graft_nested_landing_")
      // a real landing zone is many drops, not one: the source scan is a
      // single split at this SF, and without the repartition the stream's
      // map phase (the per-row JSON boundary) would run on ONE task
      billingRows(spark, dir).repartition(16).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(stage)
      stage
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_nested_credits" -> (etlNestedCredits _),
    "stream_nested_credits" -> (streamNestedCredits _)
  )

  // mirrors the fixture arithmetic exactly: quarters/halves make every
  // credit an exact binary fraction, so round() is engine-independent
  private val nestedCreditsSql: String =
    s"""SELECT event_type AS service_id,
         |  count(*) AS n_rows,
         |  CAST(sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_credits,
         |  CAST(sum(CASE WHEN event_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_credits,
         |  CAST(sum(CASE WHEN event_id % 3 = 2 THEN
         |      CAST(round((event_id % 50) * -0.25 * 100) AS BIGINT)
         |      + CAST(round((user_id % 20) * -0.5 * 100) AS BIGINT)
         |    ELSE 0 END) AS BIGINT) AS credit_cents,
         |  CAST(sum(CASE WHEN event_id % 3 = 2 AND user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_prod_env,
         |  CAST(sum(2 + CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ancestors,
         |  CAST(sum(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_adjusted,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cost_cents,
         |  strftime(max(ts), '$DuckTsFmt') AS max_usage_start
         |FROM events WHERE ts < TIMESTAMP '$JobEnd'
         |GROUP BY 1 ORDER BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "etl_nested_credits" -> nestedCreditsSql,
    // the streaming twin lands in the same relation — same oracle
    "stream_nested_credits" -> nestedCreditsSql
  )
}
