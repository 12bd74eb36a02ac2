package graft.schema

import org.apache.spark.sql.types._

/** The GCP billing standard-export destination schema.
  *
  * Re-expressed from the reference's hard-coded BigQuery `SchemaField` list
  * (reference: pulse_billing_etl_service/core/utility/dataset_utils.py:250-332).
  * Mapping rules: RECORD -> StructType, mode=REPEATED -> ArrayType(StructType),
  * FLOAT -> DoubleType, everything nullable. Label/tag key-value pairs stay
  * array-of-struct (NOT MapType): BigQuery labels permit duplicate keys and
  * are ordered, and a `map_from_entries` view can be layered on when map
  * semantics are wanted.
  */
object BillingExportSchema {

  private def kv: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType)))

  val schema: StructType = StructType(Seq(
    StructField("billing_account_id", StringType),
    StructField("service", StructType(Seq(
      StructField("id", StringType),
      StructField("description", StringType)))),
    StructField("sku", StructType(Seq(
      StructField("id", StringType),
      StructField("description", StringType)))),
    StructField("usage_start_time", TimestampType),
    StructField("usage_end_time", TimestampType),
    StructField("project", StructType(Seq(
      StructField("id", StringType),
      StructField("number", StringType),
      StructField("name", StringType),
      StructField("labels", ArrayType(kv)),
      StructField("ancestry_numbers", StringType),
      StructField("ancestors", ArrayType(StructType(Seq(
        StructField("resource_name", StringType),
        StructField("display_name", StringType)))))))),
    StructField("labels", ArrayType(kv)),
    StructField("system_labels", ArrayType(kv)),
    StructField("location", StructType(Seq(
      StructField("location", StringType),
      StructField("country", StringType),
      StructField("region", StringType),
      StructField("zone", StringType)))),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", StringType),
      StructField("inherited", BooleanType),
      StructField("namespace", StringType))))),
    StructField("transaction_type", StringType),
    StructField("seller_name", StringType),
    // Watermark column of the incremental extraction
    // (reference: core/services/billing_etl.py:167, :280-281).
    StructField("export_time", TimestampType),
    StructField("cost", DoubleType),
    StructField("currency", StringType),
    StructField("currency_conversion_rate", DoubleType),
    StructField("usage", StructType(Seq(
      StructField("amount", DoubleType),
      StructField("unit", StringType),
      StructField("amount_in_pricing_units", DoubleType),
      StructField("pricing_unit", StringType)))),
    StructField("credits", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("amount", DoubleType),
      StructField("full_name", StringType),
      StructField("id", StringType),
      StructField("type", StringType))))),
    StructField("invoice", StructType(Seq(
      StructField("month", StringType),
      StructField("publisher_type", StringType)))),
    StructField("cost_type", StringType),
    StructField("adjustment_info", StructType(Seq(
      StructField("id", StringType),
      StructField("description", StringType),
      StructField("mode", StringType),
      StructField("type", StringType)))),
    StructField("cost_at_list", DoubleType)))
}
