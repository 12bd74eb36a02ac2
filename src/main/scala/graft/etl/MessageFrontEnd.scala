package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Pub/Sub-push message front-end, S11 + U2 + F6 + C1–C3
  * (reference: main.py:18-38, core/models/billing_etl_model.py:19-28).
  *
  * Raw HTTP body → JSON envelope → `message.data` → base64 → UTF-8 → JSON →
  * validated `{org_id: int}`. Every failure mode maps to the reference's
  * error taxonomy (CustomException status codes at main.py:16-38):
  *
  *   - unparseable envelope JSON  → 500 (uncaught json.loads → "Internal Server Error")
  *   - Python TypeError paths     → 500 TYPE_ERROR: a string body whose text
  *     contains "message" (substring `in` passes, then `envelope["message"]`
  *     raises), a list body with a "message" element (same), and a valid
  *     non-object inner payload (`Model(**payload)` on a non-dict raises)
  *   - no `message` field         → 400 MISSING_MESSAGE
  *   - no `data` field            → 400 MISSING_DATA
  *   - bad base64 / inner JSON    → 400 BAD_DATA
  *   - payload fails validation   → 400 VALIDATION (pydantic: org_id missing
  *     or not int-coercible; note "123" DOES coerce, matching pydantic)
  *   - valid                      → 200, decoded org_id
  *
  * Remaining known divergence from CPython-exact semantics (accepted,
  * normalized to the nearest class): null-valued or non-object `message`
  * FIELDS inside an object envelope (e.g. `{"message": null}`,
  * `{"message": "x data y"}`) report MISSING_MESSAGE/MISSING_DATA 400
  * where the reference's `in`/indexing chain raises (500).
  *
  * All columnar — the decode chain is `from_json`/`try_to_binary`/`try_cast`
  * built-ins inside whole-stage codegen, so a backlog of millions of queued
  * messages decodes as one narrow scan, no UDFs, no driver loop.
  */
object MessageFrontEnd {

  /** Pub/Sub push envelope shape (reference: main.py:18-31). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("message", StructType(Seq(
      StructField("data", StringType),
      StructField("messageId", StringType),
      StructField("publishTime", StringType)))),
    StructField("subscription", StringType)))

  val StatusOk = 200
  val StatusBadRequest = 400
  val StatusServerError = 500

  /** Decode + validate a DataFrame of raw push bodies.
    *
    * @param raw    input with a string column of HTTP bodies
    * @param rawCol name of that column
    * @return input columns plus `org_id` (int, null unless valid),
    *         `status_code` (int), `error_class` (string, null when 200)
    */
  def decode(raw: DataFrame, rawCol: String = "raw"): DataFrame = {
    val env: Column = from_json(col(rawCol), envelopeSchema)
    val data: Column = env.getField("message").getField("data")
    // C1/C2 — lenient-to-null base64 decode, then utf-8 string.
    val inner: Column = expr(s"try_to_binary(__mfe_data, 'base64')").cast(StringType)
    // C3 — `$` probe validates inner JSON; org_id extracted as raw text so
    // int-coercion (pydantic parity: "123" → 123, "abc" → fail) is explicit.
    val innerValid: Column = get_json_object(col("__mfe_inner"), "$").isNotNull
    val orgRaw: Column = get_json_object(col("__mfe_inner"), "$.org_id")
    val orgId: Column = expr("try_cast(__mfe_org_raw AS INT)")

    // PERMISSIVE from_json yields a struct of nulls (not a null root) on
    // malformed input, so envelope-JSON validity needs its own probe.
    // Non-object bodies split by the reference's Python semantics at
    // `"message" not in envelope` (main.py:21): dicts/lists/strings support
    // `in` → falls through to 400 "message field missing"; scalars
    // (123/true/null) raise TypeError → generic 500 handler. First
    // character of the trimmed body distinguishes the container kinds.
    val head: Column = substring(ltrim(col(rawCol)), 1, 1)
    val rawValid: Column = get_json_object(col(rawCol), "$").isNotNull &&
      (head === "{" || head === "[" || head === "\"")

    // Python TypeError routes (→ 500): `"message" in envelope` passes for a
    // string body by SUBSTRING and for a list body by element equality, and
    // the subsequent `envelope["message"]` then raises; a valid non-object
    // inner payload raises at `Model(**payload)`.
    val strMsg: Column = head === "\"" && col(rawCol).contains("message")
    val listMsg: Column = head === "[" &&
      array_contains(from_json(col(rawCol), ArrayType(StringType)), "message")
    val innerHead: Column = substring(ltrim(col("__mfe_inner")), 1, 1)

    raw
      .withColumn("__mfe_raw_valid", rawValid)
      .withColumn("__mfe_env", env)
      .withColumn("__mfe_data", data)
      .withColumn("__mfe_inner", inner)
      .withColumn("__mfe_inner_valid", innerValid)
      .withColumn("__mfe_org_raw", orgRaw)
      .withColumn("__mfe_org_id", orgId)
      .withColumn("error_class",
        when(!col("__mfe_raw_valid") || col("__mfe_env").isNull, lit("ENVELOPE_PARSE"))
          .when(strMsg || listMsg, lit("TYPE_ERROR"))
          .when(col("__mfe_env.message").isNull, lit("MISSING_MESSAGE"))
          .when(col("__mfe_data").isNull, lit("MISSING_DATA"))
          .when(col("__mfe_inner").isNull || !col("__mfe_inner_valid"), lit("BAD_DATA"))
          .when(innerHead =!= "{", lit("TYPE_ERROR"))
          .when(col("__mfe_org_raw").isNull || col("__mfe_org_id").isNull, lit("VALIDATION"))
          .otherwise(lit(null).cast(StringType)))
      .withColumn("status_code",
        when(col("error_class").isNull, lit(StatusOk))
          .when(col("error_class").isin("ENVELOPE_PARSE", "TYPE_ERROR"), lit(StatusServerError))
          .otherwise(lit(StatusBadRequest)))
      .withColumn("org_id",
        when(col("error_class").isNull, col("__mfe_org_id")).otherwise(lit(null).cast(IntegerType)))
      .drop("__mfe_raw_valid", "__mfe_env", "__mfe_data", "__mfe_inner",
        "__mfe_inner_valid", "__mfe_org_raw", "__mfe_org_id")
  }

  /** The accepted stream: messages that passed validation, typed. */
  def accepted(decoded: DataFrame): DataFrame =
    decoded.where(col("status_code") === StatusOk).select(col("org_id"))

  /** The quarantine stream: rejected messages + why (U2 error channel). */
  def quarantined(decoded: DataFrame): DataFrame =
    decoded.where(col("status_code") =!= StatusOk)
      .select(col("status_code"), col("error_class"))
}
