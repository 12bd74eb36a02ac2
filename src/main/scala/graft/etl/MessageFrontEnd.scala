package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Pub/Sub-push message front-end, S11 + U2 + F6 + C1–C3
  * (reference: main.py:15-38, core/models/billing_etl_model.py:19-28).
  *
  * Content-type gate → raw HTTP body → JSON envelope → `message.data` →
  * base64 → UTF-8 → JSON → validated `{org_id: int}`. Every failure mode
  * maps to the reference's error taxonomy (CustomException status codes at
  * main.py:15-38):
  *
  *   - content-type ≠ application/json → 415 (main.py:15-16, checked
  *     before anything is parsed)
  *   - unparseable envelope JSON  → 500 (uncaught json.loads → "Internal Server Error")
  *   - Python TypeError paths     → 500 TYPE_ERROR, mirrored shape by shape:
  *     a string body whose text contains "message" (substring `in` passes,
  *     then `envelope["message"]` raises at main.py:24 — OUTSIDE any try);
  *     a list body with a "message" element (same); a `message` FIELD that
  *     is null / a number / a bool (`"data" in message` itself raises,
  *     main.py:25); and a valid non-object inner payload (`Model(**payload)`
  *     on a non-dict, including JSON `null`, raises)
  *   - no `message` field         → 400 MISSING_MESSAGE
  *   - `message` string/list without "data" → 400 MISSING_DATA (`in` is
  *     false, main.py:25-26), as is a proper object with no `data` key
  *   - data present but null, bad base64, or bad inner JSON → 400 BAD_DATA
  *     (everything the try at main.py:28-34 catches — including the
  *     `message["data"]` TypeError when `message` is a string containing
  *     "data" or a list with a "data" element: `in` passes at main.py:25,
  *     the index then raises inside the try and converts to 400)
  *   - payload fails validation   → 400 VALIDATION (pydantic: org_id missing
  *     or not int-coercible; note "123" DOES coerce, matching pydantic)
  *   - valid                      → 200, decoded org_id
  *
  * Non-object `message` fields are routed by their true JSON type via a
  * VARIANT probe (`schema_of_variant(try_variant_get(try_parse_json(...)))`)
  * rather than sniffing the re-serialized text — `get_json_object` strips
  * quotes, so `{"message": "123"}` (a STRING, whose substring test runs) and
  * `{"message": 123}` (a number, whose `in` raises) are indistinguishable
  * after extraction, and a string that merely LOOKS like an array must
  * still take Python's substring semantics. The probe is guarded behind the
  * non-object-message predicate, so the extra JSON parse never runs on the
  * valid-message hot path.
  *
  * Documented divergence (duplicate JSON keys): an envelope with two
  * `message` keys (`{"message": {}, "message": "x"}`) routes to 500
  * TYPE_ERROR here — Spark's variant builder rejects duplicate keys, so the
  * probe returns NULL and the chain takes the scalar-`message` branch —
  * while CPython's `json.loads` keeps the LAST value and could answer 400
  * when that value is a string/list without "data". RFC 8259 leaves
  * duplicate-key semantics undefined and no reference fixture exercises
  * them; we accept the 500 rather than re-deriving last-wins from a
  * second text-sniffing pass.
  *
  * All columnar — the decode chain is `from_json`/`json_object_keys`/
  * `try_to_binary`/`try_cast` built-ins inside whole-stage codegen, so a
  * backlog of millions of queued messages decodes as one narrow scan, no
  * UDFs, no driver loop. The hot (valid-message) path parses each JSON text
  * exactly once — envelope key-probe + envelope struct, then one inner
  * `from_json` with a corrupt-record column; `get_json_object` re-probes sit
  * only on rare quarantine branches of lazily-evaluated `when` chains.
  */
object MessageFrontEnd {

  /** Pub/Sub push envelope shape (reference: main.py:18-31). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("message", StructType(Seq(
      StructField("data", StringType),
      StructField("messageId", StringType),
      StructField("publishTime", StringType)))),
    StructField("subscription", StringType)))

  /** Inner-payload schema: org_id captured as raw text (so pydantic's
    * int-coercion is explicit downstream), plus a corrupt-record column —
    * null exactly when the payload is a JSON object.
    */
  private val innerSchema: StructType = StructType(Seq(
    StructField("org_id", StringType),
    StructField("__graft_corrupt", StringType)))

  val StatusOk = 200
  val StatusBadRequest = 400
  val StatusUnsupportedMedia = 415
  val StatusServerError = 500

  /** Decode + validate a DataFrame of raw push bodies.
    *
    * @param raw            input with a string column of HTTP bodies
    * @param rawCol         name of that column
    * @param contentTypeCol optional column carrying the request's
    *                       Content-Type header; when set, any value other
    *                       than exactly "application/json" (including null —
    *                       absent header) short-circuits to 415 before any
    *                       parsing, as the reference does at main.py:15-16
    * @return input columns plus `org_id` (int, null unless valid),
    *         `status_code` (int), `error_class` (string, null when 200)
    */
  def decode(raw: DataFrame, rawCol: String = "raw",
             contentTypeCol: Option[String] = None): DataFrame = {
    val body = col(rawCol)
    // JSON-whitespace-aware head probe: Spark's bare ltrim strips only
    // spaces, while json.loads (and the probes below) accept \t \n \r too —
    // a tab-indented body must not fall through to ENVELOPE_PARSE.
    def jsonHead(c: Column): Column = substring(ltrim(c, " \t\n\r"), 1, 1)
    val head: Column = jsonHead(body)
    // Non-null iff the body is a valid JSON OBJECT — one probe answering
    // both "did json.loads succeed" and "which keys exist" (the Python
    // `"message" not in envelope` test, main.py:21).
    val keys: Column = json_object_keys(body)
    val env: Column = from_json(body, envelopeSchema)
    // Derived helpers reference the NAMED columns, never the builder vals:
    // re-deriving (env.getField...) would copy the whole from_json tree
    // into every use site, and the optimizer then compiles each copy —
    // measured 4x wall-clock on the decode stage before this was fixed.
    val msgStruct: Column = col("__mfe_env").getField("message")
    val data: Column = col("__mfe_msg").getField("data")
    // Raw text of the message field: objects/arrays serialize, strings
    // decode (escapes resolved — matching what Python's json.loads hands
    // to the `in` operator), null/absent → NULL. Rare-path only.
    val msgText: Column = get_json_object(body, "$.message")

    // C1/C2 — lenient-to-null base64 decode, then utf-8 string.
    val inner: Column = expr(s"try_to_binary(__mfe_data, 'base64')").cast(StringType)
    // C3 — ONE parse of the inner payload: org_id raw text + corrupt-record
    // (null ⟺ payload is a JSON object).
    val innerParsed: Column = from_json(col("__mfe_inner"), innerSchema,
      Map("columnNameOfCorruptRecord" -> "__graft_corrupt"))
    val orgId: Column = expr("try_cast(__mfe_org_raw AS INT)")

    val msgTextCol = col("__mfe_msg_text")

    // Python's `"message" in <non-dict envelope>`: strings match by
    // substring of the DECODED text, lists by element equality — both then
    // raise TypeError at `envelope["message"]`; scalar roots raise at `in`
    // itself and share the generic 500 with unparseable JSON.
    val decodedRoot: Column = get_json_object(body, "$")
    val rootArr: Column = from_json(body, ArrayType(StringType))
    val msgArr: Column = from_json(msgTextCol, ArrayType(StringType))
    // True JSON type of the `message` field (STRING / BIGINT / BOOLEAN /
    // VOID / ARRAY<…>), computed ONLY for non-object-message rows: the
    // when-guard keeps the extra parse off the valid-message hot path
    // (CaseWhen branches evaluate lazily inside codegen).
    val msgVType: Column = when(
      col("__mfe_obj_root") && array_contains(col("__mfe_keys"), "message")
        && col("__mfe_msg").isNull,
      schema_of_variant(try_variant_get(try_parse_json(body), "$.message", "variant")))

    val classified =
      when(!col("__mfe_obj_root"),
        when(head === "\"" && decodedRoot.isNotNull,
          when(decodedRoot.contains("message"), lit("TYPE_ERROR"))
            .otherwise(lit("MISSING_MESSAGE")))
          .when(head === "[" && rootArr.isNotNull,
            when(array_contains(rootArr, "message"), lit("TYPE_ERROR"))
              .otherwise(lit("MISSING_MESSAGE")))
          .otherwise(lit("ENVELOPE_PARSE")))
        .when(!array_contains(col("__mfe_keys"), "message"), lit("MISSING_MESSAGE"))
        .when(col("__mfe_msg").isNotNull,
          // proper object message → the data / base64 / payload route
          when(col("__mfe_data").isNotNull,
            when(col("__mfe_inner").isNull, lit("BAD_DATA"))
              .when(col("__mfe_inner_corrupt").isNotNull,
                // corrupt ⇒ not an object: invalid JSON → BAD_DATA
                // (b64decode/json.loads raise, main.py:29-34); any valid
                // non-object incl. `null` → Model(**payload) TypeError
                when(get_json_object(col("__mfe_inner"), "$").isNull, lit("BAD_DATA"))
                  .otherwise(lit("TYPE_ERROR")))
              .when(col("__mfe_org_raw").isNull || col("__mfe_org_id").isNull,
                lit("VALIDATION"))
              .otherwise(lit(null).cast(StringType)))
            // data key present but null → b64decode(None) raises → BAD_DATA;
            // key absent → MISSING_DATA
            .otherwise(
              when(array_contains(json_object_keys(msgTextCol), "data"), lit("BAD_DATA"))
                .otherwise(lit("MISSING_DATA"))))
        // message key present but NOT an object: Python `"data" in message`
        // (main.py:25, outside any try). When the membership test itself
        // raises (null/number/bool) → 500; when it PASSES on a string/list,
        // the subsequent `message["data"]` index raises INSIDE the try at
        // main.py:28-34, which converts every exception to 400 → BAD_DATA.
        // Routed by the VARIANT-typed probe: a string is a substring test on
        // the DECODED text, a list is element equality — regardless of what
        // the string happens to spell ("123", "true", "[…] data").
        .otherwise(
          when(col("__mfe_msg_vtype") === "VOID", lit("TYPE_ERROR")) // `in None` raises
            .when(col("__mfe_msg_vtype").startsWith("ARRAY"),
              when(msgArr.isNotNull && array_contains(msgArr, "data"), lit("BAD_DATA"))
                .otherwise(lit("MISSING_DATA")))
            .when(col("__mfe_msg_vtype") === "STRING",
              when(msgTextCol.contains("data"), lit("BAD_DATA"))
                .otherwise(lit("MISSING_DATA")))
            // number/bool: `in` itself raises. Also catches a NULL probe
            // (duplicate `message` keys — see the header divergence note).
            .otherwise(lit("TYPE_ERROR")))

    val withCt = contentTypeCol match {
      case Some(ct) =>
        when(col(ct).isNull || col(ct) =!= "application/json", lit("CONTENT_TYPE"))
          .otherwise(classified)
      case None => classified
    }

    raw
      .withColumn("__mfe_keys", keys)
      .withColumn("__mfe_obj_root", col("__mfe_keys").isNotNull)
      .withColumn("__mfe_env", env)
      .withColumn("__mfe_msg", msgStruct)
      .withColumn("__mfe_msg_text", msgText)
      .withColumn("__mfe_msg_vtype", msgVType)
      .withColumn("__mfe_data", data)
      .withColumn("__mfe_inner", inner)
      .withColumn("__mfe_inner_parsed", innerParsed)
      .withColumn("__mfe_inner_corrupt", col("__mfe_inner_parsed").getField("__graft_corrupt"))
      .withColumn("__mfe_org_raw", col("__mfe_inner_parsed").getField("org_id"))
      .withColumn("__mfe_org_id", orgId)
      .withColumn("error_class", withCt)
      .withColumn("status_code",
        when(col("error_class").isNull, lit(StatusOk))
          .when(col("error_class") === "CONTENT_TYPE", lit(StatusUnsupportedMedia))
          .when(col("error_class").isin("ENVELOPE_PARSE", "TYPE_ERROR"), lit(StatusServerError))
          .otherwise(lit(StatusBadRequest)))
      .withColumn("org_id",
        when(col("error_class").isNull, col("__mfe_org_id")).otherwise(lit(null).cast(IntegerType)))
      .drop("__mfe_keys", "__mfe_obj_root", "__mfe_env", "__mfe_msg", "__mfe_msg_text",
        "__mfe_msg_vtype", "__mfe_data", "__mfe_inner", "__mfe_inner_parsed",
        "__mfe_inner_corrupt", "__mfe_org_raw", "__mfe_org_id")
  }

  /** The accepted stream: messages that passed validation, typed. */
  def accepted(decoded: DataFrame): DataFrame =
    decoded.where(col("status_code") === StatusOk).select(col("org_id"))

  /** The quarantine stream: rejected messages + why (U2 error channel). */
  def quarantined(decoded: DataFrame): DataFrame =
    decoded.where(col("status_code") =!= StatusOk)
      .select(col("status_code"), col("error_class"))
}
