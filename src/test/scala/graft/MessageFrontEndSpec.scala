package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MessageFrontEnd

/** U2/S11: the reference's HTTP error taxonomy (main.py:15-52), row by row. */
class MessageFrontEndSpec extends AnyFunSuite {
  import SparkTestBase._

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def classify(raw: String): (Option[Int], Int, Option[String]) = {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import sp.implicits._
    val row = MessageFrontEnd.decode(Seq(raw).toDF("raw"))
      .select("org_id", "status_code", "error_class").collect().head
    (Option(row.get(0)).map(_.asInstanceOf[Int]), row.getInt(1),
      Option(row.get(2)).map(_.toString))
  }

  test("valid envelope decodes org_id with 200") {
    val raw = s"""{"message": {"data": "${b64("""{"org_id": 42}""")}"}}"""
    assert(classify(raw) == ((Some(42), 200, None)))
  }

  test("pydantic parity: numeric-string org_id coerces") {
    val raw = s"""{"message": {"data": "${b64("""{"org_id": "42"}""")}"}}"""
    assert(classify(raw) == ((Some(42), 200, None)))
  }

  test("unparseable envelope is the 500 path") {
    assert(classify("definitely not json") == ((None, 500, Some("ENVELOPE_PARSE"))))
  }

  test("missing message field → 400") {
    assert(classify("""{"nope": 1}""") == ((None, 400, Some("MISSING_MESSAGE"))))
  }

  test("missing data field → 400") {
    assert(classify("""{"message": {"messageId": "x"}}""") ==
      ((None, 400, Some("MISSING_DATA"))))
  }

  test("non-JSON payload inside valid base64 → 400 BAD_DATA") {
    val raw = s"""{"message": {"data": "${b64("plain text")}"}}"""
    assert(classify(raw) == ((None, 400, Some("BAD_DATA"))))
  }

  test("payload without org_id → 400 VALIDATION") {
    val raw = s"""{"message": {"data": "${b64("""{"other": 1}""")}"}}"""
    assert(classify(raw) == ((None, 400, Some("VALIDATION"))))
  }

  test("non-coercible org_id → 400 VALIDATION") {
    val raw = s"""{"message": {"data": "${b64("""{"org_id": "abc"}""")}"}}"""
    assert(classify(raw) == ((None, 400, Some("VALIDATION"))))
  }

  test("string body containing 'message' → Python TypeError parity (500)") {
    assert(classify("\"a message in a string\"") == ((None, 500, Some("TYPE_ERROR"))))
  }

  test("string body without 'message' → 400 MISSING_MESSAGE") {
    assert(classify("\"just a string\"") == ((None, 400, Some("MISSING_MESSAGE"))))
  }

  test("list body with a 'message' element → 500 TYPE_ERROR") {
    assert(classify("""["message"]""") == ((None, 500, Some("TYPE_ERROR"))))
  }

  test("list body without 'message' → 400 MISSING_MESSAGE") {
    assert(classify("[1, 2]") == ((None, 400, Some("MISSING_MESSAGE"))))
  }

  test("valid non-object inner payload → 500 TYPE_ERROR (Model(**payload) raises)") {
    for (payload <- Seq("[1]", "\"5\"", "5", "null")) {
      val raw = s"""{"message": {"data": "${b64(payload)}"}}"""
      assert(classify(raw) == ((None, 500, Some("TYPE_ERROR"))), s"payload=$payload")
    }
  }

  test("leading JSON whitespace (tab/newline) does not derail classification") {
    // json.loads accepts \t \n \r; a space-only ltrim would misroute these
    // to ENVELOPE_PARSE 500
    assert(classify("\t[1, 2]") == ((None, 400, Some("MISSING_MESSAGE"))))
    assert(classify("\n\"the message is inside\"") == ((None, 500, Some("TYPE_ERROR"))))
    val valid = s"""\r\n{"message": {"data": "${b64("""{"org_id": 42}""")}"}}"""
    assert(classify(valid) == ((Some(42), 200, None)))
  }

  test("string body matches 'message' on DECODED text (escapes resolved)") {
    // raw text contains no literal 'message', the decoded string does
    assert(classify("\"\\u006dessage here\"") == ((None, 500, Some("TYPE_ERROR"))))
  }

  test("non-object message fields follow Python's `in`-then-index semantics") {
    // null/number/bool: `"data" in message` raises immediately → 500
    for (m <- Seq("null", "123", "true")) {
      assert(classify(s"""{"message": $m}""") == ((None, 500, Some("TYPE_ERROR"))), s"message=$m")
    }
    // string/list: when `in` passes ("data" present), message["data"] raises
    // INSIDE the try at main.py:28-34 → 400 BAD_DATA; when `in` is false →
    // 400 MISSING_DATA (main.py:25-26)
    assert(classify("""{"message": "x data y"}""") == ((None, 400, Some("BAD_DATA"))))
    assert(classify("""{"message": "hello"}""") == ((None, 400, Some("MISSING_DATA"))))
    assert(classify("""{"message": ["data"]}""") == ((None, 400, Some("BAD_DATA"))))
    assert(classify("""{"message": [1]}""") == ((None, 400, Some("MISSING_DATA"))))
  }

  test("non-object message routing follows the true JSON type, not its spelling") {
    // a STRING spelling a scalar takes Python's substring route, not the
    // scalar's TypeError — the variant probe sees STRING, not BIGINT/BOOLEAN
    assert(classify("""{"message": "123"}""") == ((None, 400, Some("MISSING_DATA"))))
    assert(classify("""{"message": "true"}""") == ((None, 400, Some("MISSING_DATA"))))
    // a STRING that looks like an array is still a substring test on the
    // decoded text ('["x"] data' contains "data")
    assert(classify("""{"message": "[\"x\"] data"}""") == ((None, 400, Some("BAD_DATA"))))
    assert(classify("""{"message": "[\"x\"]"}""") == ((None, 400, Some("MISSING_DATA"))))
  }

  test("data key present but null → BAD_DATA (b64decode(None) raises)") {
    assert(classify("""{"message": {"data": null}}""") == ((None, 400, Some("BAD_DATA"))))
  }

  test("content-type gate: anything but application/json → 415 before parsing") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import sp.implicits._
    val valid = s"""{"message": {"data": "${b64("""{"org_id": 42}""")}"}}"""
    val decoded = MessageFrontEnd.decode(
      Seq((valid, "application/json"), (valid, "text/plain"), (valid, null: String),
        ("garbage", "application/json"))
        .toDF("raw", "content_type"),
      contentTypeCol = Some("content_type"))
      .select("status_code", "error_class").collect()
      .map(r => (r.getInt(0), Option(r.get(1)).map(_.toString)))
    assert(decoded(0) == ((200, None)))
    assert(decoded(1) == ((415, Some("CONTENT_TYPE"))))
    assert(decoded(2) == ((415, Some("CONTENT_TYPE"))))
    assert(decoded(3) == ((500, Some("ENVELOPE_PARSE"))), "415 gate must not shadow other classes")
  }
}
