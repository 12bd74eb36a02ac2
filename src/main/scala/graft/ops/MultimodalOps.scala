package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

/** Multimodal queries: a deterministic media fixture (document text bytes
  * as the opaque payload, metadata derived from doc fields) exercises the
  * binary-column plumbing end to end. Byte-exact steps (length, md5,
  * frame slicing) are DuckDB-oracle-checked; the stubbed decode/feature
  * path is rows-only here and unit-asserted in MultimodalSpec.
  */
object MultimodalOps {

  private val FrameBytes = 64

  private def mediaFixture(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Metadata + content integrity of the binary column (byte length, md5). */
  private def mmDecodeMeta(s: SparkSession, dir: String): DataFrame =
    mediaFixture(s, dir)
      .select(col("media_id"), col("media_type"), col("width"), col("height"),
        length(col("payload")).as("n_bytes"), md5(col("payload")).as("payload_md5"))
      .orderBy(col("media_id"))

  /** Fixed-size frame sampling of every payload — one row per frame. */
  private def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(mediaFixture(s, dir), "payload", FrameBytes)
      .orderBy(col("media_id"), col("frame_idx"))

  /** The stubbed decode → feature-extract path via typed mapPartitions.
    * Byte stats leave as scaled integers (×10⁴) so the DuckDB oracle —
    * which recomputes them from the same exact integer sums — hash-matches
    * (see Multimodal.extractFeatures on why the math is bit-reproducible).
    */
  private def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    val media = mediaFixture(s, dir).as[MediaRecord]
    Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("n_bytes"),
        round(col("mean_byte") * 10000).cast("long").as("mean_byte_e4"),
        round(col("var_byte") * 10000).cast("long").as("var_byte_e4"),
        size(col("feature")).as("feature_dim"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> (mmDecodeMeta _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_features" -> (mmFeatures _)
  )

  val oracleSql: Map[String, String] = Map(
    "mm_decode_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(n_chars % 640 + 1 AS INTEGER) AS width,
        |  CAST(n_chars % 480 + 1 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_frame_sample" ->
      // document text is ASCII, so varchar slicing matches the engine's
      // byte slicing exactly (duckdb's md5/substring lack BLOB overloads)
      s"""SELECT doc_id AS media_id, CAST(f.i AS INTEGER) AS frame_idx,
         |  md5(substring(text, (f.i * $FrameBytes + 1)::INTEGER, $FrameBytes)) AS frame_md5
         |FROM documents,
         |  LATERAL (SELECT unnest(range(0,
         |    ((octet_length(encode(text)) - 1) // $FrameBytes) + 1)) AS i) f
         |ORDER BY media_id, frame_idx""".stripMargin,
    "mm_features" ->
      // text is ASCII, so ascii() per character reproduces the engine's
      // decoded byte values; mean/var re-derive from the same exact integer
      // sums with the same two IEEE-double ops → identical to the bit
      """WITH codes AS (
        |  SELECT d.doc_id, ascii(substring(d.text, f.i::INTEGER, 1)) AS code
        |  FROM documents d,
        |    LATERAL (SELECT unnest(range(1, octet_length(encode(d.text)) + 1)) AS i) f
        |), stats AS (
        |  SELECT doc_id, count(*) AS n,
        |    CAST(sum(code) AS BIGINT) AS s, CAST(sum(code * code) AS BIGINT) AS sq
        |  FROM codes GROUP BY doc_id
        |)
        |SELECT d.doc_id AS media_id,
        |  CAST(octet_length(encode(d.text)) AS INTEGER) AS n_bytes,
        |  CAST(round(coalesce(s::DOUBLE / n, 0) * 10000) AS BIGINT) AS mean_byte_e4,
        |  CAST(round(coalesce(sq::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n), 0) * 10000) AS BIGINT) AS var_byte_e4,
        |  CAST(16 AS INTEGER) AS feature_dim
        |FROM documents d LEFT JOIN stats ON d.doc_id = stats.doc_id
        |ORDER BY media_id""".stripMargin
  )
}
