package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

/** Multimodal queries over a deterministic media fixture with REAL payloads:
  * image rows are actual PNGs (grayscale rasters from a closed-form pixel
  * formula), audio rows actual RIFF/WAV streams (8-bit PCM from a sample
  * formula), video rows opaque bytes (no JVM-builtin video codec exists —
  * document text stands in). Because the pixel/sample formulas are
  * closed-form, DuckDB reproduces the DECODED statistics without any codec
  * — so the JDK ImageIO/AudioSystem round-trips are themselves
  * oracle-checked: a codec bug breaks the hash match.
  *
  * Formulas (id = doc_id):
  *   image: w = id%16+4, h = id%12+4, pixel(x,y) = (id·31 + x·7 + y·13) % 256
  *   audio: n = id%200+8, sample(i) = (id·17 + i·5) % 256
  *   video: payload = UTF-8 text bytes (ASCII), dims from n_chars
  */
object MultimodalOps {

  private val FrameBytes = 64

  /** The typed media fixture: one MediaRecord per document, modality by
    * doc_id mod 3, payloads generated in partition-parallel map tasks
    * (the ingest edge of the pipeline — the decode edge reads them back).
    */
  private def mediaFixture(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long"), col("text"))
      .as[(Long, Long, String)]
      .map { case (id, nChars, text) =>
        (id % 3) match {
          case 0 =>
            val w = (id % 16 + 4).toInt
            val h = (id % 12 + 4).toInt
            val px = Array.tabulate(w * h) { i =>
              val x = i % w; val y = i / w
              ((id * 31 + x * 7 + y * 13) % 256).toInt
            }
            MediaRecord(id, "image", w, h, Multimodal.encodePng(px, w, h))
          case 1 =>
            val n = (id % 200 + 8).toInt
            val smp = Array.tabulate(n)(i => ((id * 17 + i * 5) % 256).toInt)
            MediaRecord(id, "audio", n, 1, Multimodal.encodeWav(smp))
          case _ =>
            MediaRecord(id, "video", (nChars % 640 + 1).toInt, (nChars % 480 + 1).toInt,
              text.getBytes("UTF-8"))
        }
      }
  }

  /** Decode round-trip + metadata: image/audio payloads are REALLY decoded
    * (ImageIO / AudioSystem) and the recovered shape is emitted; video
    * payloads (opaque) emit a content md5. All three reproduce in DuckDB
    * from the formulas / the text column.
    */
  private def mmDecodeMeta(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    mediaFixture(s, dir).map { m =>
      val check = m.media_type match {
        case "image" =>
          val (w, h, _) = Multimodal.decodeImagePixels(m.payload)
          s"${w}x$h"
        case "audio" =>
          Multimodal.decodeWavSamples(m.payload).length.toString
        case _ =>
          java.security.MessageDigest.getInstance("MD5")
            .digest(m.payload).map("%02x".format(_)).mkString
      }
      (m.media_id, m.media_type, m.width, m.height, check)
    }.toDF("media_id", "media_type", "width", "height", "content_check")
      .orderBy(col("media_id"))
  }

  /** Fixed-size frame sampling — a video operation, over the video rows. */
  private def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        mediaFixture(s, dir).toDF().where(col("media_type") === "video"),
        "payload", FrameBytes)
      .orderBy(col("media_id"), col("frame_idx"))

  /** The decode → feature-extract path via typed mapPartitions: real codec
    * per modality, exact integer stats over the DECODED values (×10⁴ so
    * the DuckDB oracle — recomputing from the same formulas with the same
    * two IEEE-double ops — hash-matches; see Multimodal.extractFeatures).
    */
  private def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.extractFeatures(mediaFixture(s, dir)).toDF()
      .select(col("media_id"), col("n_vals"),
        round(col("mean_val") * 10000).cast("long").as("mean_val_e4"),
        round(col("var_val") * 10000).cast("long").as("var_val_e4"),
        size(col("feature")).as("feature_dim"))
      .orderBy(col("media_id"))
  }

  /** Perceptual image hash (4×4 aHash): the image member of the dedup
    * family — REAL pipeline: decode the actual PNG (ImageIO), box-downscale
    * to 4×4 with rounded-mean integer math ([[Multimodal.resizeImage]]),
    * threshold each cell against the 16-cell total (strict `p·16 > Σp`;
    * ties → 0 — no float mean anywhere), pack 16 bits row-major. Two
    * renderings of the same image (e.g. re-encoded PNGs) hash identically;
    * the DuckDB oracle re-derives every bit from the closed-form pixel
    * formula, so the hash check covers decode + resize + threshold
    * end-to-end. 4×4, not 8×8, because the fixture's smallest rasters are
    * 4×4 (downscale-only contract).
    */
  private def mmPhash(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    mediaFixture(s, dir).filter(_.media_type == "image").map { r =>
      val resized = Multimodal
        .decodeImagePixels(Multimodal.resizeImage(r.payload, 4, 4))._3
      val total = resized.map(_.toLong).sum
      var hash = 0L
      var i = 0
      while (i < 16) {
        if (resized(i) * 16L > total) hash |= (1L << i)
        i += 1
      }
      (r.media_id, r.width.toLong, r.height.toLong, hash)
    }.toDF("media_id", "w", "h", "phash").orderBy(col("media_id"))
  }

  /** Audio fingerprint (8-box energy signature): the audio twin of
    * [[mmPhash]] — decode the REAL RIFF/WAV stream (AudioSystem), split
    * the PCM samples into 8 equal-count boxes (same floor-ratio split as
    * the image resize), rounded mean per box, strict `p·8 > Σp` threshold,
    * pack 8 bits. Re-encoded identical audio fingerprints identically;
    * the oracle re-derives every bit from the closed-form sample formula.
    */
  private def mmAudioFp(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    mediaFixture(s, dir).filter(_.media_type == "audio").map { r =>
      val smp = Multimodal.decodeWavSamples(r.payload)
      val n = smp.length
      val boxes = (0 until 8).map { b =>
        val i0 = b * n / 8
        val i1 = math.max(i0 + 1, (b + 1) * n / 8)
        val cnt = (i1 - i0).toLong
        (smp.slice(i0, i1).map(_.toLong).sum + cnt / 2) / cnt
      }
      val total = boxes.sum
      var fp = 0L
      var b = 0
      while (b < 8) {
        if (boxes(b) * 8L > total) fp |= (1L << b)
        b += 1
      }
      (r.media_id, n.toLong, fp)
    }.toDF("media_id", "n_samples", "afp").orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> (mmDecodeMeta _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_features" -> (mmFeatures _),
    "mm_phash" -> (mmPhash _),
    "mm_afp" -> (mmAudioFp _)
  )

  val oracleSql: Map[String, String] = Map(
    // every aHash bit re-derived from the closed-form pixel formula:
    // same box split (floor ratios, min-1-wide), same rounded mean,
    // same strict p·16 > Σp threshold, same row-major bit order
    "mm_phash" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, CAST(doc_id % 16 + 4 AS BIGINT) AS w,
        |    CAST(doc_id % 12 + 4 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |cell AS (
        |  SELECT media_id, w, h, ox, oy,
        |    (ox*w)//4 AS x0, greatest((ox*w)//4 + 1, ((ox+1)*w)//4) AS x1,
        |    (oy*h)//4 AS y0, greatest((oy*h)//4 + 1, ((oy+1)*h)//4) AS y1
        |  FROM img
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS ox)
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS oy)),
        |p AS (
        |  SELECT media_id, w, h, ox, oy, (s + n // 2) // n AS p
        |  FROM (
        |    SELECT media_id, w, h, ox, oy,
        |      CAST(list_sum(list_transform(range(y0, y1), y ->
        |        list_sum(list_transform(range(x0, x1), x ->
        |          (media_id*31 + x*7 + y*13) % 256)))) AS BIGINT) AS s,
        |      (x1 - x0) * (y1 - y0) AS n
        |    FROM cell)),
        |t AS (SELECT media_id, CAST(sum(p) AS BIGINT) AS total FROM p GROUP BY media_id)
        |SELECT p.media_id, p.w, p.h,
        |  CAST(sum(CASE WHEN p.p * 16 > t.total
        |                THEN CAST(1 AS BIGINT) << CAST(p.oy*4 + p.ox AS INTEGER)
        |                ELSE 0 END) AS BIGINT) AS phash
        |FROM p JOIN t USING (media_id)
        |GROUP BY p.media_id, p.w, p.h ORDER BY p.media_id""".stripMargin,
    // audio fixture: n = id%200+8 samples, smp(i) = (id*17 + i*5) % 256,
    // audio rows are doc_id % 3 = 1
    "mm_afp" ->
      """WITH au AS (
        |  SELECT doc_id AS media_id, CAST(doc_id % 200 + 8 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |box AS (
        |  SELECT media_id, n, b,
        |    (b*n)//8 AS i0, greatest((b*n)//8 + 1, ((b+1)*n)//8) AS i1
        |  FROM au CROSS JOIN (SELECT unnest(range(0, 8)) AS b)),
        |p AS (
        |  SELECT media_id, n, b, (s + cnt // 2) // cnt AS p
        |  FROM (
        |    SELECT media_id, n, b,
        |      CAST(list_sum(list_transform(range(i0, i1), i ->
        |        (media_id*17 + i*5) % 256)) AS BIGINT) AS s,
        |      i1 - i0 AS cnt
        |    FROM box)),
        |t AS (SELECT media_id, CAST(sum(p) AS BIGINT) AS total FROM p GROUP BY media_id)
        |SELECT p.media_id, p.n AS n_samples,
        |  CAST(sum(CASE WHEN p.p * 8 > t.total
        |                THEN CAST(1 AS BIGINT) << CAST(p.b AS INTEGER)
        |                ELSE 0 END) AS BIGINT) AS afp
        |FROM p JOIN t USING (media_id)
        |GROUP BY p.media_id, p.n ORDER BY p.media_id""".stripMargin,
    "mm_decode_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 16 + 4 AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST(doc_id % 200 + 8 AS INTEGER)
        |       ELSE CAST(n_chars % 640 + 1 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 12 + 4 AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST(1 AS INTEGER)
        |       ELSE CAST(n_chars % 480 + 1 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN (doc_id % 16 + 4) || 'x' || (doc_id % 12 + 4)
        |       WHEN doc_id % 3 = 1 THEN CAST(doc_id % 200 + 8 AS VARCHAR)
        |       ELSE md5(text) END AS content_check
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_frame_sample" ->
      // video rows only; document text is ASCII, so varchar slicing matches
      // the engine's byte slicing exactly (duckdb's md5/substring lack BLOB
      // overloads)
      s"""SELECT doc_id AS media_id, CAST(f.i AS INTEGER) AS frame_idx,
         |  md5(substring(text, (f.i * $FrameBytes + 1)::INTEGER, $FrameBytes)) AS frame_md5
         |FROM documents,
         |  LATERAL (SELECT unnest(range(0,
         |    ((octet_length(encode(text)) - 1) // $FrameBytes) + 1)) AS i) f
         |WHERE doc_id % 3 = 2
         |ORDER BY media_id, frame_idx""".stripMargin,
    "mm_features" ->
      // per-modality stats recomputed WITHOUT a codec, from the same
      // closed-form values the engine encoded — a codec round-trip check
      """WITH img AS (
        |  SELECT doc_id, count(*) AS n,
        |    CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS sq
        |  FROM (SELECT d.doc_id, (d.doc_id * 31 + x.xi * 7 + y.yi * 13) % 256 AS v
        |        FROM documents d,
        |          LATERAL (SELECT unnest(range(0, d.doc_id % 16 + 4)) AS xi) x,
        |          LATERAL (SELECT unnest(range(0, d.doc_id % 12 + 4)) AS yi) y
        |        WHERE d.doc_id % 3 = 0)
        |  GROUP BY doc_id
        |), aud AS (
        |  SELECT doc_id, count(*) AS n,
        |    CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS sq
        |  FROM (SELECT d.doc_id, (d.doc_id * 17 + f.i * 5) % 256 AS v
        |        FROM documents d,
        |          LATERAL (SELECT unnest(range(0, d.doc_id % 200 + 8)) AS i) f
        |        WHERE d.doc_id % 3 = 1)
        |  GROUP BY doc_id
        |), vid AS (
        |  SELECT d.doc_id, coalesce(st.n, 0) AS n, coalesce(st.s, 0) AS s, coalesce(st.sq, 0) AS sq
        |  FROM documents d LEFT JOIN (
        |    SELECT doc_id, count(*) AS n,
        |      CAST(sum(code) AS BIGINT) AS s, CAST(sum(code * code) AS BIGINT) AS sq
        |    FROM (SELECT d0.doc_id, ascii(substring(d0.text, f.i::INTEGER, 1)) AS code
        |          FROM documents d0,
        |            LATERAL (SELECT unnest(range(1, octet_length(encode(d0.text)) + 1)) AS i) f
        |          WHERE d0.doc_id % 3 = 2)
        |    GROUP BY doc_id) st ON d.doc_id = st.doc_id
        |  WHERE d.doc_id % 3 = 2
        |), uni AS (
        |  SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid
        |)
        |SELECT doc_id AS media_id, CAST(n AS INTEGER) AS n_vals,
        |  CAST(round(CASE WHEN n = 0 THEN 0 ELSE s::DOUBLE / n END * 10000) AS BIGINT) AS mean_val_e4,
        |  CAST(round(CASE WHEN n = 0 THEN 0
        |    ELSE sq::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n) END * 10000) AS BIGINT) AS var_val_e4,
        |  CAST(16 AS INTEGER) AS feature_dim
        |FROM uni ORDER BY media_id""".stripMargin
  )
}
