package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` payloads with a typed metadata struct, exactly as a
  * 100 TB training-data pipeline carries them (decode happens in bounded
  * per-partition batches at the edges, never on the driver).
  *
  * The Spark-side plumbing — schema, partition-parallel batched processing
  * (`mapPartitions`, the JVM analogue of `mapInPandas` batches), frame
  * chunking, feature vector shape — is real and tested. So are all three
  * codecs: `decodeImagePixels` is a real PNG/JPEG/BMP decode via the JDK's
  * `javax.imageio`, `decodeWavSamples` a real RIFF/WAV parse via
  * `javax.sound.sampled`, and `decodeVideoFrames` a real container parse
  * (GMV1: length-prefixed per-frame still payloads — motion-PNG, the
  * lossless cousin of MJPEG's concatenated-JPEG stream) with ImageIO
  * decoding every frame. No external libraries anywhere, and every codec
  * is round-trip oracle-checked: the `mm_*` queries regenerate the DECODED
  * statistics from the closed-form payload formulas in DuckDB without
  * touching a codec, so a codec bug breaks the hash match. Swapping the
  * per-frame codec for JPEG (true MJPEG) or an ffmpeg binding changes
  * `decodeVideoFramePayloads` only — the per-frame fan-out, feature, and
  * sampling paths are codec-agnostic.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Feature row over DECODED values (pixels for image, PCM samples for
    * audio, raw bytes for opaque/video payloads).
    */
  final case class MediaFeatures(
      media_id: Long,
      n_vals: Int,
      mean_val: Double,
      var_val: Double,
      feature: Array[Float])

  /** Opaque-payload fallback (and the VIDEO stand-in — see the object note):
    * byte-level values instead of decoded samples.
    */
  private[graft] def byteValues(payload: Array[Byte]): Array[Int] =
    payload.map(b => b & 0xff)

  // ------------------------------------------------------------ image codec

  /** Encode a grayscale raster as a real PNG via the JDK's ImageIO
    * (lossless — decode returns exactly these samples). Pixels are
    * row-major (y outer). Used by fixtures/ingest shims; the engine-side
    * hot path is the decode below.
    */
  def encodePng(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height, "raster shape mismatch")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixels(y * width + x)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode (PNG/JPEG/BMP/GIF — whatever ImageIO recognizes):
    * returns (width, height, row-major grayscale samples). Grayscale
    * sources read their raster directly; color/palette sources convert via
    * an explicit ITU-R BT.601 integer luma on getRGB — NOT the AWT
    * Graphics2D pipeline, whose gray conversion is color-profile-dependent
    * (it gamma-converts through sRGB), so decoded samples would vary with
    * the JDK's color management rather than follow a documented formula.
    * Throws on undecodable payloads — callers route those to a quarantine
    * column.
    */
  def decodeImagePixels(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      // BT.601 luma with integer rounding: (299 R + 587 G + 114 B) / 1000
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(y * w + x) = (299 * r + 587 * g + 114 * b + 500) / 1000
          x += 1
        }
        y += 1
      }
    }
    (w, h, out)
  }

  // ------------------------------------------------------------ audio codec

  /** Encode 8-bit unsigned PCM samples as a real RIFF/WAV stream via the
    * JDK's sound API (headless-safe: pure stream formatting, no audio
    * device).
    */
  def encodeWav(samples: Array[Int], sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, sampleRate,
      8, 1, 1, sampleRate, false)
    val bytes = samples.map(_.toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode: parse a WAV payload back to its 8-bit unsigned PCM
    * samples. Throws on undecodable payloads.
    */
  def decodeWavSamples(payload: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try ais.readAllBytes().map(b => b & 0xff)
    finally ais.close()
  }

  // ------------------------------------------------------------ video codec

  /** "GMV1" container magic. */
  private val VideoMagic = 0x474d5631

  /** Encode a sequence of already-encoded still-frame payloads (PNGs from
    * [[encodePng]]) as a GMV1 container: magic, frame count, then a
    * length-prefixed payload per frame — the lossless motion-PNG cousin of
    * a raw MJPEG stream, parseable with zero non-JDK code.
    */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(VideoMagic)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Parse a GMV1 container back to its per-frame payloads. Throws on
    * corrupt input (bad magic, negative/overlong frame) — callers route
    * those to a quarantine column, same contract as the image decode.
    */
  def decodeVideoFramePayloads(payload: Array[Byte]): Array[Array[Byte]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload))
    require(in.readInt() == VideoMagic, "payload is not a GMV1 video container")
    val n = in.readInt()
    require(n >= 0 && n <= payload.length, "corrupt frame count")
    Array.fill(n) {
      val len = in.readInt()
      require(len >= 0 && len <= payload.length, "corrupt frame length")
      val buf = new Array[Byte](len)
      in.readFully(buf)
      buf
    }
  }

  /** REAL video decode: container parse + ImageIO decode of every frame;
    * returns (width, height, per-frame row-major grayscale samples).
    * Frames must agree on dimensions (the fixed-raster contract every
    * training pipeline enforces before batching).
    */
  def decodeVideoFrames(payload: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
    val frames = decodeVideoFramePayloads(payload).map(decodeImagePixels)
    require(frames.nonEmpty, "video has no frames")
    val (w, h, _) = frames(0)
    require(frames.forall(f => f._1 == w && f._2 == h),
      "frames disagree on dimensions")
    (w, h, frames.map(_._3))
  }

  /** REAL video resize: per-frame [[resizeImage]] box-average downscale,
    * re-encoded into a fresh container — same integer math as the image
    * path, frame structure preserved.
    */
  def resizeVideo(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] =
    encodeVideo(decodeVideoFramePayloads(payload).toSeq
      .map(f => resizeImage(f, outW, outH)))

  /** Partition-parallel feature extraction. Batched per partition like
    * `mapInPandas`: each task decodes its partition's payloads locally and
    * emits fixed-width feature vectors — no driver involvement, no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val px = m.media_type match {
          case "image" => decodeImagePixels(m.payload)._3
          case "audio" => decodeWavSamples(m.payload)
          case "video" => decodeVideoFrames(m.payload)._3.flatten // temporal raster
          case _ => byteValues(m.payload) // unknown modality: opaque bytes
        }
        val n = px.length
        // Exact integer accumulators, then two IEEE-double ops: sum and
        // sumsq are < 2^53 so mean = s/n and var = sq/n − mean² are
        // bit-reproducible by ANY engine evaluating the same expression —
        // this is what makes the feature stats oracle-checkable (a
        // deviation-accumulation loop would depend on summation order).
        var s = 0L; var sq = 0L
        px.foreach { v => s += v; sq += v.toLong * v }
        val mean = if (n == 0) 0.0 else s.toDouble / n
        val variance = if (n == 0) 0.0 else sq.toDouble / n - mean * mean
        // 16-bin byte histogram, L1-normalized — the stub "embedding".
        val hist = new Array[Float](16)
        px.foreach(v => hist(v >> 4) += 1f)
        if (n > 0) (0 until 16).foreach(i => hist(i) /= n.toFloat)
        MediaFeatures(m.media_id, n, mean, variance, hist)
      }
    }
  }

  /** Frame sampling: slice the payload into fixed-size "frames" and emit one
    * row per frame — pure columnar (sequence + substring on binary), so a
    * video corpus fans out to frames without ever leaving codegen.
    */
  def sampleFrames(media: DataFrame, payloadCol: String, frameBytes: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(
        // guard the empty payload: sequence(0, -1) would DESCEND ([0, -1])
        // and emit two phantom frames
        when(length(col(payloadCol)) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              floor((length(col(payloadCol)) - 1) / frameBytes).cast("int")),
            i => md5(substring_index_bytes(col(payloadCol), i, frameBytes)))))
        .as(Seq("frame_idx", "frame_md5")))

  // substring on binary with 1-based offset; split out for readability
  private def substring_index_bytes(payload: org.apache.spark.sql.Column,
      i: org.apache.spark.sql.Column, frameBytes: Int) =
    call_function("substring", payload, i * frameBytes + 1, lit(frameBytes))

  /** REAL image resize: decode, box-average the raster directly (each
    * output pixel = rounded mean of the input pixels its box covers —
    * deterministic integer math, no AWT color pipeline, which would gamma-
    * convert grayscale through sRGB), re-encode as PNG.
    */
  def resizeImage(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, "target dims must be positive")
    val (w, h, px) = decodeImagePixels(payload)
    require(outW <= w && outH <= h, "resize is a downscale")
    val out = new Array[Int](outW * outH)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * h / outH
      val y1 = math.max(y0 + 1, (oy + 1) * h / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * w / outW
        val x1 = math.max(x0 + 1, (ox + 1) * w / outW)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x); x += 1 }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        out(oy * outW + ox) = ((s + n / 2) / n).toInt // round half up
        ox += 1
      }
      oy += 1
    }
    encodePng(out, outW, outH)
  }

  /** Opaque-payload resize stand-in (every k-th byte) for modalities with
    * no codec — keeps the output *shape* (smaller payload, same record
    * structure) realistic; image/video use the real [[resizeImage]] /
    * [[resizeVideo]] paths.
    */
  def resizeStub(media: Dataset[MediaRecord], factor: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val kept = m.payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
      m.copy(payload = kept, width = math.max(1, m.width / factor),
        height = math.max(1, m.height / factor))
    })
  }
}
