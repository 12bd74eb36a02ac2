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
  * chunking, feature vector shape — is real and tested. The actual codec
  * call is STUBBED: this container has no image/audio libraries, so
  * `decodeStub` derives deterministic fake pixels from the payload bytes.
  * Swap `decodeStub` for a real codec (e.g. TwelveMonkeys/JavaCV) to go
  * live; nothing else changes.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      width: Int,
      height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      mean_byte: Double,
      var_byte: Double,
      feature: Array[Float])

  /** === STUB === deterministic fake "decode": byte-level statistics stand
    * in for decoded pixels. A real implementation would return the decoded
    * raster; the surrounding batching/schema stays identical.
    */
  private[multimodal] def decodeStub(payload: Array[Byte]): Array[Int] =
    payload.map(b => b & 0xff)

  /** Partition-parallel feature extraction. Batched per partition like
    * `mapInPandas`: each task decodes its partition's payloads locally and
    * emits fixed-width feature vectors — no driver involvement, no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val px = decodeStub(m.payload)
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

  /** === STUB === resize: a real pipeline would rescale the decoded raster;
    * the deterministic stand-in keeps every k-th decoded sample so the
    * output *shape* (smaller payload, same record structure) is realistic.
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
