package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

/** The decode/feature path: real JDK image/audio codecs (round-trips), plus
  * schema, batching, and deterministic outputs of the multimodal plumbing
  * (the parts no SQL oracle can see).
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestBase._

  private implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  // opaque payload → the byte-value fallback path (unknown modality)
  private def media(payload: Array[Byte], id: Long = 1L): MediaRecord =
    MediaRecord(id, "opaque", 640, 480, payload)

  test("landing-zone memo hits on an unchanged source and rebuilds when it moves") {
    // the cache-coherence rule: a regenerated fixture must invalidate the
    // memoized media landing zone, not silently serve the old encodes
    val dir = tmpDir("mm_memo_src_")
    val src = java.nio.file.Paths.get(s"$dir/documents.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/documents.parquet"), src)
    val p1 = ops.MultimodalOps.mediaFixturePath(spark, dir, Some("image"))
    val p2 = ops.MultimodalOps.mediaFixturePath(spark, dir, Some("image"))
    assert(p1 == p2, "unchanged source must hit the memo")
    // regenerate: same bytes, new mtime — the key must change
    java.nio.file.Files.setLastModifiedTime(src,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(src).toMillis + 2000))
    val p3 = ops.MultimodalOps.mediaFixturePath(spark, dir, Some("image"))
    assert(p3 != p1, "touched source must rebuild the landing zone")
    val p4 = ops.MultimodalOps.mediaFixturePath(spark, dir, Some("image"))
    assert(p4 == p3, "and the rebuild happens exactly once")
  }

  test("PNG round-trip: ImageIO decode recovers the exact raster") {
    val w = 19; val h = 15
    val px = Array.tabulate(w * h)(i => (i * 31 + 7) % 256)
    val (dw, dh, decoded) = Multimodal.decodeImagePixels(Multimodal.encodePng(px, w, h))
    assert(dw == w && dh == h)
    assert(decoded.toSeq == px.toSeq, "grayscale PNG is lossless")
  }

  test("color images decode to explicit BT.601 luma, not the AWT color pipeline") {
    // 2x2 RGB PNG with known colors; expected luma = (299R + 587G + 114B + 500) / 1000
    val colors = Array(0xff0000, 0x00ff00, 0x0000ff, 0x808080)
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, colors(0)); img.setRGB(1, 0, colors(1))
    img.setRGB(0, 1, colors(2)); img.setRGB(1, 1, colors(3))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val (w, h, px) = Multimodal.decodeImagePixels(out.toByteArray)
    assert(w == 2 && h == 2)
    val expected = colors.map { c =>
      val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff; val b = c & 0xff
      (299 * r + 587 * g + 114 * b + 500) / 1000
    }
    assert(px.toSeq == expected.toSeq,
      s"luma must follow the documented BT.601 formula: got ${px.toSeq}, want ${expected.toSeq}")
  }

  test("WAV round-trip: AudioSystem decode recovers the exact PCM samples") {
    val smp = Array.tabulate(207)(i => (i * 17 + 3) % 256)
    assert(Multimodal.decodeWavSamples(Multimodal.encodeWav(smp)).toSeq == smp.toSeq)
  }

  test("feature extraction dispatches per modality through the real codecs") {
    import sp.implicits._
    val px = Array.tabulate(4 * 4)(i => i * 16)
    val smp = Array.tabulate(32)(i => i * 8)
    val f0 = Array.tabulate(2 * 2)(i => i * 10)
    val f1 = Array.tabulate(2 * 2)(i => i * 10 + 100)
    val rows = Seq(
      MediaRecord(1L, "image", 4, 4, Multimodal.encodePng(px, 4, 4)),
      MediaRecord(2L, "audio", 32, 1, Multimodal.encodeWav(smp)),
      MediaRecord(3L, "video", 2, 2, Multimodal.encodeVideo(Seq(
        Multimodal.encodePng(f0, 2, 2), Multimodal.encodePng(f1, 2, 2)))),
      MediaRecord(4L, "opaque", 1, 1, Array[Byte](10, 20)))
    val out = Multimodal.extractFeatures(rows.toDS()).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_vals == 16 && out(1L).mean_val == px.sum.toDouble / 16)
    assert(out(2L).n_vals == 32 && out(2L).mean_val == smp.sum.toDouble / 32)
    // video: features run over the concatenated DECODED frames
    assert(out(3L).n_vals == 8 && out(3L).mean_val == (f0.sum + f1.sum).toDouble / 8)
    assert(out(4L).n_vals == 2 && out(4L).mean_val == 15.0)
  }

  test("GMV1 video round-trip: container + per-frame ImageIO recover exact rasters") {
    val w = 5; val h = 3
    val frames = (0 until 4).map(t => Array.tabulate(w * h)(i => (t * 50 + i * 7) % 256))
    val payload = Multimodal.encodeVideo(frames.map(f => Multimodal.encodePng(f, w, h)))
    val (dw, dh, decoded) = Multimodal.decodeVideoFrames(payload)
    assert(dw == w && dh == h && decoded.length == 4)
    decoded.zip(frames).foreach { case (got, want) => assert(got.toSeq == want.toSeq) }
  }

  test("corrupt video containers throw instead of decoding garbage") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideoFrames("not a container".getBytes("UTF-8"))
    }
    // truncated mid-frame: readFully hits EOF
    val good = Multimodal.encodeVideo(Seq(Multimodal.encodePng(Array.fill(4)(7), 2, 2)))
    intercept[Exception] {
      Multimodal.decodeVideoFrames(good.take(good.length - 3))
    }
  }

  test("real video resize downscales every frame with the image box-average") {
    val w = 8; val h = 4
    val frames = (0 until 3).map(_ => Array.fill(w * h)(42))
    val payload = Multimodal.encodeVideo(frames.map(f => Multimodal.encodePng(f, w, h)))
    val (dw, dh, out) = Multimodal.decodeVideoFrames(Multimodal.resizeVideo(payload, 4, 2))
    assert(dw == 4 && dh == 2 && out.length == 3)
    assert(out.forall(_.forall(_ == 42)), "area-average of a constant frame is exact")
  }

  test("feature extraction emits exact byte statistics and a 16-bin histogram") {
    import sp.implicits._
    val payload = Array[Byte](0, 16, 32, 48) // bins 0,1,2,3
    val f = Multimodal.extractFeatures(Seq(media(payload)).toDS()).collect().head
    assert(f.n_vals == 4)
    assert(f.mean_val == 24.0)
    assert(f.var_val == (576.0 + 64.0 + 64.0 + 576.0) / 4)
    assert(f.feature.length == 16)
    assert(f.feature.take(4).forall(_ == 0.25f) && f.feature.drop(4).forall(_ == 0f))
  }

  test("feature extraction is partition-parallel and total") {
    import sp.implicits._
    val ds = (1L to 100L).map(i => media(Array.fill(8)(i.toByte), i)).toDS().repartition(7)
    val out = Multimodal.extractFeatures(ds)
    assert(out.count() == 100)
    assert(out.rdd.getNumPartitions == 7, "no repartition sneaks into the decode path")
  }

  test("real image resize rescales the raster and re-encodes losslessly-shaped PNG") {
    val w = 16; val h = 12
    val px = Array.tabulate(w * h)(i => (i * 3) % 256)
    val resized = Multimodal.resizeImage(Multimodal.encodePng(px, w, h), 8, 6)
    val (dw, dh, out) = Multimodal.decodeImagePixels(resized)
    assert(dw == 8 && dh == 6 && out.length == 48)
    // area-averaging of a uniform image is exact: constant in → constant out
    val flat = Multimodal.resizeImage(Multimodal.encodePng(Array.fill(w * h)(77), w, h), 4, 3)
    assert(Multimodal.decodeImagePixels(flat)._3.forall(_ == 77))
  }

  test("resize stub shrinks payload and dimensions deterministically") {
    import sp.implicits._
    val in = media((0 until 100).map(_.toByte).toArray)
    val out = Multimodal.resizeStub(Seq(in).toDS(), factor = 4).collect().head
    assert(out.payload.length == 25)
    assert(out.payload.toSeq == (0 until 100 by 4).map(_.toByte))
    assert(out.width == 160 && out.height == 120)
  }

  test("frame sampling of an empty payload emits zero frames") {
    import sp.implicits._
    val df = Seq(media(Array.empty[Byte], 1L), media(Array.fill(65)(1.toByte), 2L))
      .toDS().toDF()
    val frames = Multimodal.sampleFrames(df, "payload", 64)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byId.contains(1L), "empty payload must produce no frames")
    assert(byId(2L) == 2L, "65 bytes at 64-byte frames = 2 frames")
  }

  test("empty payload does not divide by zero") {
    import sp.implicits._
    val f = Multimodal.extractFeatures(Seq(media(Array.empty[Byte])).toDS()).collect().head
    assert(f.n_vals == 0 && f.mean_val == 0.0 && f.var_val == 0.0)
  }

  test("perceptual hash: 16-bit range, matches an independent formula replay") {
    val rows = ops.MultimodalOps.queries("mm_phash")(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, ph) => assert(ph >= 0L && ph < (1L << 16)) }
    // independent replay for a handful of images, straight from the fixture
    // pixel formula through the same box-mean + strict-threshold definition
    rows.take(5).foreach { case (id, w, h, ph) =>
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        ((id * 31 + x * 7 + y * 13) % 256).toInt
      }
      val cells = for (oy <- 0 until 4; ox <- 0 until 4) yield {
        val x0 = ox * w / 4; val x1 = math.max(x0 + 1, (ox + 1) * w / 4)
        val y0 = oy * h / 4; val y1 = math.max(y0 + 1, (oy + 1) * h / 4)
        val vals = for (y <- y0 until y1; x <- x0 until x1) yield px(y * w + x).toLong
        val n = vals.length.toLong
        (vals.sum + n / 2) / n
      }
      val total = cells.sum
      val expected = cells.zipWithIndex
        .collect { case (p, i) if p * 16 > total => 1L << i }.sum
      assert(ph == expected, s"image $id: $ph vs replay $expected")
    }
  }
}
