package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord

/** The stubbed decode/feature path: schema, batching, and deterministic
  * outputs of the multimodal plumbing (the parts no SQL oracle can see).
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestBase._

  private implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  private def media(payload: Array[Byte], id: Long = 1L): MediaRecord =
    MediaRecord(id, "image", 640, 480, payload)

  test("feature extraction emits exact byte statistics and a 16-bin histogram") {
    import sp.implicits._
    val payload = Array[Byte](0, 16, 32, 48) // bins 0,1,2,3
    val f = Multimodal.extractFeatures(Seq(media(payload)).toDS()).collect().head
    assert(f.n_bytes == 4)
    assert(f.mean_byte == 24.0)
    assert(f.var_byte == (576.0 + 64.0 + 64.0 + 576.0) / 4)
    assert(f.feature.length == 16)
    assert(f.feature.take(4).forall(_ == 0.25f) && f.feature.drop(4).forall(_ == 0f))
  }

  test("feature extraction is partition-parallel and total") {
    import sp.implicits._
    val ds = (1L to 100L).map(i => media(Array.fill(8)(i.toByte), i)).toDS().repartition(7)
    val out = Multimodal.extractFeatures(ds)
    assert(out.count() == 100)
    assert(out.rdd.getNumPartitions == 7, "no repartition sneaks into the stub path")
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
    assert(f.n_bytes == 0 && f.mean_byte == 0.0 && f.var_byte == 0.0)
  }
}
