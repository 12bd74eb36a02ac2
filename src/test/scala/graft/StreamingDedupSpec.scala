package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** Streaming exact dedup: the doubled at-least-once landing zone really
  * delivers every record twice, and `dropDuplicatesWithinWatermark`
  * collapses the stream back to the batch table exactly.
  */
class StreamingDedupSpec extends AnyFunSuite {
  import SparkTestBase._

  test("tsMicros is floor-consistent across the epoch (pre-1970 rows)") {
    // getTime/1000 truncates toward zero for negative epoch millis while
    // getNanos stays positive — up to a full second too high. floorDiv
    // keeps the decomposition consistent; latent with the 2024 fixtures
    // but part of the helper's documented general contract.
    val pre = new java.sql.Timestamp(-750L) // 1969-12-31T23:59:59.250Z
    assert(pre.getNanos == 250000000)
    assert(StreamingIngest.tsMicros(pre) == -750000L)
    val post = java.sql.Timestamp.valueOf("2024-01-15 01:02:03.123456")
    val expected = post.getTime / 1000 * 1000000L + post.getNanos / 1000
    assert(StreamingIngest.tsMicros(post) == expected)
  }

  test("the copies=2 landing zone delivers every record twice") {
    val name = s"dup_raw_${System.nanoTime()}"
    val q = StreamingIngest.eventsStream(spark, Sf0001, copies = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batch = Tables.load(spark, Sf0001, "events").count()
    assert(spark.table(name).count() == 2 * batch,
      "without dedup, the staged duplicates must all arrive")
  }

  test("maxFilesPerTrigger really bounds each micro-batch (and loses nothing)") {
    val (out, nBatches) = StreamingIngest.streamBoundedBatches(spark, Sf0001, copies = 3)
    assert(nBatches >= 3,
      s"one staged file per micro-batch means >= 3 data batches, saw $nBatches")
    val counts = out.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(counts.nonEmpty && counts.forall(_._2 == 3L),
      "bounding batches must never change what is ingested, only when")
    assert(counts.length == Tables.load(spark, Sf0001, "events").count())
  }

  test("foreachBatch upsert merges over multiple batches to the batch argmax") {
    import org.apache.spark.sql.expressions.Window
    val (out, nVersions) = StreamingIngest.streamUpsertLatestWithStats(spark, Sf0001)
    assert(nVersions >= 2,
      s"copies=2 + one file per trigger must merge over >= 2 snapshots, saw $nVersions")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val expected = Tables.load(spark, Sf0001, "events")
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = out.select(col("user_id"), col("last_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, "final store must equal the batch per-user argmax")
  }

  test("streaming dedup of the doubled source equals the batch table") {
    val streamed = StreamingIngest.streamDedupExact(spark, Sf0001)
    val batch = Tables.load(spark, Sf0001, "events")
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_iso"),
        col("user_id"))
      .orderBy(col("event_id"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("stateful cohort stream equals the batch cohort report") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingIngest.streamCohortRetention(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val batch = ops.ProductAnalyticsOps.queries("cohort_retention")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty, "fixture must produce at least one cohort cell")
    // multiple offsets per cohort = the day-set union across micro-batches
    // actually accumulated (not one batch swallowing everything)
    assert(streamed.map(_._1).distinct.size < streamed.size,
      "expected cohorts spanning several day offsets")
    assert(streamed == batch)
  }

  test("stream-stream interval join converges to the batch interval join") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.StreamingIngest.streamIntervalJoin(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e = Tables.load(spark, Sf0001, "events")
    val batch = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("pts"))
      .join(e.where(col("event_type") === "view")
          .select(col("user_id").as("vu"), col("event_id").as("view_id"), col("ts").as("vts")),
        col("pu") === col("vu") &&
          col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") && col("vts") < col("pts"))
      .select(col("purchase_id"), col("view_id"))
      .orderBy(col("purchase_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed.nonEmpty, "fixture must produce at least one attribution pair")
    assert(streamed == batch)
  }

  test("stream-stream LEFT OUTER join equals the batch left join on the closed region") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.StreamingIngest.streamLeftOuterJoin(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e = Tables.load(spark, Sf0001, "events")
    val maxTs = e.agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 2L * 3600 * 1000)
    val batch = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("pts"))
      .where(col("pts") <= lit(cutoff))
      .join(e.where(col("event_type") === "view")
          .select(col("user_id").as("vu"), col("event_id").as("view_id"), col("ts").as("vts")),
        col("pu") === col("vu") &&
          col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") && col("vts") < col("pts"),
        "leftOuter")
      .select(col("purchase_id"), coalesce(col("view_id"), lit(-1L)).as("view_id"))
      .orderBy(col("purchase_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed == batch)
    // outer semantics must be non-vacuous in BOTH directions
    assert(streamed.exists(_._2 == -1L), "fixture must produce unmatched purchases")
    assert(streamed.exists(_._2 != -1L), "fixture must produce attributed purchases")
  }

  test("stream-stream FULL OUTER join equals the batch full join on the closed region") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.StreamingIngest.streamFullOuterJoin(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e = Tables.load(spark, Sf0001, "events")
    val maxTs = e.agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 2L * 3600 * 1000)
    val batch = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"), col("ts").as("pts"))
      .join(e.where(col("event_type") === "view")
          .select(col("user_id").as("vu"), col("event_id").as("vid"), col("ts").as("vts")),
        col("pu") === col("vu") &&
          col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") && col("vts") < col("pts"),
        "fullOuter")
      .where((col("pts").isNull || col("pts") <= lit(cutoff)) &&
        (col("vts").isNull || col("vts") <= lit(cutoff)))
      .select(coalesce(col("pid"), lit(-1L)).as("purchase_id"),
        coalesce(col("vid"), lit(-1L)).as("view_id"))
      .orderBy(col("purchase_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed == batch)
    // full-outer must be non-vacuous on all THREE row classes
    assert(streamed.exists(p => p._1 != -1L && p._2 == -1L), "need organic purchases")
    assert(streamed.exists(p => p._1 == -1L && p._2 != -1L), "need dead-end views")
    assert(streamed.exists(p => p._1 != -1L && p._2 != -1L), "need attributed pairs")
  }
}
