package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The streaming twin of CrashReplaySpec: delivery semantics across a crash
  * in the gap between the SINK's commit and the ENGINE's commit.
  *
  * Spark's file sink commits a micro-batch in two steps: first the written
  * files are recorded in the sink's `_spark_metadata` log, then the engine
  * records the batch in `checkpoint/commits/`. A crash between the two
  * leaves the exact state this spec manufactures by deleting the newest
  * commits/ entry after a successful drain. On restart the engine replays
  * the batch from its write-ahead offsets — and exactly-once holds because
  * the sink recognizes the already-committed batch id in its own log and
  * skips it, so metadata-respecting readers never see a duplicate row.
  * (The batch ETL job has no sink log, which is why its Parity mode
  * REPLAYS the window as duplicates — CrashReplaySpec pins that contrast.)
  */
class StreamingCrashReplaySpec extends AnyFunSuite {
  import SparkTestBase._

  test("crash between sink commit and engine commit: restart replays exactly-once") {
    val root = tmpDir("stream_crash_")
    val landing = s"$root/landing"
    Files.createDirectories(Paths.get(landing))
    val src = s"$Sf0001/events.parquet"
    Files.createSymbolicLink(Paths.get(s"$landing/events_1.parquet"), Paths.get(src))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(src).schema

    def drain(): StreamingQuery = {
      val raw = spark.readStream.schema(schema).parquet(landing)
      val events =
        if (schema("ts").dataType == LongType)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else raw
      val q = events.withColumn("export_date", to_date(col("ts")))
        .writeStream.format("parquet")
        .option("path", s"$root/dest")
        .option("checkpointLocation", s"$root/checkpoint")
        .partitionBy("export_date")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // AvailableNow self-terminates, but the manager deregisters the
      // query (and releases its checkpoint claim) asynchronously — wait it
      // out or the next drain sees "concurrently using ... commits"
      q.stop()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.exists(_.id == q.id) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(!spark.streams.active.exists(_.id == q.id), "query failed to deregister")
      q
    }

    drain()
    val expected = spark.read.parquet(src).count()
    val n1 = spark.read.parquet(s"$root/dest").count()
    assert(n1 == expected, "first drain loads the whole landing file")

    // manufacture the crash window: batch 0 is in the sink's
    // _spark_metadata log but not in the engine's commit log
    val commit0 = new java.io.File(s"$root/checkpoint/commits/0")
    assert(commit0.exists(), "precondition: batch 0 was committed")
    assert(commit0.delete())
    // the local FS writes a Hadoop checksum sidecar alongside the marker; a
    // real crash would have produced neither, and a stale .crc makes the
    // replay's commit rename fail spuriously
    new java.io.File(s"$root/checkpoint/commits/.0.crc").delete()

    val q2 = drain()
    // the restart re-runs batch 0 from the WAL; the sink recognizes the
    // batch id in its _spark_metadata log and SKIPS it before executing
    // the plan — batchId 0 reappearing with zero input rows IS the
    // exactly-once mechanism firing
    assert(q2.recentProgress.exists(_.batchId == 0),
      s"restart must replay batch 0 from the WAL; got " +
        q2.recentProgress.map(p => s"(${p.batchId}, ${p.numInputRows})").mkString(", "))
    assert(spark.read.parquet(s"$root/dest").count() == n1,
      "the replayed batch must not surface duplicate rows (sink-log dedup)")
    assert(new java.io.File(s"$root/checkpoint/commits/0").exists(),
      "recovery must heal the missing engine commit")

    // recovery is not a dead end: new data after the healed crash flows
    Files.createSymbolicLink(Paths.get(s"$landing/events_2.parquet"), Paths.get(src))
    drain()
    assert(spark.read.parquet(s"$root/dest").count() == n1 + expected,
      "post-recovery batches append exactly their own rows")
  }
}
