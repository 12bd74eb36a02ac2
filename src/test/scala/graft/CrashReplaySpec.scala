package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{EtlJob, MetaStore}
import graft.model.{ClientBillingConfig, EtlJobMessage}

/** W5 — delivery semantics across a crash in the load-then-commit gap
  * (reference: billing_etl.py:187-198 loads BEFORE writing SUCCESS, so a
  * crash between the two replays the whole window into an append-only
  * sink). Parity mode reproduces the duplicate; Exact mode's partition
  * overwrite makes the replay invisible.
  */
class CrashReplaySpec extends AnyFunSuite {
  import SparkTestBase._

  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def crashThenRecover(mode: EtlJob.Mode): (Long, Long) = {
    val root = tmpDir("crash_")
    val meta = MetaStore(s"$root/meta")
    meta.putConfigs(Seq(ClientBillingConfig(7, "proj_7", "ds", "t", None, None, None)))
    val events = Tables.load(spark, Sf0001, "events")
    val mid = utcTs("2024-01-15 00:00:00")
    val windowRows = events.where(col("ts") < lit(mid)).count()

    // run 1 "crashes" after the load, before the SUCCESS commit
    val crashed = EtlJob.run(spark, meta, events, "ts", s"$root/dest", EtlJobMessage(7),
      mid, sleeper = _ => (), maxRetries = 1, mode = mode,
      onBeforeCommit = () => throw new RuntimeException("simulated crash before commit"))
    assert(crashed.isLeft)
    assert(meta.lastSuccessWatermark(7, "proj_7").isEmpty,
      "no SUCCESS watermark may exist after the crash")
    assert(EtlJob.readDestination(spark, s"$root/dest").count() == windowRows,
      "the load itself completed before the crash")

    // run 2 recovers: resumes from epoch (no SUCCESS row) and replays the window
    val recovered = EtlJob.run(spark, meta, events, "ts", s"$root/dest", EtlJobMessage(7),
      mid, sleeper = _ => (), mode = mode)
    assert(recovered.isRight)
    (EtlJob.readDestination(spark, s"$root/dest").count(), windowRows)
  }

  test("parity mode replays the crashed window as duplicates (at-least-once)") {
    val (destRows, windowRows) = crashThenRecover(EtlJob.Parity)
    assert(destRows == 2 * windowRows,
      "append-only sink + full replay = every window row twice")
  }

  test("exact mode absorbs the replay via partition overwrite (idempotent)") {
    val (destRows, windowRows) = crashThenRecover(EtlJob.Exact)
    assert(destRows == windowRows, "overwritten partitions must not duplicate")
  }
}
