package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gap sessionization must equal a driver-side reference fold over the
  * same (ts, event_id)-ordered event stream.
  */
class SessionizeSpec extends AnyFunSuite {
  import SparkTestBase._

  private val GapUs = 6L * 3600 * 1000000

  test("engine sessions equal the per-user reference fold") {
    val engine = ops.RelationalOps.queries("w8_gap_sessionize")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5)))
      .toMap
    val evs = Tables.load(spark, Sf0001, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val reference = evs.groupBy(_._1).flatMap { case (user, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._3)
      // fold: new session when gap > threshold; accumulate (sid -> events)
      val sids = ordered.scanLeft((0L, Long.MinValue)) { case ((sid, prev), us) =>
        (if (prev == Long.MinValue || us - prev > GapUs) sid + 1 else sid, us)
      }.drop(1).map(_._1)
      sids.zip(ordered).groupBy(_._1).map { case (sid, members) =>
        (user, sid) -> (members.size.toLong, members.map(_._2).max - members.map(_._2).min)
      }
    }.toMap
    assert(engine == reference)
  }

  test("streaming session windows equal the batch sessionization") {
    val streamed = ops.StreamingOps.queries("stream_sessionize")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val batch = ops.RelationalOps.queries("w8_gap_sessionize")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("as-of join equals the per-user reference scan and is non-vacuous") {
    val engine = ops.RelationalOps.queries("j2_asof_join")(spark, Sf0001)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val evs = Tables.load(spark, Sf0001, "events")
      .where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val reference = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).toSeq
      ordered.zipWithIndex.collect { case ((_, eid, _, "purchase"), i) =>
        eid -> ordered.take(i).reverse.collectFirst { case (_, vid, _, "view") => vid }
      }
    }.toMap
    assert(engine == reference)
    assert(engine.values.exists(_.isDefined) && engine.values.exists(_.isEmpty),
      "fixture must exercise both matched and unmatched purchases")
  }
}
