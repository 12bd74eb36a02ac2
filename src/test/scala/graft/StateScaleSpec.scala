package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The state-cardinality bench (STREAM_SCALING.json) is only a valid
  * falsifier if its drains compute something REAL — a measurement harness
  * whose queries are wrong measures nothing. Both stateful shapes must
  * equal their batch twins at every rung of the key ladder, and the
  * fanout that makes the ladder load-bearing (round 19) must multiply
  * the key space without corrupting the per-bucket aggregates.
  */
class StateScaleSpec extends AnyFunSuite {
  import SparkTestBase._

  private def batchTwin(k: Long, fanout: Int = 1) =
    Tables.load(spark, Sf0001, "events")
      .select(col("event_id"), round(col("value") * 100).cast("long").as("vcents"))
      .withColumn("rep",
        if (fanout == 1) lit(0) else explode(expr(s"sequence(0, ${fanout - 1})")))
      .groupBy(pmod(xxhash64(col("event_id"), col("rep")), lit(k)).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("vcents")).as("cents"))

  test("keyed-agg drain equals the batch groupBy at two key cardinalities") {
    for (k <- Seq(16L, 256L)) {
      val drained = streaming.StateScaleBench.keyedAggDrain(spark, Sf0001, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val batch = batchTwin(k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(drained.nonEmpty && drained.toSeq == batch.toSeq, s"k=$k")
    }
  }

  test("mapGroupsWithState drain folds to the batch per-bucket sum") {
    // Update mode emits a bucket's RUNNING total once per micro-batch it
    // appears in; fixture values are strictly positive (min 0.03), so the
    // running sum is monotone and max-per-bucket is the final state —
    // the same fold statefulUserWatermark's drain uses.
    for (k <- Seq(16L, 256L)) {
      val folded = streaming.StateScaleBench.mgwsDrain(spark, Sf0001, k)
        .groupBy(col("bucket")).agg(max(col("cents")).as("cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val batch = batchTwin(k)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
      assert(folded.nonEmpty && folded.toSeq == batch.toSeq, s"k=$k")
    }
  }

  test("fanned drain equals the fanned batch twin and multiplies the key space") {
    // fanout 4 on the 1000-row fixture: every (event_id, rep) pair is a
    // distinct key, so at k = 1 << 20 the bucket census must read ~4000
    // (minus birthday collisions) — the mechanism the sf0.1 ladder relies
    // on to push state rows past the fixture's row count
    val k = 1L << 20
    val drained = streaming.StateScaleBench.keyedAggDrain(spark, Sf0001, k, fanout = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = batchTwin(k, fanout = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(drained.toSeq == batch.toSeq)
    assert(drained.length > 3900, s"fanout must multiply keys, got ${drained.length}")
  }
}
