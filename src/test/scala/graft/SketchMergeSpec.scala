package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The identity `stats_hll_merge` rests on: unioning per-day HLL partials
  * (at a shared lgK) estimates exactly like one sketch built over the whole
  * range. If that ever breaks — a lossy union, a mismatched lgK downgrade —
  * the day-partial architecture silently loses accuracy while the in-query
  * ±2% gate may still pass; this pins bit-equality of the two estimates.
  */
class SketchMergeSpec extends AnyFunSuite {
  import SparkTestBase._

  test("union of day HLL partials estimates exactly like one global sketch") {
    val ev = Tables.load(spark, Sf0001, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    val merged = ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val global = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 14)).as("est"))
      .collect()(0).getLong(0)
    assert(merged == global,
      s"day-partial union ($merged) must equal the global sketch ($global)")
    // and the estimate is actually close to truth, not just self-consistent
    val exact = ev.select(col("user_id")).distinct().count()
    assert(math.abs(merged - exact) * 50 <= exact,
      s"estimate $merged vs exact $exact outside 2%")
  }
}
