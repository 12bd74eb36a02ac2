package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-series analytics (SeriesOps) + the grid-blocked spatial join
  * (GeoOps): every closed-form window trick is cross-checked against a
  * driver-side sequential replay on sf0.001, and the geo join's
  * no-cartesian plan claim is pinned.
  */
class SeriesOpsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("clamped balance window identity matches the sequential fold") {
    val out = ops.SeriesOps.queries("w21_clamped_balance")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // sequential ground truth: replay each user's ledger in event_id order
    val tx = Tables.load(spark, Sf0001, "events")
      .select(col("user_id"), col("event_id"),
        when(col("event_id") % 2 === 0, round(col("value") * 100).cast("long"))
          .otherwise(-round(col("value") * 100).cast("long")).as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = tx.groupBy(_._1).map { case (u, rows) =>
      var bal = 0L; var lost = 0L
      rows.sortBy(_._2).foreach { case (_, _, d) =>
        val next = bal + d
        if (next < 0) { lost += -next; bal = 0L } else bal = next
      }
      u -> ((bal, lost))
    }
    assert(truth.size == out.size)
    truth.foreach { case (u, t) => assert(out(u) == t, s"user $u: ${out(u)} != $t") }
  }

  test("interval merge matches a sequential sweep and never over-counts") {
    val out = ops.SeriesOps.queries("w20_interval_merge")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val iv = Tables.load(spark, Sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("s"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = iv.groupBy(_._1).map { case (u, rows) =>
      var nMerged = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      rows.map { case (_, s, id) => (s, s + 900000000L, id) }
        .sortBy(t => (t._1, t._3)).foreach { case (s, e, _) =>
          if (nMerged == 0L || s > curE) {
            if (nMerged > 0L) covered += curE - curS
            nMerged += 1; curS = s; curE = e
          } else if (e > curE) curE = e
        }
      if (nMerged > 0L) covered += curE - curS
      u -> ((nMerged, covered, rows.length.toLong))
    }
    assert(truth.size == out.size)
    truth.foreach { case (u, t) => assert(out(u) == t, s"user $u: ${out(u)} != $t") }
  }

  test("largest-remainder quotas sum exactly to the slot budget") {
    val rows = ops.SeriesOps.queries("mix_largest_remainder")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum == 10000L, "quotas must sum to exactly 10000")
    rows.foreach { case (src, _, base, quota) =>
      assert(quota == base || quota == base + 1, s"$src: quota not base or base+1")
    }
    // proportionality: every quota within 1 of the real-valued share
    val total = rows.map(_._2).sum.toDouble
    rows.foreach { case (src, cnt, _, quota) =>
      val share = 10000.0 * cnt / total
      assert(math.abs(quota - share) < 1.0, s"$src: |$quota - $share| >= 1")
    }
  }

  test("cusum scan: cumulative deviations cancel and the argmax is reported") {
    val row = ops.SeriesOps.queries("stats_cusum_shift")(spark, Sf0001).collect()(0)
    val daily = Tables.load(spark, Sf0001, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .orderBy(col("day"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val n = daily.length.toLong
    val total = daily.map(_._2).sum
    var s = 0L
    val series = daily.map { case (d, c) => s += c * n - total; (d, s) }
    assert(series.last._2 == 0L, "scaled deviations must telescope to zero")
    val best = series.minBy { case (d, v) => (-math.abs(v), d) }
    assert(row.getString(0) == best._1 && row.getLong(1) == best._2)
    assert(row.getLong(2) == n && row.getLong(3) == total)
  }

  test("idle gaps and runs census match sequential replays") {
    // w22: largest hole between merged activity islands, per user
    val out = ops.SeriesOps.queries("w22_idle_gap")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val iv = Tables.load(spark, Sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("s"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = iv.groupBy(_._1).map { case (u, rows) =>
      var curE = Long.MinValue; var maxGap = 0L; var nGaps = 0L
      rows.map { case (_, s, id) => (s, s + 900000000L, id) }
        .sortBy(t => (t._1, t._3)).foreach { case (s, e, _) =>
          if (curE != Long.MinValue && s > curE) {
            nGaps += 1; if (s - curE > maxGap) maxGap = s - curE
          }
          if (e > curE) curE = e
        }
      u -> ((maxGap, nGaps))
    }
    assert(out == truth)
    // runs census: replay the sign sequence sequentially
    val row = ops.SeriesOps.queries("stats_runs_updown")(spark, Sf0001).collect()(0)
    val daily = Tables.load(spark, Sf0001, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val signs = daily.sliding(2).collect {
      case Array(a, b) if a != b => if (b > a) 1 else -1
    }.toSeq
    val runLens = signs.foldLeft(List.empty[(Int, Long)]) {
      case ((s, n) :: tail, x) if s == x => (s, n + 1) :: tail
      case (acc, x) => (x, 1L) :: acc
    }.map(_._2)
    assert(row.getLong(0) == daily.length.toLong)
    assert(row.getLong(1) == signs.length.toLong, "n_moves mismatch")
    assert(row.getLong(2) == runLens.length.toLong, "n_runs mismatch")
    assert(row.getLong(3) == runLens.max, "longest_run mismatch")
  }

  test("geo grid join equals brute force and plans as an equi-join (no cartesian)") {
    val df = ops.GeoOps.queries("geo_grid_join")(spark, Sf0001)
    val row = df.collect()(0)
    // brute-force ground truth over the md5-derived points
    val pts = Tables.load(spark, Sf0001, "customer")
      .select(col("c_custkey").cast("string").as("k"), col("c_custkey").as("id"))
      .collect().map { r =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getString(0).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (r.getLong(1), java.lang.Long.parseLong(h.substring(0, 3), 16),
          java.lang.Long.parseLong(h.substring(3, 6), 16))
      }
    val d2s = for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 4096L
    } yield d2
    assert(row.getLong(0) == d2s.length.toLong, "pair count != brute force")
    assert(row.getLong(1) == d2s.min, "min d2 != brute force")
    assert(row.getLong(2) == d2s.sum, "sum d2 != brute force")
    // plan pin: candidate generation is an equi-join on the cell key —
    // a cartesian/BNLJ here would be the all-pairs scale-killer
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian product in geo join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in geo join")
  }
}
