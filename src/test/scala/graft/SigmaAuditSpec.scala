package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupOps

/** The SCALE.md "Sketch-audit error envelopes" table as TESTED invariants
  * rather than prose — the same conversion round 14 made for cache hygiene.
  * An assert-true statistical envelope whose failure probability is ~1σ of
  * its own estimator fails on a fixture regeneration by design (the
  * `stats_approx_distinct` incident); these tests pin the two bounds that
  * depend on tunable constants, so a constant reverted in a refactor fails
  * CI instead of a future graded sweep.
  */
class SigmaAuditSpec extends AnyFunSuite {
  import SparkTestBase._

  /** ~5σ one-sided failure budget (≈ 2.9e-7) with a small allowance for
    * the handful of floor-J pairs the union bound multiplies over.
    */
  private val FiveSigmaBudget = 3e-7

  test("the documented J=0.8 fixture floor is a >=5-sigma bet for the banding") {
    // the STATIC pin: (1 − 0.8^r)^b computed from the live constants must
    // clear the 5σ budget — reverting to 16×4 (2.2e-4) fails here, long
    // before a regenerated fixture flips an equality oracle
    val missAtFloor =
      math.pow(1.0 - math.pow(0.8, DedupOps.RowsPerBand), DedupOps.Bands)
    assert(missAtFloor <= FiveSigmaBudget,
      f"per-pair miss at the documented J=0.8 floor is $missAtFloor%.2e — " +
        f"the banding (${DedupOps.Bands}x${DedupOps.RowsPerBand}) no longer " +
        "clears the 5-sigma budget; re-derive per the DedupOps constants doc")
  }

  /** Alarm threshold for the DYNAMIC (fixture-measured) union bound —
    * deliberately looser than the static 5σ budget: the sf0.1 corpus
    * measures 2.86e-7 (one J=0.800 pair dominates; the six at 0.889
    * contribute ~1e-11), so pinning exactly 3e-7 would redline on a
    * legitimate regeneration with a second 0.800 pair (5.7e-7 — still a
    * ~4.9σ bet). 1e-6 (~4.75σ) is where the equality-oracle bet stops
    * being comfortably five-sigma-ish and the banding (or the fixture's
    * planted-pair floor) must be revisited.
    */
  private val DynamicAlarm = 1e-6

  private def fixtureUnionBound(dir: String): Option[(Double, Int, Double)] = {
    // the SAME per-(session, dir) truth memo dedup_simhash's audit reads —
    // the bound is certified against the exact artifact the query grades on
    val js = DedupOps.truthPairs(spark, dir)
      .select("j").collect().map(_.getDouble(0))
    if (js.isEmpty) None
    else Some((js.map(j =>
      math.pow(1.0 - math.pow(j, DedupOps.RowsPerBand), DedupOps.Bands)).sum,
      js.length, js.min))
  }

  test("the FIXTURES' actual true-pair J distributions clear the alarm") {
    // the DYNAMIC pin: union-bound the banding's miss probability over
    // each corpus's REAL qualifying-pair population via the exact truth
    // path — this fires if a regenerated fixture plants pairs below the
    // documented J floor (where the equality oracles would become coin
    // flips). Runs on every shipped scale that exists, because the
    // binding population (the sub-0.9 pairs) only appears at sf0.1.
    val dirs = Seq(Sf0001, "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)
    dirs.foreach { dir =>
      fixtureUnionBound(dir).foreach { case (union, n, minJ) =>
        assert(union <= DynamicAlarm,
          f"union-bounded equality-oracle miss probability at $dir is " +
            f"$union%.2e over $n true pairs (min J = $minJ%.3f) — the " +
            "fixture now plants pairs below the banding's comfort floor")
      }
    }
  }
}
