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

  test("the FIXTURE's actual minimum true-pair J clears the budget too") {
    // the DYNAMIC pin: compute the corpus's real minimum qualifying J via
    // the exact truth path and union-bound the banding's miss probability
    // over the actual sub-0.9 pair population — this is the check that
    // fires if a regenerated fixture plants pairs below the documented
    // floor (where the equality oracles would become coin flips)
    val sh = DedupOps.shingled(Tables.load(spark, Sf0001, "documents"))
    val (pairs, posts) = DedupOps.exactJaccardPairs(sh)
    val js = pairs.select("j").collect().map(_.getDouble(0)).sorted
    posts.unpersist()
    if (js.nonEmpty) {
      val union = js.map(j =>
        math.pow(1.0 - math.pow(j, DedupOps.RowsPerBand), DedupOps.Bands)).sum
      assert(union <= FiveSigmaBudget,
        f"union-bounded equality-oracle miss probability is $union%.2e over " +
          f"${js.length} true pairs (min J = ${js.min}%.3f) — the fixture " +
          "now plants pairs below the banding's 5-sigma floor")
    }
  }
}
