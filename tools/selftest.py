#!/usr/bin/env python3
"""Contract self-test for the trend/scaling tools.

The bench tooling is the evidence chain every plan-cost and scaling claim
in SCALE.md hangs on, and round 18's review found three silent-failure
classes in it (phantom flag paths, short-history over-promotion, census
contamination). This script pins the tools' contracts with synthetic
artifacts so a regression fails loudly in CI-style use rather than
corrupting a committed artifact:

  python3 tools/selftest.py        # exit 0 = all contracts hold

Covered: min-of-mins folding, uniform-drift normalization, genuine-vs-
drift regression flagging, persistent-flag intersection (and its empty-
below-3-runs rule), quiet-run verification (cleared/kept/unmeasured),
'=' and space flag forms + missing-value/flag-as-value usage errors,
0.0-timing inclusion, same-tree (git-sha + src-hash) drift adjudication
including the dirty-tree and unstamped-artifact conservative paths,
slope recovery of a known exponent, the fixed-floor suppression,
min-across-runs merging, and the duplicate-scale usage error. The exact
pinned-behavior count is printed by the run itself — cite that output,
not a hand-maintained number.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
FAILS = []
N_CHECKS = 0


def check(name, cond, detail=""):
    global N_CHECKS
    N_CHECKS += 1
    tag = "ok" if cond else "FAIL"
    print(f"[{tag}] {name}" + (f" — {detail}" if detail and not cond else ""))
    if not cond:
        FAILS.append(name)


def write_bench(path, mins, sha=None, srch=None):
    """BENCH_FULL.json-style artifact with a detail map of given mins."""
    env = {"mode": "median", "synthetic": True}
    if sha:
        env["git_sha"] = sha
    if srch:
        env["src_hash"] = srch
    doc = {
        "metric": "total", "value": sum(mins.values()), "unit": "sec",
        "queries": dict(mins),
        "detail": {q: {"min": v, "max": v, "warmup": v} for q, v in mins.items()},
        "env": env,
    }
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(HERE, script), *args],
        capture_output=True, text=True)


def main():
    tmp = tempfile.mkdtemp(prefix="graft_selftest_")
    p = lambda name: os.path.join(tmp, name)
    out = p("out.json")

    # --- bench_trend ------------------------------------------------------
    base = {"q_fast": 0.1, "q_mid": 1.0, "q_slow": 3.0, "q_zero": 0.0}
    r1 = write_bench(p("r1.json"), base)
    r2 = write_bench(p("r2.json"), {**base, "q_mid": 0.9})
    # r3: uniform 1.5x drift (all queries together) + q_slow regressed 3x
    r3 = write_bench(p("r3.json"),
                     {"q_fast": 0.15, "q_mid": 1.35, "q_slow": 9.0, "q_zero": 0.0})

    res = run("bench_trend.py", out, r1, r2, r3)
    check("trend: exit 0", res.returncode == 0, res.stderr[-200:])
    doc = json.load(open(out))
    check("trend: min_of_mins folds across runs",
          doc["queries"]["q_mid"]["min_of_mins"] == 0.9)
    flagged = [f["query"] for f in doc["flags"]]
    check("trend: uniform drift normalized away (q_fast/q_mid not flagged)",
          "q_fast" not in flagged and "q_mid" not in flagged, str(flagged))
    check("trend: genuine 3x regression flagged over the pack",
          "q_slow" in flagged, str(flagged))
    check("trend: 0.0 timing is included, not dropped as missing",
          doc["queries"]["q_zero"]["min_of_mins"] == 0.0
          and doc["queries"]["q_zero"]["drift_pct"] is not None)
    check("trend: first-time flag is NOT persistent",
          doc["persistent_flags"] == [])

    # r4 repeats the regression -> persistent
    r4 = write_bench(p("r4.json"),
                     {"q_fast": 0.1, "q_mid": 1.0, "q_slow": 9.1, "q_zero": 0.0})
    run("bench_trend.py", out, r1, r2, r3, r4)
    doc = json.load(open(out))
    check("trend: two-consecutive flags become persistent",
          doc["persistent_flags"] == ["q_slow"], str(doc["persistent_flags"]))

    # two runs only -> persistent empty by construction
    run("bench_trend.py", out, r1, r3)
    doc = json.load(open(out))
    check("trend: <3 runs -> persistent empty by construction",
          doc["persistent_flags"] == [] and "construction" in doc["persistent_note"])

    # quiet-run verification: q_slow reproduces; a second persistent flag
    # clears; an unmeasured one stays. The fixture needs a majority of
    # STABLE queries — the uniform-drift ratio is the median over all
    # queries, so a fixture where most queries regress would (correctly)
    # absorb the regressions into "drift"
    stable = {f"q_s{i}": 0.2 + 0.1 * i for i in range(8)}
    histmap = {**stable, "q_mid": 1.0, "q_slow": 3.0, "q_ghost": 1.0}
    h1 = write_bench(p("h1.json"), histmap)
    h2 = write_bench(p("h2.json"), histmap)
    r3b = write_bench(p("r3b.json"),
                      {**stable, "q_mid": 3.0, "q_slow": 9.0, "q_ghost": 5.0})
    r4b = write_bench(p("r4b.json"),
                      {**stable, "q_mid": 3.1, "q_slow": 9.1, "q_ghost": 5.0})
    quiet = write_bench(p("quiet.json"), {"q_slow": 9.0, "q_mid": 1.05})
    res = run("bench_trend.py", out, h1, h2, r3b, r4b,
              "--verify-with=" + quiet, "--verify-margin=0.2",
              "--verify-allow", "0.15")
    check("trend: verify-mode exit 0 with '=' and space flag forms",
          res.returncode == 0, res.stderr[-200:])
    doc = json.load(open(out))
    kept = [k["query"] for k in doc["verify"]["kept"]]
    cleared = [c["query"] for c in doc["verify"]["cleared"]]
    check("trend: reproduced flag kept", kept == ["q_slow"], str(doc["verify"]))
    check("trend: quiet-at-floor flag cleared", cleared == ["q_mid"])
    check("trend: unmeasured flag stays flagged",
          doc["verify"]["unmeasured"] == ["q_ghost"]
          and doc["persistent_flags"] == ["q_ghost", "q_slow"],
          str(doc["persistent_flags"]))

    res = run("bench_trend.py", out, r1, r2, "--verify-with")
    check("trend: missing flag value is a usage error (exit 2)",
          res.returncode == 2 and "needs a value" in (res.stdout + res.stderr))

    # same-tree adjudication: the floor-setting run and the flagged run
    # share a git sha -> host noise by construction, no flag; a
    # different-sha floor keeps the flag
    g1 = write_bench(p("g1.json"), {**stable, "q_x": 1.0}, sha="oldsha")
    g2 = write_bench(p("g2.json"), {**stable, "q_x": 0.5}, sha="newsha")
    g3 = write_bench(p("g3.json"), {**stable, "q_x": 1.4}, sha="newsha")
    run("bench_trend.py", out, g1, g2, g3)
    doc = json.load(open(out))
    check("trend: same-sha floor suppresses the flag as host noise",
          doc["same_tree_drift"] == ["q_x"]
          and "q_x" not in [f["query"] for f in doc["flags"]],
          str((doc["same_tree_drift"], [f["query"] for f in doc["flags"]])))
    g2b = write_bench(p("g2b.json"), {**stable, "q_x": 0.5}, sha="oldsha")
    run("bench_trend.py", out, g1, g2b, g3)
    doc = json.load(open(out))
    check("trend: different-sha floor keeps the flag",
          doc["same_tree_drift"] == []
          and "q_x" in [f["query"] for f in doc["flags"]],
          str((doc["same_tree_drift"], [f["query"] for f in doc["flags"]])))
    run("bench_trend.py", out, r1, r2, r3)  # sha-less artifacts
    doc = json.load(open(out))
    check("trend: sha-less artifacts keep conservative flagging",
          doc["same_tree_drift"] == []
          and "q_slow" in [f["query"] for f in doc["flags"]])

    # dirty-tree hole (round 19): same git sha but DIFFERENT src_hash =
    # uncommitted engine edits — the drift may be a real plan regression,
    # so the flag must survive; same sha + same src_hash still adjudicates
    d1 = write_bench(p("d1.json"), {**stable, "q_x": 1.0}, sha="samesha", srch="aaa")
    d2 = write_bench(p("d2.json"), {**stable, "q_x": 0.5}, sha="samesha", srch="aaa")
    d3 = write_bench(p("d3.json"), {**stable, "q_x": 1.4}, sha="samesha", srch="bbb")
    run("bench_trend.py", out, d1, d2, d3)
    doc = json.load(open(out))
    check("trend: same sha but different src_hash keeps the flag (dirty tree)",
          doc["same_tree_drift"] == []
          and "q_x" in [f["query"] for f in doc["flags"]],
          str((doc["same_tree_drift"], [f["query"] for f in doc["flags"]])))
    d3b = write_bench(p("d3b.json"), {**stable, "q_x": 1.4}, sha="samesha", srch="aaa")
    run("bench_trend.py", out, d1, d2, d3b)
    doc = json.load(open(out))
    check("trend: same sha AND same src_hash adjudicates as host noise",
          doc["same_tree_drift"] == ["q_x"]
          and "q_x" not in [f["query"] for f in doc["flags"]],
          str((doc["same_tree_drift"], [f["query"] for f in doc["flags"]])))
    # content-keyed identity (round 19 close): a docs-only commit between
    # two runs changes the sha while the binary is bit-identical — the
    # same-binary claim rests on src_hash, so DIFFERENT shas with the SAME
    # src_hash still adjudicate as host noise
    d3d = write_bench(p("d3d.json"), {**stable, "q_x": 1.4}, sha="docsha", srch="aaa")
    run("bench_trend.py", out, d1, d2, d3d)
    doc = json.load(open(out))
    check("trend: different sha but same src_hash adjudicates (docs-only commit)",
          doc["same_tree_drift"] == ["q_x"]
          and "q_x" not in [f["query"] for f in doc["flags"]],
          str((doc["same_tree_drift"], [f["query"] for f in doc["flags"]])))
    # stamped vs unstamped never matches: floor run carries a src_hash the
    # newest run lacks (or vice versa) -> conservative, flag survives
    d3c = write_bench(p("d3c.json"), {**stable, "q_x": 1.4}, sha="samesha")
    run("bench_trend.py", out, d1, d2, d3c)
    doc = json.load(open(out))
    check("trend: stamped floor vs unstamped newest keeps the flag",
          doc["same_tree_drift"] == []
          and "q_x" in [f["query"] for f in doc["flags"]],
          str((doc["same_tree_drift"], [f["query"] for f in doc["flags"]])))

    # a flag token where a value belongs is a usage error, not a silently
    # mis-parsed fold ('--verify-with --verify-margin 0.3' once set
    # verify_with=['--verify-margin'] and died on open('0.3') later)
    res = run("bench_trend.py", out, r1, r2, "--verify-with", "--verify-margin", "0.3")
    check("trend: flag token as a flag's value is a usage error (exit 2)",
          res.returncode == 2 and "needs a value" in (res.stdout + res.stderr),
          f"rc={res.returncode}")

    # --- scaling_slopes ---------------------------------------------------
    # q_lin ~ SF^1, q_quad ~ SF^2, q_floor below the 0.35 s floor at top
    def scaled(sf):
        return {"q_lin": 0.5 * (sf / 0.01), "q_quad": 0.1 * (sf / 0.01) ** 2,
                "q_floor": 0.05 * (sf / 0.01)}
    s1 = write_bench(p("s1.json"), scaled(0.001))
    s2 = write_bench(p("s2.json"), scaled(0.01))
    s3 = write_bench(p("s3.json"), scaled(0.1))
    # a drifted second run per scale: min-across-runs must pick the floor
    s3b = write_bench(p("s3b.json"), {q: v * 1.7 for q, v in scaled(0.1).items()})
    sout = p("scaling.json")
    res = run("scaling_slopes.py", sout, f"sf0.001={s1}", f"sf0.01={s2}",
              f"sf0.1={s3b},{s3}")
    check("slopes: exit 0", res.returncode == 0, res.stderr[-200:])
    doc = json.load(open(sout))
    g = {q: r["graded_slope"] for q, r in doc["queries"].items()}
    check("slopes: linear query recovers slope ~1",
          abs(g["q_lin"] - 1.0) < 0.01, str(g))
    check("slopes: quadratic query recovers slope ~2 and is flagged",
          abs(g["q_quad"] - 2.0) < 0.01
          and [f["query"] for f in doc["flags"]] == ["q_quad"])
    check("slopes: sub-floor query reported but never flagged",
          g["q_floor"] is not None
          and not doc["queries"]["q_floor"]["flagged"])
    check("slopes: min across same-scale runs picks the quiet run",
          doc["queries"]["q_lin"]["t"]["sf0.1"] == 5.0,
          str(doc["queries"]["q_lin"]["t"]))

    res = run("scaling_slopes.py", sout, f"sf0.01={s2}", f"sf0.01={s3}")
    check("slopes: duplicate scale factor is a usage error (exit 2)",
          res.returncode == 2)

    print()
    if FAILS:
        print(f"{len(FAILS)} of {N_CHECKS} contract(s) BROKEN: {FAILS}")
        return 1
    print(f"all {N_CHECKS} tool contracts hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
